"""sneaky_data_matcher_spark — a from-scratch PySpark-native record-linkage engine.

Re-creates the capabilities of the reference ``myteksp/sneaky_data_matcher``
(a Java/Spring/Neo4j record-linkage HTTP service) as an idiomatic PySpark
DataFrame pipeline:

    canonicalize -> blocking keys (multi-pass, salted) -> candidate pairs
    -> vectorized similarity scoring -> transitive clustering
    (large-star/small-star connected components)

plus the reference's query surface (string-predicate mini-language,
provenance filters, join-by-shared-value enrichment, probe matching) and
large-scale training-data-pipeline operators (dedup, ANN similarity,
text analysis, multimodal plumbing).

Package layout:
    functions/  pure column-level functions (canonicalization, similarity, text)
    operators/  DataFrame -> DataFrame operators (blocking, scoring, clustering,
                search, dedup, ann)
    sources/    readers/writers, spans-table derivation, synthetic corpora
    plans/      pipeline orchestration, checkpoint/resume, lineage metrics
    streaming/  incremental (Structured Streaming) variants
"""

__version__ = "0.1.0"
