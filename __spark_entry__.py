"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: full record-linkage pipeline (canonicalize →
                multi-pass salted blocking → vectorized pair scoring →
                large-star/small-star clustering) over the interleaved
                spans table derived from sf0.001 documents.
queries()     — one entry per implemented operator (SURVEY.md §2 +
                training-data ops); each takes (spark, sf_dir).
oracle_sql()  — DuckDB-equivalent ANSI SQL per query (omitted only for
                genuinely non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sneaky_data_matcher_spark.plans import pipeline as P
    from sneaky_data_matcher_spark.sources.io import spread_input
    from sneaky_data_matcher_spark.sources.spans import derive_spans

    docs = spread_input(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    spans = derive_spans(docs)
    # Testdata documents share one small vocabulary, so token-overlap scores
    # run hot; a stricter threshold than the labeled-corpus default keeps
    # transitive clusters tight here.
    out = P.run(spans, P.PipelineConfig(threshold=0.85))
    clusters = out["clusters"]
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        clusters.join(sizes, "cluster_id")
        .select("doc_id", "cluster_id", "cluster_size")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sneaky_data_matcher_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sneaky_data_matcher_spark.entry_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
