"""BM25 ranked retrieval over a document corpus — native expressions only.

Extends the reference's boolean CONTAINS search
(services/SearchService.java:74-96, QueryType CONTAINS) with the standard
Okapi BM25 ranking function (Robertson & Walker, public literature):

  score(d, q) = sum_t idf(t) * tf(t,d)*(k1+1) / (tf(t,d) + k1*(1-b+b*dl/avgdl))
  idf(t)      = ln(1 + (N - df + 0.5)/(df + 0.5))

Scale notes (100 TB):
  - No explode, no per-term shuffle: tf per query term is a native
    `size(filter(tokens, ...))` projection evaluated in one scan; the
    corpus stats (N, sum dl, df per term) are ONE global aggregate row
    cross-joined (broadcast) back. Total cost: two corpus scans — one
    for stats, one for scoring — and a TakeOrdered top-k (per-partition
    heaps + driver merge; no global sort, no single-task window).
  - Determinism for the oracle: tf/dl/df/N are exact longs; avgdl and
    every score term are FIXED-ORDER IEEE expressions of those longs,
    and per-term scores are summed left-to-right in the declared term
    order (never a float groupBy-sum, whose order is engine-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _toks(col):
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != F.lit(""))


def _tf(tok_col, term: str):
    # NB: a two-parameter lambda here would be interpreted by PySpark as
    # (element, index) — close over the term instead
    return F.size(F.filter(tok_col, lambda x: x == F.lit(term)))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs by BM25 over `terms` -> (doc_id, score, rank), score
    floor-quantized to 6 decimals, ties broken by doc_id ascending."""
    terms = [t.lower() for t in terms]
    base = docs.select(
        F.col(id_col).alias("doc_id"), _toks(F.col(text_col)).alias("toks")
    ).select(
        "doc_id",
        F.size(F.col("toks")).alias("dl"),
        *[_tf(F.col("toks"), t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.count(F.when(F.col(f"tf_{i}") > 0, 1)).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    norm = 1.0 - b + b * (F.col("dl").cast("double") / avgdl)
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            1.0
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
        )
        s_i = idf * (tf * (k1 + 1.0)) / (tf + k1 * norm)
        score = s_i if score is None else score + s_i
    hits = (
        scored.select("doc_id", score.alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    from pyspark.sql import Window as W

    return hits.withColumn(
        "rank",
        F.row_number().over(
            W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        ),
    ).select("doc_id", (F.floor(F.col("score") * 1e6) / 1e6).alias("score"), "rank")


def bm25_sql(
    terms: list[str], k: int = 20, k1: float = 1.2, b: float = 0.75
) -> str:
    """DuckDB twin of bm25_topk over the `documents` view — identical
    expression shapes and summation order."""
    terms = [t.lower() for t in terms]
    tf_cols = ", ".join(
        "len(list_filter(toks, x -> x = '%s')) AS tf_%d" % (t, i)
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"count(CASE WHEN tf_{i} > 0 THEN 1 END) AS df_{i}"
        for i in range(len(terms))
    )
    score_terms = " + ".join(
        f"(ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5)) "
        f"* (CAST(tf_{i} AS DOUBLE) * ({k1} + 1.0)) "
        f"/ (CAST(tf_{i} AS DOUBLE) + {k1} * (1.0 - {b} + {b} * "
        "(CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))"
        for i in range(len(terms))
    )
    return (
        "WITH base AS MATERIALIZED (SELECT doc_id, len(toks) AS dl, "
        f"{tf_cols} FROM (SELECT doc_id, "
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks "
        "FROM documents)), "
        f"stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl, {df_cols} FROM base), "
        f"scored AS (SELECT doc_id, {score_terms} AS score FROM base CROSS JOIN stats), "
        f"topk AS (SELECT doc_id, score FROM scored WHERE score > 0 "
        f"ORDER BY score DESC, doc_id ASC LIMIT {k}) "
        "SELECT doc_id, floor(score * 1000000) / 1000000 AS score, "
        "CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank FROM topk"
    )
