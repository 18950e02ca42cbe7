"""Benchmark decontamination: flag corpus documents that share token
n-grams with an evaluation/benchmark set.

The reference has no decontamination (it matches records, not corpora),
but it is a mandatory stage of any LLM training-data pipeline: training
text that contains verbatim benchmark n-grams leaks the eval. This is the
GPT-3/PaLM-style filter — a document is contaminated if it shares at
least ``min_overlap`` distinct token n-grams with ANY benchmark document
(13-grams at production scale; configurable here because test fixtures
are short).

Scale notes (100 TB):
  - the benchmark side is tiny (evals are MBs; the corpus is TBs). Its
    distinct n-gram set is built once and BROADCAST — the corpus is never
    shuffled to meet it. ``F.broadcast`` is applied explicitly; with a
    very large eval union (>8 GB broadcast ceiling) drop the hint and let
    AQE pick a shuffle join on the n-gram key.
  - the corpus side is a projection + explode; the only corpus shuffle is
    the groupBy(doc_id) overlap count, which partial-aggregates map-side
    (counts, no payload). With ``min_overlap=1`` the count can be skipped
    entirely via a left-semi join (``flag_only=True``) — one broadcast
    semi-join, zero shuffles.
  - n-grams are DISTINCT per doc before the join, so a boilerplate n-gram
    repeated 1000x in one doc contributes one row, not 1000.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_ngrams(col: Column, n: int) -> Column:
    """Distinct lowercase whitespace-token n-grams of a text column.
    Shorter-than-n documents yield their full token join (one "gram"), so
    a verbatim short benchmark string still matches — same convention as
    dedup._shingles (operators/dedup.py:25)."""
    toks = F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != "")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.array_distinct(
        F.when(F.size(toks) < n, F.array(F.array_join(toks, " "))).otherwise(grams)
    )


def benchmark_ngrams(
    bench: DataFrame, text_col: str = "text", n: int = 13
) -> DataFrame:
    """The benchmark set's distinct n-grams — the broadcast side."""
    return (
        bench.select(F.explode(token_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_overlap: int = 1,
    flag_only: bool = False,
) -> DataFrame:
    """Per-document benchmark overlap: (doc_id, n_overlap) for documents
    sharing >= ``min_overlap`` distinct n-grams with the benchmark set.

    ``flag_only=True`` returns just the contaminated doc_ids via a
    broadcast LEFT SEMI join (no aggregation shuffle at all) — the shape
    to use at 100 TB when only the drop-list matters.
    """
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(token_ngrams(F.col(text_col), n)).alias("gram"),
    )
    bg = F.broadcast(benchmark_ngrams(bench, text_col, n))
    if flag_only and min_overlap <= 1:
        return grams.join(bg, "gram", "left_semi").select("doc_id").distinct()
    return (
        grams.join(bg, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
        .where(F.col("n_overlap") >= min_overlap)
    )
