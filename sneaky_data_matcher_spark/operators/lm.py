"""Corpus-trained unigram language-model scoring (perplexity-proxy filter).

The classic cheap LM quality signal for pretraining corpora: train unigram
counts over the corpus, score each document by its mean token log-probability
under the add-one-smoothed model; low scores flag gibberish / OCR noise /
non-language blobs that heuristic ratios (quality_score) miss.

Scale shape: tokens are aggregated to per-(doc, token) counts FIRST (map-side
combinable), so the vocabulary join shuffles one row per distinct doc-token,
not one per occurrence — hot Zipf tokens ("the") are bounded by doc count.
Model totals (N, V) ride along as a broadcast single-row frame; nothing is
collected to the driver.

Determinism: each doc-token term c·ln(p) is computed in doubles (identical
left-to-right arithmetic in any engine), rounded to 9 decimals, and summed
as DECIMAL — order-independent exact addition — then the mean is rounded to
6. Same stability trick as events_windowed's decimal sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens


def doc_token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, tok, c) — per-document token occurrence counts."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )


def train_unigram(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Unigram model counts: (tok, n) over the whole corpus."""
    return (
        doc_token_counts(docs, id_col, text_col)
        .groupBy("tok")
        .agg(F.sum("c").alias("n"))
    )


def unigram_logprob_scores(
    docs: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, mean_logprob) — mean add-one-smoothed unigram
    log-probability per document. ``model`` defaults to counts trained on
    ``docs`` itself (self-scoring); pass a trained frame to score held-out
    docs (unseen tokens get the smoothed floor ln(1/(N+V))). Zero-token
    docs emit no row."""
    dt = doc_token_counts(docs, id_col, text_col)
    counts = model if model is not None else dt.groupBy("tok").agg(F.sum("c").alias("n"))
    totals = F.broadcast(
        counts.agg(F.sum("n").alias("tot_n"), F.count("*").alias("vocab_v"))
    )
    j = (
        dt.join(counts, "tok", "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .crossJoin(totals)
    )
    term = F.round(
        F.col("c")
        * F.log((F.col("n") + 1) / (F.col("tot_n") + F.col("vocab_v")).cast("double")),
        9,
    ).cast("decimal(28,10)")
    return (
        j.select("doc_id", "c", term.alias("term"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            # cast the exact decimal sum to double BEFORE dividing so both
            # engines perform the same double/long division
            F.round(F.sum("term").cast("double") / F.sum("c"), 6).alias("mean_logprob"),
        )
    )
