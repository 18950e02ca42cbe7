"""Span-sequence alignment for matched pairs of interleaved documents.

The input payload is an ORDERED sequence of interleaved text+media spans
(BASELINE input_hint: spans:array<struct<kind,text,media_ref,offset>>);
the matcher scores documents on concatenated text + media-ref agreement,
which is blind to span STRUCTURE. This operator explains a matched pair at
span granularity: how many spans agree (multiset), how long the sequences
agree from the start (ordered prefix), and whether the media subsequence
is identical — the pair-level twin of the per-row span-sequence invariant
(sources/spans.py span_signature).

Span key: ``'text:' || text`` for text spans, ``kind || ':' || media_ref``
for media spans, taken in offset order. All metrics are native column
expressions over the two short key arrays (span counts are bounded by the
chunking, so the O(n^2) multiset/prefix folds are constant-bounded
per-row work inside codegen — no kernel, no shuffle beyond the two
attach joins).

Scale notes (100 TB): the pair frame joins the span-key projection twice
(shuffle on doc id — the standard attach pattern, same as scoring); the
key arrays ride only on the matched-pair rows (tiny vs candidates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def span_keys(spans_col: Column) -> Column:
    """Ordered array<string> of span keys in offset order."""
    ordered = F.array_sort(
        spans_col,
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )
    return F.transform(
        ordered,
        lambda s: F.when(
            s["kind"] == "text", F.concat(F.lit("text:"), s["text"])
        ).otherwise(F.concat(s["kind"], F.lit(":"), s["media_ref"])),
    )


def _multiset_overlap(ka: Column, kb: Column) -> Column:
    """Σ over distinct keys of min(count_a, count_b) — multiset
    intersection size."""
    return F.aggregate(
        F.array_distinct(ka),
        F.lit(0),
        lambda acc, k: acc
        + F.least(
            F.size(F.filter(ka, lambda x: x == k)),
            F.size(F.filter(kb, lambda x: x == k)),
        ),
    )


def _prefix_len(ka: Column, kb: Column) -> Column:
    """Length of the longest common ordered prefix. Prefix equality is
    monotone, so counting the i with equal length-i prefixes IS the
    prefix length."""
    n = F.least(F.size(ka), F.size(kb))
    return F.when(n == 0, F.lit(0)).otherwise(
        F.aggregate(
            F.sequence(F.lit(1), n),
            F.lit(0),
            lambda acc, i: acc
            + F.when(F.slice(ka, 1, i) == F.slice(kb, 1, i), 1).otherwise(0),
        )
    )


def pair_span_alignment(
    pairs: DataFrame,
    spans: DataFrame,
    id_a: str = "doc_id_a",
    id_b: str = "doc_id_b",
) -> DataFrame:
    """(doc_id_a, doc_id_b, n_spans_a, n_spans_b, n_common, span_jaccard,
    prefix_len, media_seq_equal) for every input pair. ``spans`` is the
    (doc_id, spans) frame."""
    keys = spans.select("doc_id", span_keys(F.col("spans")).alias("k"))
    j = (
        pairs.select(id_a, id_b)
        .join(keys.select(F.col("doc_id").alias(id_a), F.col("k").alias("ka")), id_a)
        .join(keys.select(F.col("doc_id").alias(id_b), F.col("k").alias("kb")), id_b)
    )
    ka, kb = F.col("ka"), F.col("kb")
    overlap = _multiset_overlap(ka, kb)
    med = lambda k: F.filter(k, lambda x: ~x.startswith("text:"))
    return j.select(
        id_a,
        id_b,
        F.size(ka).alias("n_spans_a"),
        F.size(kb).alias("n_spans_b"),
        overlap.alias("n_common"),
        F.round(
            overlap / (F.size(ka) + F.size(kb) - overlap).cast("double"), 6
        ).alias("span_jaccard"),
        _prefix_len(ka, kb).alias("prefix_len"),
        (med(ka) == med(kb)).alias("media_seq_equal"),
    )
