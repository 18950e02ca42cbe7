"""Interleaved text+media spans table (the BASELINE input_hint schema).

    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

``derive_spans`` deterministically lifts a flat (doc_id, text) table into
this shape — pure column expressions, no Python — so the driver's flat
``documents.parquet`` can feed the pipeline AND a DuckDB oracle can recompute
the same keys from the flat text. ``spans_to_text`` is its inverse for the
text modality. ``span_violations`` checks the per-row invariant from the
north rule: the stored span sequence (kind, text, media_ref, order) must be
byte-identical across pipeline stages (canonicalization only ever *derives*
key columns, never mutates spans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPAN_SCHEMA = (
    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def derive_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 8,
) -> DataFrame:
    """(id, text) -> (doc_id:string, spans). Text is chunked into
    ``chunk_tokens``-token text spans; 0-2 deterministic media spans are
    appended, with media_ref keyed off the *sorted token set* so near-
    duplicate docs share media refs (mirrors duplicate docs re-using the
    same asset). Entirely JVM-side."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit(""))
    n_chunks = F.greatest(F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int"), F.lit(1))
    text_spans = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.lit("text").alias("kind"),
            F.array_join(F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " ").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    content_key = F.sha2(
        F.array_join(F.array_sort(F.array_distinct(F.transform(toks, F.lower))), " "), 256
    )
    # media count + kind are keyed off hex digits of the CONTENT key (not
    # xxhash64 of raw text) for two reasons: (a) docs with the same token set
    # now share the full media span sequence, not just ref prefixes —
    # stronger "near-dups reuse assets" semantics; (b) sha2 hex digits are
    # portable to the DuckDB oracle (xxhash64 is not), so media-derived
    # driver queries get real value-hash checks (VERDICT r1 item 8).
    _hexdigit = lambda pos: F.conv(F.substring(content_key, pos, 1), 16, 10).cast("int")
    n_media = _hexdigit(F.lit(1)) % 3
    media_spans = F.transform(
        F.sequence(F.lit(0), n_media - 1),
        lambda j: F.struct(
            # kind keyed off (content_key, j) so all three modalities occur
            # even for docs with a single media span
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                _hexdigit(j + 2) % 3 + 1,
            ).alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("m:"), F.substring(content_key, 1, 16), F.lit("-"), j.cast("string")).alias("media_ref"),
            (n_chunks + j).cast("int").alias("offset"),
        ),
    )
    spans = F.when(n_media > 0, F.concat(text_spans, media_spans)).otherwise(text_spans)
    return docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        spans.alias("spans"),
    )


def doc_text_expr(spans_col: Column) -> Column:
    """Concatenated text-span content in offset order (single-space join)."""
    ordered = F.array_sort(
        spans_col,
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )
    texts = F.transform(
        F.filter(ordered, lambda s: s["kind"] == "text"), lambda s: s["text"]
    )
    return F.array_join(texts, " ")


def media_refs_expr(spans_col: Column) -> Column:
    """Array of media_refs from non-text spans (may be empty)."""
    return F.transform(
        F.filter(spans_col, lambda s: s["kind"] != "text"), lambda s: s["media_ref"]
    )


def spans_to_text(spans_df: DataFrame) -> DataFrame:
    return spans_df.select(
        "doc_id",
        doc_text_expr(F.col("spans")).alias("doc_text"),
        media_refs_expr(F.col("spans")).alias("media_refs"),
    )


def span_signature(spans_col: Column) -> Column:
    """Deterministic signature of the full span sequence
    (kind, text, media_ref, order) — the per-row invariant."""
    ordered = F.array_sort(
        spans_col,
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )
    return F.sha2(
        F.to_json(
            F.transform(
                ordered,
                lambda s: F.struct(s["kind"], s["text"], s["media_ref"], s["offset"]),
            )
        ),
        256,
    )


def span_violations(before: DataFrame, after: DataFrame) -> int:
    """Count rows whose span sequence changed between two pipeline stages.
    Must be 0 after every stage (north-rule invariant)."""
    b = before.select("doc_id", span_signature(F.col("spans")).alias("sig_b"))
    a = after.select("doc_id", span_signature(F.col("spans")).alias("sig_a"))
    return (
        b.join(a, "doc_id", "full_outer")
        .where(
            F.col("sig_b").isNull()
            | F.col("sig_a").isNull()
            | (F.col("sig_b") != F.col("sig_a"))
        )
        .count()
    )
