"""Span-sequence alignment: hand-computed metrics on crafted interleaved
span sequences, self-alignment identities, and order sensitivity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import span_align as SA
from sneaky_data_matcher_spark.sources.spans import SPAN_SCHEMA


def _spans_df(spark, rows):
    """rows: {doc_id: [(kind, text, media_ref, offset), ...]}"""
    data = [
        (d, [{"kind": k, "text": t, "media_ref": m, "offset": o} for k, t, m, o in sp])
        for d, sp in rows.items()
    ]
    return spark.createDataFrame(data, f"doc_id string, spans {SPAN_SCHEMA}")


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id_a string, doc_id_b string")


def test_hand_computed_metrics(spark):
    spans = _spans_df(
        spark,
        {
            # a: text("x y"), text("z"), image(m1), audio(m2)
            "a": [
                ("text", "x y", None, 0),
                ("text", "z", None, 1),
                ("image", None, "m1", 2),
                ("audio", None, "m2", 3),
            ],
            # b: same first chunk, different second, same image, no audio
            "b": [
                ("text", "x y", None, 0),
                ("text", "w", None, 1),
                ("image", None, "m1", 2),
            ],
            # c: a's spans in a DIFFERENT stored order (offsets reversed in
            # array order) — offset sort must normalize before comparing
            "c": [
                ("audio", None, "m2", 3),
                ("image", None, "m1", 2),
                ("text", "z", None, 1),
                ("text", "x y", None, 0),
            ],
        },
    )
    out = {
        (r["doc_id_a"], r["doc_id_b"]): r
        for r in SA.pair_span_alignment(
            _pairs_df(spark, [("a", "b"), ("a", "c")]), spans
        ).collect()
    }
    ab = out[("a", "b")]
    assert (ab["n_spans_a"], ab["n_spans_b"]) == (4, 3)
    assert ab["n_common"] == 2  # 'text:x y' and 'image:m1'
    assert ab["span_jaccard"] == pytest.approx(2 / 5, abs=1e-6)
    assert ab["prefix_len"] == 1  # diverges at the second span
    assert not ab["media_seq_equal"]  # [image:m1, audio:m2] vs [image:m1]

    ac = out[("a", "c")]  # identical sequences modulo stored order
    assert ac["n_common"] == 4
    assert ac["span_jaccard"] == pytest.approx(1.0, abs=1e-6)
    assert ac["prefix_len"] == 4
    assert ac["media_seq_equal"]


def test_multiset_semantics(spark):
    """Repeated identical spans must count min-multiplicity, not set-1."""
    spans = _spans_df(
        spark,
        {
            "a": [("text", "x", None, 0), ("text", "x", None, 1), ("text", "x", None, 2)],
            "b": [("text", "x", None, 0), ("text", "x", None, 1)],
        },
    )
    r = SA.pair_span_alignment(_pairs_df(spark, [("a", "b")]), spans).collect()[0]
    assert r["n_common"] == 2
    assert r["prefix_len"] == 2
    assert r["span_jaccard"] == pytest.approx(2 / 3, abs=1e-6)


def test_disjoint_pair(spark):
    spans = _spans_df(
        spark,
        {
            "a": [("text", "x", None, 0)],
            "b": [("video", None, "v9", 0)],
        },
    )
    r = SA.pair_span_alignment(_pairs_df(spark, [("a", "b")]), spans).collect()[0]
    assert r["n_common"] == 0 and r["prefix_len"] == 0
    assert r["span_jaccard"] == 0.0
    assert not r["media_seq_equal"]
