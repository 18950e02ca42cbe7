"""DSIR importance resampling: agreement with a plain-Python model of the
hashed-n-gram likelihood ratio, the target-looks-heavier signal, and
deterministic Gumbel top-k behavior."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import dsir
from sneaky_data_matcher_spark.operators.sampling import LEHMER_A, LEHMER_M


def _buckets(text: str, buckets: int) -> list[int]:
    toks = [t for t in text.lower().split() if t]
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    out = []
    for g in grams:
        acc = 0
        for ch in g:
            acc = (acc * dsir.DSIR_B + ord(ch)) % dsir.DSIR_M
        out.append(acc % buckets)
    return out


def _py_weights(
    raw: dict[int, str], target: dict[int, str], buckets: int
) -> dict[int, tuple[int, float]]:
    from collections import Counter

    t_model: Counter[int] = Counter()
    for t in target.values():
        t_model.update(_buckets(t, buckets))
    r_docs = {i: Counter(_buckets(t, buckets)) for i, t in raw.items()}
    r_model: Counter[int] = Counter()
    for c in r_docs.values():
        r_model.update(c)
    tot_t, tot_r = sum(t_model.values()), sum(r_model.values())
    out = {}
    for i, c in r_docs.items():
        n = sum(c.values())
        if n == 0:
            continue
        s = sum(
            round(
                k
                * math.log(
                    ((t_model[b] + 1) * (tot_r + buckets))
                    / float((r_model[b] + 1) * (tot_t + buckets))
                ),
                9,
            )
            for b, k in c.items()
        )
        out[i] = (n, round(s, 6))
    return out


RAW = {
    1: "the cat sat on the mat",
    2: "the dog sat on a log",
    3: "zq xv qqq zq vv xk",
    4: "",
    5: "select sum from table group by key",
    6: "the cat and the dog sat",
}
TARGET = {10: "the cat sat", 11: "the dog and the cat", 12: "a cat on a mat"}


def test_matches_python_model(spark):
    raw = spark.createDataFrame(list(RAW.items()), "doc_id long, text string")
    target = spark.createDataFrame(
        list(TARGET.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_features"], r["log_weight"])
        for r in dsir.dsir_log_weights(raw, target, buckets=64).collect()
    }
    want = _py_weights(RAW, TARGET, 64)
    assert set(got) == set(want)  # empty doc 4 emits no row
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-6)


def test_target_like_docs_weigh_heavier(spark):
    """Docs built from target vocabulary must out-weigh off-distribution
    docs — the property DSIR selection rests on."""
    raw = spark.createDataFrame(list(RAW.items()), "doc_id long, text string")
    target = spark.createDataFrame(
        list(TARGET.items()), "doc_id long, text string"
    )
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir.dsir_log_weights(raw, target, buckets=1024).collect()
    }
    # 1 and 6 are target-vocab sentences; 3 is gibberish, 5 is SQL-speak
    assert min(w[1], w[6]) > max(w[3], w[5])


def test_gumbel_topk_deterministic_subset(spark):
    raw = spark.createDataFrame(list(RAW.items()), "doc_id long, text string")
    target = spark.createDataFrame(
        list(TARGET.items()), "doc_id long, text string"
    )
    w = dsir.dsir_log_weights(raw, target, buckets=64)
    a = [r["doc_id"] for r in dsir.gumbel_topk(w, 3).collect()]
    b = [r["doc_id"] for r in dsir.gumbel_topk(w, 3).collect()]
    assert a == b and len(a) == 3
    full = {r["doc_id"] for r in w.collect()}
    assert set(a) <= full
    # the key decomposes as log_weight + gumbel(doc_id): recompute one
    row = dsir.gumbel_topk(w, 3).collect()[0]
    x = row["doc_id"] % LEHMER_M
    h = (x * LEHMER_A) % LEHMER_M
    h = (h * LEHMER_A) % LEHMER_M
    u = (h + 0.5) / float(LEHMER_M)
    assert row["gumbel_key"] == pytest.approx(
        round(row["log_weight"] + -math.log(-math.log(u)), 9), abs=1e-8
    )
    # a different salt draws a (generally) different sample but the same
    # weight support
    c = [r["doc_id"] for r in dsir.gumbel_topk(w, 3, salt=7).collect()]
    assert set(c) <= full


def test_self_target_weights_are_flat_zero(spark):
    """When target == raw, p̂ == q̂ and every log-weight is exactly 0 —
    a sharp internal-consistency check on both models' bookkeeping."""
    raw = spark.createDataFrame(
        [(i, t) for i, t in RAW.items() if t], "doc_id long, text string"
    )
    w = dsir.dsir_log_weights(raw, raw, buckets=64).collect()
    assert w and all(r["log_weight"] == 0.0 for r in w)
