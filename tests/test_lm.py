"""Unigram LM scoring: agreement with a plain-Python model, held-out
scoring with unseen-token smoothing, and the gibberish-ranks-lower signal."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators.lm import (
    train_unigram,
    unigram_logprob_scores,
)


def _py_scores(texts: dict[int, str]) -> dict[int, tuple[int, float]]:
    from collections import Counter

    counts: Counter[str] = Counter()
    per_doc: dict[int, Counter[str]] = {}
    for doc_id, t in texts.items():
        c = Counter(x for x in t.split() if x)
        per_doc[doc_id] = c
        counts.update(c)
    N, V = sum(counts.values()), len(counts)
    out = {}
    for doc_id, c in per_doc.items():
        n = sum(c.values())
        if n == 0:
            continue
        s = sum(
            round(k * math.log((counts[tok] + 1) / float(N + V)), 9)
            for tok, k in c.items()
        )
        out[doc_id] = (n, round(s / n, 6))
    return out


def test_matches_python_model(spark):
    texts = {
        1: "the cat sat on the mat",
        2: "the dog sat",
        3: "zq xv qqq zq",
        4: "",
        5: "the the the the",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_logprob"])
        for r in unigram_logprob_scores(docs).collect()
    }
    want = _py_scores(texts)
    assert set(got) == set(want)  # zero-token doc 4 emits no row
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-6)


def test_common_language_scores_above_gibberish(spark):
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
        + [(100, "zxqv jkwp qqzz vvxk mmnn ppll")],
        "doc_id long, text string",
    )
    scores = {r["doc_id"]: r["mean_logprob"] for r in unigram_logprob_scores(docs).collect()}
    assert scores[100] < scores[0]


def test_heldout_scoring_with_unseen_tokens(spark):
    train = spark.createDataFrame(
        [(1, "a b c a b a")], "doc_id long, text string"
    )
    model = train_unigram(train)  # N=6, V=3
    test = spark.createDataFrame([(9, "a zz")], "doc_id long, text string")
    got = unigram_logprob_scores(test, model=model).collect()[0]
    # a: ln((3+1)/9), zz unseen: ln(1/9)
    want = round(
        (round(math.log(4 / 9.0), 9) + round(math.log(1 / 9.0), 9)) / 2, 6
    )
    assert got["n_tokens"] == 2
    assert got["mean_logprob"] == pytest.approx(want, abs=1e-6)


def test_bigram_lm_prefers_fluent_docs(spark):
    """A doc made of corpus-frequent bigrams outscores a shuffled-token
    doc with identical unigram counts — exactly the signal the unigram
    model cannot see."""
    from sneaky_data_matcher_spark.operators.lm import bigram_logprob_scores

    base = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    fluent = (100, "the quick brown fox jumps over the lazy dog")
    shuffled = (101, "dog the over quick lazy fox brown jumps the")
    docs = spark.createDataFrame(
        base + [fluent, shuffled], "doc_id long, text string"
    )
    out = {r.doc_id: r.mean_logprob for r in bigram_logprob_scores(docs).collect()}
    assert out[100] > out[101]


def test_bigram_counts_exact(spark):
    from sneaky_data_matcher_spark.operators.lm import doc_bigram_counts

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "x"), (3, "")], "doc_id long, text string"
    )
    out = {(r.doc_id, r.prev, r.cur): r.c for r in doc_bigram_counts(docs).collect()}
    assert out == {(1, "a", "b"): 2, (1, "b", "a"): 1}
