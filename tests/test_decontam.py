"""Decontamination: n-gram overlap vs a brute-force Python oracle, plus
the flag_only semi-join shape."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import decontam

SF_DIR = "/root/testdata/sf0.001"


def _py_ngrams(text: str, n: int) -> set[str]:
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_decontaminate_matches_python_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 37 == 0)
    corpus = docs.where(F.col("doc_id") % 37 != 0)
    n = 5
    got = {
        r["doc_id"]: r["n_overlap"]
        for r in decontam.decontaminate(corpus, bench, n=n).collect()
    }
    bench_grams = set()
    for r in bench.collect():
        bench_grams |= _py_ngrams(r["text"], n)
    want = {}
    for r in corpus.collect():
        k = len(_py_ngrams(r["text"], n) & bench_grams)
        if k >= 1:
            want[r["doc_id"]] = k
    assert want, "fixture should contain contamination (near-dup corpus)"
    assert got == want


def test_flag_only_equals_counted(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 37 == 0)
    corpus = docs.where(F.col("doc_id") % 37 != 0)
    a = {r["doc_id"] for r in decontam.decontaminate(corpus, bench, n=5, flag_only=True).collect()}
    b = {r["doc_id"] for r in decontam.decontaminate(corpus, bench, n=5).collect()}
    assert a == b


def test_short_doc_matches_whole_text(spark):
    bench = spark.createDataFrame([(0, "tiny snippet")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "Tiny  Snippet"), (2, "tiny other")], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in decontam.decontaminate(corpus, bench, n=13).collect()}
    assert got == {1}  # case/whitespace-normalized whole-text gram for short docs


def test_min_overlap_threshold(spark):
    bench = spark.createDataFrame(
        [(0, "a b c d e f g h")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "a b c d e x y z"), (2, "a b c d e f x y")], "doc_id long, text string"
    )
    # n=5: doc1 shares 1 gram ("a b c d e"), doc2 shares 2
    got = {r["doc_id"] for r in decontam.decontaminate(corpus, bench, n=5, min_overlap=2).collect()}
    assert got == {2}
