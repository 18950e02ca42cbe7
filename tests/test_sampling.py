"""Deterministic sampling + mixture weighting: reproducibility,
partition-layout independence, and mixture math vs a Python oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import sampling

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").localCheckpoint(eager=True)


def _lehmer_unit(key: int, salt: int = 0) -> float:
    x = (key + salt) % sampling.LEHMER_M
    h = (x * sampling.LEHMER_A) % sampling.LEHMER_M
    h = (h * sampling.LEHMER_A) % sampling.LEHMER_M
    return h / float(sampling.LEHMER_M)


def test_deterministic_sample_matches_python(docs):
    got = {r["doc_id"] for r in sampling.deterministic_sample(docs, "doc_id", 0.25).collect()}
    want = {r["doc_id"] for r in docs.select("doc_id").collect() if _lehmer_unit(r["doc_id"]) < 0.25}
    assert got == want
    assert 0.10 < len(got) / docs.count() < 0.40  # roughly a quarter


def test_sample_is_layout_independent(docs):
    a = {r["doc_id"] for r in sampling.deterministic_sample(docs, "doc_id", 0.3).collect()}
    shuffled = docs.repartition(13, "text")
    b = {r["doc_id"] for r in sampling.deterministic_sample(shuffled, "doc_id", 0.3).collect()}
    assert a == b


def test_salts_draw_different_subsets(docs):
    a = {r["doc_id"] for r in sampling.deterministic_sample(docs, "doc_id", 0.3, salt=0).collect()}
    b = {r["doc_id"] for r in sampling.deterministic_sample(docs, "doc_id", 0.3, salt=777).collect()}
    assert a != b and len(a & b) < len(a)  # independent-ish draws


def test_mixture_weights_math(spark):
    df = spark.createDataFrame(
        [(i, "en") for i in range(80)] + [(i + 100, "fr") for i in range(20)],
        "doc_id long, lang string",
    )
    w = {r["stratum"]: r for r in sampling.mixture_weights(df, "lang", {"en": 0.5, "fr": 0.5}).collect()}
    # ratios: en 0.5/0.8 = 0.625, fr 0.5/0.2 = 2.5 -> fr pinned to 1.0
    assert w["fr"]["weight"] == 1.0
    assert abs(w["en"]["weight"] - 0.25) < 1e-9
    assert w["en"]["n_rows"] == 80 and w["fr"]["n_rows"] == 20


def test_stratified_sample_hits_target_mixture(spark):
    df = spark.createDataFrame(
        [(i, "en") for i in range(4000)] + [(i + 10000, "fr") for i in range(1000)],
        "doc_id long, lang string",
    )
    out = sampling.stratified_sample(df, "doc_id", "lang", {"en": 0.5, "fr": 0.5})
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # fr kept whole (weight 1.0), en downsampled to ~1000
    assert counts["fr"] == 1000
    assert 850 < counts["en"] < 1150


def test_uniform_default_targets(spark):
    df = spark.createDataFrame(
        [(i, "a") for i in range(90)] + [(i + 100, "b") for i in range(10)],
        "doc_id long, lang string",
    )
    w = {r["stratum"]: r["weight"] for r in sampling.mixture_weights(df, "lang").collect()}
    assert w["b"] == 1.0
    assert abs(w["a"] - (10.0 / 90.0)) < 1e-8
