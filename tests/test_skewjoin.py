"""Salted join vs plain join: equality on skewed data, both hot/cold
branches, left-join null rows, and the salt actually spreading a hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators.skewjoin import salted_join


def _fact(spark, n_hot=400, n_cold=30):
    rows = [(i, "hot") for i in range(n_hot)]
    rows += [(n_hot + i, f"cold{i % 3}") for i in range(n_cold)]
    return spark.createDataFrame(rows, "rid long, k string")


def _dim(spark, extra_unmatched=True):
    rows = [("hot", 1.0), ("cold0", 2.0), ("cold1", 3.0), ("cold2", 4.0)]
    if extra_unmatched:
        rows.append(("nobody", 9.0))
    return spark.createDataFrame(rows, "k string, w double")


def _plain(fact, dim, how):
    return sorted(
        (r["rid"], r["k"], r["w"])
        for r in fact.join(dim, "k", how).select("rid", "k", "w").collect()
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_matches_plain_join(spark, how):
    fact, dim = _fact(spark), _dim(spark)
    out = salted_join(fact, dim, "k", "rid", n_salts=4, hot_threshold=100, how=how)
    got = sorted((r["rid"], r["k"], r["w"]) for r in out.select("rid", "k", "w").collect())
    assert got == _plain(fact, dim, how)


def test_missing_dim_key_left_nulls(spark):
    fact = _fact(spark).unionByName(
        spark.createDataFrame([(9999, "orphan")], "rid long, k string")
    )
    out = salted_join(fact, _dim(spark), "k", "rid", n_salts=4,
                      hot_threshold=100, how="left")
    row = [r for r in out.collect() if r["k"] == "orphan"]
    assert len(row) == 1 and row[0]["w"] is None


def test_hot_key_really_salted(spark):
    # peek at the pre-drop salt distribution via the same expression
    fact = _fact(spark)
    hotn = fact.where(F.col("k") == "hot")
    salts = (
        hotn.select(F.pmod(F.xxhash64("rid"), F.lit(4)).cast("int").alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(salts) == 4  # all 4 sub-buckets populated
    # and the operator's output for the hot key is complete
    out = salted_join(fact, _dim(spark), "k", "rid", n_salts=4, hot_threshold=100)
    assert out.where(F.col("k") == "hot").count() == 400


def test_no_hot_keys_degenerates_to_plain(spark):
    fact, dim = _fact(spark, n_hot=10), _dim(spark)
    out = salted_join(fact, dim, "k", "rid", n_salts=4, hot_threshold=1000)
    assert sorted(
        (r["rid"], r["k"], r["w"]) for r in out.select("rid", "k", "w").collect()
    ) == _plain(fact, dim, "inner")


def test_rejects_right_join(spark):
    with pytest.raises(ValueError):
        salted_join(_fact(spark), _dim(spark), "k", "rid", how="right")
