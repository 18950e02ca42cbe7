"""TableIO format matrix: round-trip + committed-marker semantics for
every fallback format, and the RunContext resume path on ORC."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.sources.io import TableIO


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json"])
def test_roundtrip_and_success_marker(spark, tmp_path, fmt):
    io = TableIO(spark, str(tmp_path), fmt=fmt)
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("k"),
        (F.col("id") * 1.5).alias("x"),
    )
    assert not io.exists("t")
    io.save(df, "t")
    assert io.exists("t")
    back = io.load("t")
    got = sorted((r["doc_id"], r["k"], r["x"]) for r in back.collect())
    want = sorted((r["doc_id"], r["k"], r["x"]) for r in df.collect())
    assert got == want
    io.append(df.where(F.col("doc_id") < 10), "t")
    assert io.load("t").count() == 110
    io.delete("t")
    assert not io.exists("t")


def test_csv_roundtrip_strings(spark, tmp_path):
    io = TableIO(spark, str(tmp_path), fmt="csv")
    df = spark.range(20).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    io.save(df, "t")
    back = io.load("t").select(F.col("doc_id").cast("long"), "val")
    assert sorted((r["doc_id"], r["val"]) for r in back.collect()) == sorted(
        (r["doc_id"], r["val"]) for r in df.collect()
    )


def test_bad_fmt_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        TableIO(spark, str(tmp_path), fmt="avro")


def test_orc_predicate_pushdown(spark, tmp_path):
    # ORC must be a real columnar scan: the filter reaches the reader
    io = TableIO(spark, str(tmp_path), fmt="orc")
    io.save(spark.range(1000).select(F.col("id").alias("doc_id")), "t")
    plan = (
        io.load("t")
        .where(F.col("doc_id") > 990)
        ._jdf.queryExecution()
        .executedPlan()
        .treeString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,990)" in plan
