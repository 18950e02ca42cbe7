"""Bucketed tables: the shuffle elimination is asserted IN-PLAN, results
equal the plain join, and the spec survives only through the catalog."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.sources import bucketed as B


@pytest.fixture
def two_tables(spark, tmp_path):
    a = spark.range(5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13).alias("x")
    )
    b = spark.range(0, 5000, 2).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("y")
    )
    B.save_bucketed(a, "tb_a", str(tmp_path / "a"), "doc_id", n_buckets=8)
    B.save_bucketed(b, "tb_b", str(tmp_path / "b"), "doc_id", n_buckets=8)
    yield a, b
    B.drop_table(spark, "tb_a")
    B.drop_table(spark, "tb_b")


def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return old


def test_bucketed_join_zero_exchanges(spark, two_tables):
    a, b = two_tables
    old = _no_broadcast(spark)
    try:
        j = B.load_bucketed(spark, "tb_a").join(B.load_bucketed(spark, "tb_b"), "doc_id")
        plan = j._jdf.queryExecution().executedPlan().treeString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and results equal the plain join
        want = a.join(b, "doc_id").count()
        assert j.count() == want == 2500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_plain_parquet_read_loses_spec(spark, two_tables, tmp_path):
    old = _no_broadcast(spark)
    try:
        raw_a = spark.read.parquet(str(tmp_path / "a"))
        j = raw_a.join(B.load_bucketed(spark, "tb_b"), "doc_id")
        plan = j._jdf.queryExecution().executedPlan().treeString()
        assert "Exchange" in plan  # the path read must re-shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_groupby_on_bucket_key_no_exchange(spark, two_tables):
    g = (
        B.load_bucketed(spark, "tb_a")
        .groupBy("doc_id")
        .agg(F.sum("x").alias("sx"))
    )
    plan = g._jdf.queryExecution().executedPlan().treeString()
    assert "Exchange" not in plan
