"""As-of join: crafted-timeline semantics + brute-force oracle on real
events x orders."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators.asof import asof_join

SF_DIR = "/root/testdata/sf0.001"


def _ts(s):
    return datetime(2026, 1, 1, 0, 0, s)


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(20)), (1, _ts(5)), (2, _ts(10))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(8), "a"), (1, _ts(20), "b"), (1, _ts(30), "c"), (3, _ts(1), "z")],
        "k long, rts timestamp, v string",
    )
    out = asof_join(left, right, "k", "ts", "rts")
    got = {(r["k"], r["ts"].second): r["asof_v"] for r in out.collect()}
    # t=10 -> 'a' (8 <= 10); t=20 -> 'b' (inclusive); t=5 -> none; k=2 -> none
    assert got == {(1, 10): "a", (1, 20): "b", (1, 5): None, (2, 10): None}
    assert out.count() == left.count()  # left join: every left row survives


def test_asof_tiebreak_latest_wins(spark):
    left = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), 1, "lo"), (1, _ts(10), 9, "hi")],
        "k long, rts timestamp, seq long, v string",
    )
    out = asof_join(left, right, "k", "ts", "rts", tiebreak="seq").collect()
    assert out[0]["asof_v"] == "hi"


def test_asof_matches_bruteforce_on_fixture(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select("event_id", "user_id", "ts")
    orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .where(F.col("o_custkey") < 150)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )
    # map event ts into the order-date era so matches are non-degenerate
    probe = ev.withColumn(
        "probe_ts",
        F.timestamp_micros(
            F.lit(788918400000000)
            + F.unix_micros(F.col("ts").cast("timestamp")) % F.lit(189216000000000)
        ),
    ).select("event_id", "user_id", "probe_ts")
    orders2 = orders.withColumnRenamed("o_custkey", "user_id")
    out = asof_join(
        probe, orders2, "user_id", "probe_ts", "o_orderdate", tiebreak="o_orderkey"
    )
    got = {r["event_id"]: r["asof_o_orderkey"] for r in out.collect()}

    ords = {}
    for r in orders2.collect():
        ords.setdefault(r["user_id"], []).append(
            (r["o_orderdate"], r["o_orderkey"])
        )
    for v in ords.values():
        v.sort()
    want = {}
    for r in probe.collect():
        best = None
        for od, ok in ords.get(r["user_id"], []):
            if od <= r["probe_ts"]:
                best = ok  # sorted: last qualifying (date, key) wins
        want[r["event_id"]] = best
    assert got == want


def test_asof_null_right_ts_never_matches(spark):
    """A NULL-timestamp right row must match nothing (it would otherwise
    sort nulls-first and become the 'most recent' row for early left
    rows), and a NULL-timestamp left row matches nothing."""
    left = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00", 1), ("k", None, 2)],
        "k string, lts string, lid int",
    ).select("k", F.col("lts").cast("timestamp").alias("lts"), "lid")
    right = spark.createDataFrame(
        [("k", None, "poison"), ("k", "2024-06-01 00:00:00", "late")],
        "k string, rts string, v string",
    ).select("k", F.col("rts").cast("timestamp").alias("rts"), "v")
    out = {
        r["lid"]: r["asof_v"]
        for r in asof_join(left, right, "k", "lts", "rts").collect()
    }
    assert out == {1: None, 2: None}
