"""Sessionization: lag/cumsum vs the native session_window operator, plus
a hand-built oracle on crafted timelines."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import sessions

SF_DIR = "/root/testdata/sf0.001"


def _mk(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2026, 1, 1, 0, 0, s), float(v)) for u, s, v in rows],
        "user_id long, ts timestamp, value double",
    )


def test_sessionize_boundaries(spark):
    # user 1: events at t=0, 10, 10+gap (boundary: >= gap starts NEW)
    ev = _mk(spark, [(1, 0, 1), (1, 10, 2), (1, 40, 3), (2, 5, 9)])
    out = sessions.sessionize(ev, gap_s=30).collect()
    got = {(r["user_id"], int(r["ts"].timestamp() % 3600)): r["session_no"] for r in out}
    assert got == {(1, 0): 1, (1, 10): 1, (1, 40): 2, (2, 5): 1}


def test_sessionize_gap_is_half_open(spark):
    # diff == gap-1 merges; diff == gap splits (session_window semantics)
    ev = _mk(spark, [(1, 0, 1), (1, 29, 1), (2, 0, 1), (2, 30, 1)])
    out = sessions.sessionize(ev, gap_s=30)
    per_user = {
        r["user_id"]: r["n"]
        for r in out.groupBy("user_id")
        .agg(F.countDistinct("session_no").alias("n"))
        .collect()
    }
    assert per_user == {1: 1, 2: 2}


def test_session_stats_agrees_with_sessionize(spark):
    """The native session_window aggregation must produce exactly the
    sessions the lag/cumsum assignment implies — same (user, first_ts,
    count, sum) multiset — on real event data."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    gap = 600
    a = (
        sessions.sessionize(ev, gap_s=gap)
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("session_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias("sum_value"),
        )
        .select("user_id", "session_start", "session_events", "sum_value")
    )
    b = sessions.session_stats(ev, gap_s=gap).select(
        "user_id",
        F.col("session_start").cast("timestamp").alias("session_start"),
        "session_events",
        F.round("sum_value", 6).alias("sum_value"),
    )
    assert a.count() > 0
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_session_stats_duration(spark):
    ev = _mk(spark, [(7, 0, 1.5), (7, 10, 2.5), (7, 25, 3.0)])
    row = sessions.session_stats(ev, gap_s=30).collect()
    assert len(row) == 1
    assert row[0]["session_events"] == 3
    assert row[0]["duration_s"] == 25.0
    assert row[0]["sum_value"] == 7.0
