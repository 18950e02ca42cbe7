"""Bucketed temporal joins vs brute-force theta joins: boundary semantics,
exactly-once emission across bucket widths, open-interval routing."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import intervals

T0 = datetime(2026, 1, 1)


def _ts(s):
    return T0 + timedelta(seconds=s)


def _points(spark, rows):
    return spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(rows)],
        "pid long, k long, pt timestamp",
    )


def _ivs(spark, rows):
    return spark.createDataFrame(
        [
            (i, k, _ts(s), None if e is None else _ts(e))
            for i, (k, s, e) in enumerate(rows)
        ],
        "iid long, k long, s timestamp, e timestamp",
    )


def _pij(pts, ivs, width, keys=("k",)):
    out = intervals.point_in_interval_join(
        pts, ivs, point_ts="pt", start_col="s", end_col="e",
        key_cols=list(keys), bucket_width_s=width,
    )
    return sorted((r["pid"], r["iid"]) for r in out.collect())


def test_point_boundaries_half_open(spark):
    ivs = _ivs(spark, [(1, 100, 200)])
    pts = _points(spark, [(1, 99), (1, 100), (1, 199), (1, 200)])
    assert _pij(pts, ivs, 50) == [(1, 0), (2, 0)]  # start in, end out


def test_point_matches_across_bucket_widths(spark):
    # interval spans many buckets; the point bucket join must find it
    # regardless of width, and produce each pair exactly once
    ivs = _ivs(spark, [(1, 0, 10_000), (1, 5_000, 6_000), (2, 0, 10_000)])
    pts = _points(spark, [(1, 5_500), (1, 9_999), (2, 3)])
    expect = [(0, 0), (0, 1), (1, 0), (2, 2)]
    for width in (7, 100, 3_600, 86_400):
        assert _pij(pts, ivs, width) == expect, width


def test_open_interval_routed_by_key(spark):
    ivs = _ivs(spark, [(1, 100, None), (2, 0, 50)])
    pts = _points(spark, [(1, 99), (1, 100), (1, 10_000_000), (2, 10)])
    assert _pij(pts, ivs, 60) == [(1, 0), (2, 0), (3, 1)]


def test_overlap_exactly_once_and_touching_excluded(spark):
    a = _ivs(spark, [(1, 0, 1_000), (1, 1_000, 2_000)])
    b = _ivs(spark, [(1, 999, 1_001), (1, 2_000, 3_000)]).select(
        F.col("iid").alias("jid"), F.col("k").alias("k2"),
        F.col("s").alias("s2"), F.col("e").alias("e2"),
    )
    for width in (10, 500, 86_400):
        out = intervals.interval_overlap_join(
            a.withColumnRenamed("k", "k1"), b,
            a_start="s", a_end="e", b_start="s2", b_end="e2",
            bucket_width_s=width,
        )
        got = sorted((r["iid"], r["jid"]) for r in out.collect())
        # [999,1001) overlaps both; [2000,3000) touches [1000,2000) only
        assert got == [(0, 0), (1, 0)], width


def test_overlap_matches_bruteforce_random(spark):
    import random

    rng = random.Random(7)
    a_rows = [(1, s := rng.randrange(0, 5_000), s + rng.randrange(1, 2_000))
              for _ in range(60)]
    b_rows = [(1, s := rng.randrange(0, 5_000), s + rng.randrange(1, 2_000))
              for _ in range(60)]
    a = _ivs(spark, a_rows)
    b = _ivs(spark, b_rows).select(
        F.col("iid").alias("jid"), F.col("s").alias("s2"), F.col("e").alias("e2")
    )
    brute = sorted(
        (i, j)
        for i, (_, s1, e1) in enumerate(a_rows)
        for j, (_, s2, e2) in enumerate(b_rows)
        if s1 < e2 and s2 < e1
    )
    out = intervals.interval_overlap_join(
        a.drop("k"), b, a_start="s", a_end="e", b_start="s2", b_end="e2",
        bucket_width_s=700,
    )
    assert sorted((r["iid"], r["jid"]) for r in out.collect()) == brute
