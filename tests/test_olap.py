"""OLAP additions (r3 continuation): pivot matrix, decile table, skyline.

Each driver query also has a DuckDB oracle (tools/oracle_check.py); these
tests check the SEMANTICS against brute-force Python on sf0.001 — the
skyline especially, whose windowed two-pass algorithm is easy to get
wrong on price ties.
"""

from __future__ import annotations

from decimal import Decimal

from sneaky_data_matcher_spark import entry_queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_skyline_matches_bruteforce(spark):
    rows = [
        (r["o_orderkey"], r["o_totalprice"], r["o_orderdate"])
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .collect()
    ]

    def dominated(r1):
        return any(
            r2[1] >= r1[1]
            and r2[2] <= r1[2]
            and (r2[1] > r1[1] or r2[2] < r1[2])
            for r2 in rows
        )

    want = {k for k, _, _ in (r for r in rows if not dominated(r))}
    got = {
        r["o_orderkey"]
        for r in Q.QUERIES["skyline_orders"](spark, SF_DIR).collect()
    }
    assert got == want and got  # non-empty frontier


def test_skyline_keeps_incomparable_ties(spark):
    """Two rows with equal price AND equal date never dominate each other;
    a same-price later date IS dominated. Crafted 4-row frame."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, 100.0, "2000-01-02"),
            (2, 100.0, "2000-01-02"),  # tie of 1 — both stay
            (3, 100.0, "2000-01-05"),  # same price, later date — dominated
            (4, 90.0, "2000-01-01"),   # cheaper but earliest — stays
        ],
        "o_orderkey int, o_totalprice double, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/orders.parquet")
        got = {
            r["o_orderkey"]
            for r in Q.QUERIES["skyline_orders"](spark, td).collect()
        }
    assert got == {1, 2, 4}


def test_pivot_revenue_matches_bruteforce(spark):
    o = {
        r["o_orderkey"]: r
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    want: dict[tuple[str, int], Decimal] = {}
    for r in o.values():
        key = (seg[r["o_custkey"]], r["o_orderdate"].year)
        want[key] = want.get(key, Decimal(0)) + Decimal(str(r["o_totalprice"])).quantize(
            Decimal("0.01")
        )
    got = Q.QUERIES["pivot_revenue"](spark, SF_DIR).collect()
    assert {r["c_mktsegment"] for r in got} == set(seg.values())
    for r in got:
        for y in Q._PIVOT_YEARS:
            assert abs(
                r[f"y{y}"] - float(want.get((r["c_mktsegment"], y), Decimal(0)))
            ) < 1e-6


def test_decile_counts_balanced(spark):
    got = {r["decile"]: r for r in Q.QUERIES["decile_stats"](spark, SF_DIR).collect()}
    n = sum(r["n"] for r in got.values())
    assert sorted(got) == list(range(1, 11))
    # NTILE balance: sizes differ by at most 1
    sizes = [r["n"] for r in got.values()]
    assert max(sizes) - min(sizes) <= 1 and n == spark.read.parquet(
        f"{SF_DIR}/customer.parquet"
    ).count()
    # deciles are ordered, non-overlapping bands
    for d in range(1, 10):
        assert got[d]["hi"] <= got[d + 1]["lo"]


def test_mad_outliers_robust_to_extremes(spark):
    import tempfile

    from pyspark.sql import functions as F

    rows = [(i, f"2024-01-01 00:00:{i % 60:02d}", 1, "x", 10.0 + (i % 5) * 0.1, "")
            for i in range(100)]
    rows += [(1000, "2024-01-01 01:00:00", 1, "x", 9999.0, "")]  # the outlier
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/events.parquet")
        got = Q.QUERIES["event_mad_outliers"](spark, td).collect()
    assert [r["event_id"] for r in got] == [1000]
    assert got[0]["robust_z"] > 100  # MAD barely moves, z explodes


def test_minhash_estimator_accuracy(spark):
    rows = Q.QUERIES["minhash_est_check"](spark, "/root/testdata/sf0.001").collect()
    if not rows:
        return  # no >=0.5 pairs at this sf — nothing to certify
    import statistics

    errs = [r["abs_err"] for r in rows]
    # K=32 -> std err <= 0.5/sqrt(32) ~ 0.088; mean abs err should be well
    # inside 2x that even on few pairs
    assert statistics.mean(errs) < 0.18
    assert all(0.0 <= r["est_j"] <= 1.0 for r in rows)
