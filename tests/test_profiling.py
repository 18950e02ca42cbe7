"""Column profiling: exact metrics on a crafted table; the approx path
must agree on everything except n_distinct (HLL estimate)."""

from __future__ import annotations

from sneaky_data_matcher_spark.operators import profiling


def _rows(df):
    return {r["column"]: r.asDict() for r in df.collect()}


def test_profile_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "aa", 1.5),
            (2, "bbb", None),
            (3, None, 2.5),
            (3, "aa", 2.5),
        ],
        "k long, s string, v double",
    )
    p = _rows(profiling.profile(df))
    assert p["k"]["n_rows"] == 4
    assert p["k"]["n_null"] == 0
    assert p["k"]["n_distinct"] == 3
    assert p["k"]["min_num"] == 1.0 and p["k"]["max_num"] == 3.0
    assert p["k"]["avg_len"] is None
    assert p["s"]["n_null"] == 1
    assert p["s"]["n_distinct"] == 2
    assert p["s"]["min_num"] is None
    assert p["s"]["avg_len"] == round((2 + 3 + 2) / 3, 6)
    assert p["v"]["n_null"] == 1
    assert p["v"]["min_num"] == 1.5 and p["v"]["max_num"] == 2.5


def test_profile_approx_one_scan(spark):
    df = spark.range(1000).selectExpr("id AS k", "CAST(id % 7 AS STRING) AS s")
    exact = _rows(profiling.profile(df))
    approx = _rows(profiling.profile(df, approx=True))
    for c in ("k", "s"):
        assert approx[c]["n_rows"] == exact[c]["n_rows"]
        assert approx[c]["n_null"] == exact[c]["n_null"]
        # HLL++ default rsd is 5%
        assert abs(approx[c]["n_distinct"] - exact[c]["n_distinct"]) <= max(
            2, 0.1 * exact[c]["n_distinct"]
        )
    # approx plan must not contain the Expand operator the exact
    # multi-column countDistinct needs
    plan = profiling.profile(df, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
