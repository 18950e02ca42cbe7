"""Isotonic score calibration: agreement with a reference PAV
implementation, monotonicity, and Brier improvement on miscalibrated
scores."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import calibration as C


def _pav(y: list[float], w: list[int]) -> list[float]:
    """Reference pool-adjacent-violators: weighted least-squares
    non-decreasing fit."""
    blocks = [[yi * wi, wi] for yi, wi in zip(y, w)]  # [sum, weight]
    out: list[list[float]] = []
    for b in blocks:
        out.append(b)
        while len(out) >= 2 and out[-2][0] / out[-2][1] > out[-1][0] / out[-1][1]:
            s, n = out.pop()
            out[-1][0] += s
            out[-1][1] += n
    # expand pooled blocks back to one value per input bin
    fit: list[float] = []
    i = 0
    for s, n in out:
        acc = 0
        while acc < n - 1e-9:
            acc += w[i]
            fit.append(s / n)
            i += 1
    return fit


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "score double, is_match int")


def test_matches_reference_pav(spark):
    # bins 0..4 with precisions 0.0, 0.6, 0.3, 0.3, 1.0 and uneven counts:
    # the 0.6/0.3/0.3 violation pools to 0.4 (weighted)
    rows = []
    spec = [  # (bin score anchor, n, n_pos)
        (0.05, 10, 0),
        (0.25, 10, 6),
        (0.45, 10, 3),
        (0.65, 10, 3),
        (0.85, 10, 10),
    ]
    for s, n, p in spec:
        rows += [(s, 1)] * p + [(s, 0)] * (n - p)
    got = {
        r["bin"]: (r["precision"], r["iso_precision"])
        for r in C.isotonic_calibration(_pairs(spark, rows), n_bins=5).collect()
    }
    y = [p / n for _, n, p in spec]
    w = [n for _, n, _ in spec]
    want = _pav(y, w)
    assert sorted(got) == [0, 1, 2, 3, 4]
    for i in range(5):
        assert got[i][0] == pytest.approx(y[i], abs=1e-6)
        assert got[i][1] == pytest.approx(want[i], abs=1e-6)
    # pooled block: bins 1-3 all fit to weighted mean 12/30 = 0.4
    assert got[1][1] == got[2][1] == got[3][1] == pytest.approx(0.4, abs=1e-6)


def test_fit_is_nondecreasing_and_mean_preserving(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(200):
        s = rng.random()
        rows.append((s, 1 if rng.random() < (0.2 + 0.5 * s) else 0))
    out = C.isotonic_calibration(_pairs(spark, rows), n_bins=10).collect()
    by_bin = sorted(out, key=lambda r: r["bin"])
    fits = [r["iso_precision"] for r in by_bin]
    assert fits == sorted(fits)
    # weighted mean of fit == overall positive rate (isotonic preserves it)
    n = sum(r["n"] for r in by_bin)
    pos = sum(r["n_pos"] for r in by_bin)
    wm = sum(r["iso_precision"] * r["n"] for r in by_bin) / n
    assert wm == pytest.approx(pos / n, abs=1e-4)


def test_brier_improves_on_miscalibrated_scores(spark):
    """Scores systematically too high (score = sqrt(p)): the isotonic map
    must produce a lower Brier score than the raw scores."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(500):
        p = rng.random()
        rows.append((p ** 0.5, 1 if rng.random() < p else 0))
    pairs = _pairs(spark, rows)
    cal = C.isotonic_calibration(pairs, n_bins=10)
    b = C.brier_scores(pairs, cal, n_bins=10).collect()[0]
    assert b["n_pairs"] == 500
    assert b["brier_iso"] < b["brier_raw"]


def test_duckdb_twin_matches(spark):
    import duckdb

    rows = []
    spec = [(0.05, 7, 1), (0.32, 9, 6), (0.48, 5, 2), (0.91, 6, 6)]
    for s, n, p in spec:
        rows += [(s, 1)] * p + [(s, 0)] * (n - p)
    got = {
        r["bin"]: (r["n"], r["n_pos"], r["precision"], r["iso_precision"])
        for r in C.isotonic_calibration(_pairs(spark, rows), n_bins=20).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE pairs AS SELECT * FROM (VALUES "
        + ", ".join(f"({s!r}, {m})" for s, m in rows)
        + ") t(score, is_match)"
    )
    want = {
        int(r["bin"]): (
            int(r["n"]),
            int(r["n_pos"]),
            float(r["precision"]),
            float(r["iso_precision"]),
        )
        for _, r in con.sql(
            f"WITH {C.calibration_sql_ctes('pairs')} SELECT * FROM cal_out"
        ).df().iterrows()
    }
    assert got == want
