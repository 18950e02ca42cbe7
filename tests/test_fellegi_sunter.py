"""Fellegi–Sunter agreement levels, supervised m/u, EM, match weights."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import fellegi_sunter as FS

FEATURES = ["jw", "tok_jaccard", "lev_ratio"]


def _scored(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id_a long, doc_id_b long, jw double, tok_jaccard double, lev_ratio double"
    )


def test_agreement_levels_bins(spark):
    df = FS.agreement_levels(
        _scored(
            spark,
            [
                (1, 2, 0.96, 0.7, 0.8),   # all level 2
                (3, 4, 0.90, 0.4, 0.6),   # all level 1
                (5, 6, 0.20, 0.1, 0.1),   # all level 0
                (7, 8, 0.95, 0.6, 0.75),  # boundary -> level 2 (>=)
                (9, 10, 0.85, 0.3, 0.5),  # boundary -> level 1 (>=)
            ],
        )
    )
    got = {
        (r["doc_id_a"]): (r["jw_lvl"], r["tok_jaccard_lvl"], r["lev_ratio_lvl"])
        for r in df.collect()
    }
    assert got[1] == (2, 2, 2)
    assert got[3] == (1, 1, 1)
    assert got[5] == (0, 0, 0)
    assert got[7] == (2, 2, 2)
    assert got[9] == (1, 1, 1)


def test_estimate_mu_supervised_exact_counts(spark):
    # 4 labeled pairs: 2 matches (levels 2,2) on jw, 2 non-matches (0,1)
    levels = FS.agreement_levels(
        _scored(
            spark,
            [
                (1, 2, 0.99, 0.9, 0.9),
                (3, 4, 0.97, 0.9, 0.9),
                (5, 6, 0.10, 0.1, 0.1),
                (7, 8, 0.90, 0.1, 0.1),
            ],
        )
    )
    labels = spark.createDataFrame(
        [(1, 2, True), (3, 4, True), (5, 6, False), (7, 8, False)],
        "doc_id_a long, doc_id_b long, is_match boolean",
    )
    w = FS.estimate_mu_supervised(levels, labels, FEATURES)
    rows = {(r["feature"], r["level"]): r for r in w.collect()}
    assert len(rows) == 9  # densified grid: 3 features x 3 levels
    # jw matches: both level 2 -> m[2] = (2+1)/(2+3); non-matches at 0 and 1
    assert rows[("jw", 2)]["m_prob"] == 3 / 5
    assert rows[("jw", 0)]["m_prob"] == 1 / 5
    assert rows[("jw", 0)]["u_prob"] == 2 / 5
    assert rows[("jw", 1)]["u_prob"] == 2 / 5
    # weight = floor6(log2(m/u))
    exp = math.floor(math.log2((3 / 5) / (1 / 5)) * 1e6) / 1e6
    assert rows[("jw", 2)]["weight"] == exp


def test_match_weights_fixed_order_sum(spark):
    levels = FS.agreement_levels(_scored(spark, [(1, 2, 0.99, 0.9, 0.9)]))
    weights = spark.createDataFrame(
        [(f, lvl, 0.5, 0.25, float(i)) for i, (f, lvl) in enumerate(
            (f, lvl) for f in FEATURES for lvl in range(3)
        )],
        "feature string, level int, m_prob double, u_prob double, weight double",
    )
    out = FS.match_weights(levels, weights, FEATURES).collect()[0]
    # all three features at level 2 -> weights 2.0, 5.0, 8.0
    assert out["fs_weight"] == 15.0


def test_em_recovers_planted_mixture(spark):
    # plant a mixture, generate EXPECTED pattern counts, run EM
    lam = 0.2
    m = {"jw": [0.05, 0.15, 0.8], "tok_jaccard": [0.1, 0.2, 0.7], "lev_ratio": [0.1, 0.3, 0.6]}
    u = {"jw": [0.8, 0.15, 0.05], "tok_jaccard": [0.7, 0.2, 0.1], "lev_ratio": [0.6, 0.3, 0.1]}
    n_total = 100_000
    patterns = []
    for a in range(3):
        for b in range(3):
            for c in range(3):
                p = lam * m["jw"][a] * m["tok_jaccard"][b] * m["lev_ratio"][c] + (
                    1 - lam
                ) * u["jw"][a] * u["tok_jaccard"][b] * u["lev_ratio"][c]
                patterns.append((a, b, c, round(p * n_total)))
    est = FS.em_estimate_mu(patterns, FEATURES, n_iter=200)
    assert abs(est["lambda"] - lam) < 0.02
    for f in FEATURES:
        for lvl in range(3):
            assert abs(est["m"][f][lvl] - m[f][lvl]) < 0.05
            assert abs(est["u"][f][lvl] - u[f][lvl]) < 0.05
    # determinism: same inputs -> bit-identical output
    est2 = FS.em_estimate_mu(patterns, FEATURES, n_iter=200)
    assert est == est2


def test_em_weights_frame_feeds_match_weights(spark):
    est = {
        "lambda": 0.1,
        "m": {f: [0.1, 0.2, 0.7] for f in FEATURES},
        "u": {f: [0.7, 0.2, 0.1] for f in FEATURES},
    }
    wdf = FS.em_weights_frame(spark, est, FEATURES)
    assert wdf.count() == 9
    levels = FS.agreement_levels(_scored(spark, [(1, 2, 0.99, 0.9, 0.9)]))
    out = FS.match_weights(levels, wdf, FEATURES).collect()[0]
    per = math.floor(math.log2(0.7 / 0.1) * 1e6) / 1e6
    assert out["fs_weight"] == per + per + per


def test_pattern_counts_reduces(spark):
    levels = FS.agreement_levels(
        _scored(
            spark,
            [(1, 2, 0.99, 0.9, 0.9), (3, 4, 0.99, 0.9, 0.9), (5, 6, 0.1, 0.1, 0.1)],
        )
    )
    pats = {
        (r["jw_lvl"], r["tok_jaccard_lvl"], r["lev_ratio_lvl"]): r["n_pairs"]
        for r in FS.pattern_counts(levels, FEATURES).collect()
    }
    assert pats[(2, 2, 2)] == 2 and pats[(0, 0, 0)] == 1


def test_em_sql_twin_bit_exact():
    """The unrolled DuckDB EM (em_weights_sql_ctes) reproduces the
    Python EM bit-for-bit: same init literals, same left-to-right
    E-step products, same ordered left-fold M-step sums — including an
    absent (feature, level) cell (empty filtered fold -> 0.0) and the
    collect-order independence guaranteed by the canonical sort."""
    import math

    import duckdb

    pats = [
        (2, 2, 2, 40), (2, 1, 2, 7), (1, 1, 0, 55), (0, 0, 0, 900),
        (1, 0, 0, 120), (2, 0, 2, 3), (0, 1, 0, 60), (0, 2, 2, 2),
    ]  # no pattern has lev_ratio_lvl == 1 -> exercises the empty fold
    em = FS.em_estimate_mu(pats, FEATURES, n_iter=30)
    em_shuffled = FS.em_estimate_mu(list(reversed(pats)), FEATURES, n_iter=30)
    assert em == em_shuffled  # canonical sort: input order irrelevant
    rows_py = sorted(
        (f, lvl, em["m"][f][lvl], em["u"][f][lvl],
         math.floor(math.log2(em["m"][f][lvl] / em["u"][f][lvl]) * 1e6) / 1e6)
        for f in FEATURES
        for lvl in range(3)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE pat (jw_lvl INT, tok_jaccard_lvl INT, "
        "lev_ratio_lvl INT, n_pairs BIGINT)"
    )
    con.executemany("INSERT INTO pat VALUES (?,?,?,?)", pats)
    sql = (
        "WITH "
        + FS.em_weights_sql_ctes(FEATURES, n_iter=30)
        + " SELECT * FROM em_weights"
    )
    rows_sql = sorted(map(tuple, con.sql(sql).fetchall()))
    assert rows_py == rows_sql  # bit-exact, not approx


def test_tf_adjusted_weights(spark):
    """Rare-value agreement earns a higher adjustment than common-value
    agreement; exact value check against the closed form."""
    import math

    from sneaky_data_matcher_spark.operators.fellegi_sunter import (
        tf_adjusted_weights,
    )

    # field values: 'smith' x6, 'zwicky' x2, 'jones' x2 -> N=10
    vals = (
        [(i, "smith") for i in range(6)]
        + [(6, "zwicky"), (7, "zwicky"), (8, "jones"), (9, "jones")]
    )
    values = spark.createDataFrame(vals, "doc_id int, val string")
    pairs = spark.createDataFrame(
        [(0, 1, "smith"), (6, 7, "zwicky")],
        "doc_id_a int, doc_id_b int, val string",
    )
    out = {r.val: (r.n_v, r.tf_adj) for r in tf_adjusted_weights(pairs, values).collect()}
    sum_sq = 6 * 6 + 2 * 2 + 2 * 2  # 44
    exp_smith = math.floor(math.log2(44 / (10 * 6)) * 1e6) / 1e6
    exp_zwicky = math.floor(math.log2(44 / (10 * 2)) * 1e6) / 1e6
    assert out["smith"] == (6, exp_smith)
    assert out["zwicky"] == (2, exp_zwicky)
    assert out["zwicky"][1] > out["smith"][1]  # rare beats common
    assert out["smith"][1] < 0 < out["zwicky"][1]


def test_null_aware_levels_estimation_and_weights(spark):
    """Missing feature values get NULL_LEVEL (not 'disagree'), are
    excluded from m/u normalization, and score weight 0 — the pair is
    never dropped."""
    import math

    from sneaky_data_matcher_spark.operators.fellegi_sunter import (
        NULL_LEVEL,
        agreement_levels,
        estimate_mu_supervised,
        match_weights,
    )

    bins = {"sim": [(0.9, 1)]}  # 2 real levels: 0, 1
    rows = [
        # (a, b, sim, is_match)
        (1, 2, 0.95, True),
        (3, 4, 0.95, True),
        (5, 6, None, True),   # missing: must NOT count as disagree
        (7, 8, 0.10, False),
        (9, 10, 0.95, False),
        (11, 12, None, False),
    ]
    scored = spark.createDataFrame(
        [(a, b, s) for a, b, s, _ in rows],
        "doc_id_a int, doc_id_b int, sim double",
    )
    labels = spark.createDataFrame(
        [(a, b, m) for a, b, _, m in rows],
        "doc_id_a int, doc_id_b int, is_match boolean",
    )
    levels = agreement_levels(scored, bins, null_level=NULL_LEVEL)
    got_lvls = {r["doc_id_a"]: r["sim_lvl"] for r in levels.collect()}
    assert got_lvls[5] == NULL_LEVEL and got_lvls[11] == NULL_LEVEL
    assert got_lvls[1] == 1 and got_lvls[7] == 0

    mu = estimate_mu_supervised(
        levels, labels, ["sim"], n_levels=2, exclude_level=NULL_LEVEL
    )
    by_lvl = {r["level"]: r for r in mu.collect()}
    # observed matches: 2 (both level 1); observed non-matches: 2 (one each)
    assert by_lvl[1]["m_prob"] == pytest.approx((2 + 1) / (2 + 2))
    assert by_lvl[1]["u_prob"] == pytest.approx((1 + 1) / (2 + 2))
    assert by_lvl[0]["m_prob"] == pytest.approx((0 + 1) / (2 + 2))

    w = match_weights(levels, mu, ["sim"])
    got_w = {r["doc_id_a"]: r["fs_weight"] for r in w.collect()}
    assert set(got_w) == {1, 3, 5, 7, 9, 11}  # null pairs NOT dropped
    assert got_w[5] == 0.0 and got_w[11] == 0.0  # null evidence = 0
    exp_l1 = math.floor(math.log2((3 / 4) / (2 / 4)) * 1e6) / 1e6
    assert got_w[1] == pytest.approx(exp_l1)
