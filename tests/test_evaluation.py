"""Pairwise confusion metrics, cluster-size stats, blocking census."""

from __future__ import annotations

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import evaluation as E


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_id_a long, doc_id_b long")


def test_pairwise_confusion_counts(spark):
    pred = _pairs(spark, [(1, 2), (3, 4), (5, 6), (7, 8)])
    truth = _pairs(spark, [(1, 2), (4, 3), (9, 10)])  # (4,3) flipped on purpose
    r = E.pairwise_confusion(pred, truth).collect()[0]
    assert (r["tp"], r["fp"], r["fn"]) == (2, 2, 1)
    assert r["precision"] == 0.5
    assert r["recall"] == round(2 / 3, 6)
    assert r["f1"] == round(4 / 7, 6)


def test_pairwise_confusion_dedups_and_orients(spark):
    # duplicate + mirrored edges collapse before counting
    pred = _pairs(spark, [(2, 1), (1, 2), (1, 2)])
    truth = _pairs(spark, [(1, 2)])
    r = E.pairwise_confusion(pred, truth).collect()[0]
    assert (r["tp"], r["fp"], r["fn"]) == (1, 0, 0)
    assert r["f1"] == 1.0


def test_pairwise_confusion_empty_pred(spark):
    pred = _pairs(spark, []).where(F.lit(False))
    truth = _pairs(spark, [(1, 2)])
    r = E.pairwise_confusion(pred, truth).collect()[0]
    assert (r["tp"], r["fp"], r["fn"]) == (0, 0, 1)
    assert (r["precision"], r["recall"], r["f1"]) == (0.0, 0.0, 0.0)


def test_cluster_size_stats(spark):
    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 30)],
        "doc_id long, cluster_id long",
    )
    rows = {r["cluster_size"]: r for r in E.cluster_size_stats(clusters).collect()}
    assert rows[3]["n_clusters"] == 1 and rows[3]["n_docs"] == 3
    assert rows[2]["n_clusters"] == 1 and rows[2]["n_docs"] == 2
    assert rows[1]["n_clusters"] == 1 and rows[1]["n_docs"] == 1
    assert sum(r["n_docs"] for r in rows.values()) == 6


def test_blocking_census(spark):
    keys = spark.createDataFrame(
        [(i, "pfx", "hot") for i in range(5)]
        + [(1, "pfx", "cold"), (2, "pfx", "cold")]
        + [(1, "srt", "x"), (2, "srt", "y")],
        "doc_id long, pass string, block_key string",
    )
    rows = {r["pass"]: r for r in E.blocking_census(keys, max_block_size=3).collect()}
    pfx = rows["pfx"]
    assert pfx["n_blocks"] == 2 and pfx["n_keys"] == 7
    assert pfx["max_block"] == 5
    assert pfx["pair_mass"] == 10 + 1
    assert pfx["hot_blocks"] == 1 and pfx["hot_pair_mass"] == 10
    srt = rows["srt"]
    assert srt["n_blocks"] == 2 and srt["pair_mass"] == 0
    assert srt["hot_blocks"] == 0 and srt["hot_pair_mass"] == 0


def test_threshold_sweep_hand_computed(spark):
    # scored candidates: (pair, score); truth = {(1,2),(3,4),(9,10)} where
    # (9,10) was never surfaced by blocking -> fn at every threshold.
    scored = spark.createDataFrame(
        [
            (1, 2, 0.95),   # pos
            (3, 4, 0.80),   # pos
            (5, 6, 0.80),   # neg
            (7, 8, 0.40),   # neg
        ],
        "doc_id_a long, doc_id_b long, score double",
    )
    truth = spark.createDataFrame(
        [(1, 2), (4, 3), (9, 10)], "doc_id_a long, doc_id_b long"
    )
    rows = {
        r["threshold_pct"]: r.asDict()
        for r in E.threshold_sweep(scored, truth).collect()
    }
    assert set(rows) == {95, 80, 40}
    # t=0.95: pred={(1,2)} -> tp=1 fp=0 fn=2
    assert (rows[95]["tp"], rows[95]["fp"], rows[95]["fn"]) == (1, 0, 2)
    assert rows[95]["precision"] == 1.0
    assert rows[95]["recall"] == round(1 / 3, 6)
    # t=0.80: pred adds (3,4)+(5,6) -> tp=2 fp=1 fn=1
    assert (rows[80]["n_pred"], rows[80]["tp"], rows[80]["fp"], rows[80]["fn"]) == (
        3,
        2,
        1,
        1,
    )
    assert rows[80]["f1"] == round(4 / 6, 6)
    # t=0.40: everything predicted -> tp=2 fp=2 fn=1
    assert (rows[40]["tp"], rows[40]["fp"], rows[40]["fn"]) == (2, 2, 1)


def test_threshold_sweep_orientation_and_quantization(spark):
    # mirrored scored pair matches flipped truth; scores quantize by floor
    scored = spark.createDataFrame(
        [(2, 1, 0.8349), (3, 4, 0.8351)],
        "doc_id_a long, doc_id_b long, score double",
    )
    truth = spark.createDataFrame([(1, 2)], "doc_id_a long, doc_id_b long")
    rows = {
        r["threshold_pct"]: r.asDict()
        for r in E.threshold_sweep(scored, truth).collect()
    }
    assert set(rows) == {83}
    assert (rows[83]["tp"], rows[83]["fp"], rows[83]["fn"]) == (1, 1, 0)


def test_threshold_valley_bimodal(spark):
    """A planted bimodal score set: modes at 0.2 and 0.9, valley in the
    empty middle — the suggested threshold lands between the modes, at
    the FIRST emptiest bin (ties toward lower)."""
    from sneaky_data_matcher_spark.operators.evaluation import (
        threshold_valley,
        threshold_valley_sql,
    )

    scores = (
        [0.18 + 0.001 * i for i in range(40)]   # non-match mode ~0.2
        + [0.88 + 0.001 * i for i in range(30)]  # match mode ~0.9
        + [0.55, 0.56]                           # sparse middle
    )
    df = spark.createDataFrame([(s,) for s in scores], "score double")
    r = threshold_valley(df).collect()[0]
    assert r.mode_lo_bin < r.valley_bin < r.mode_hi_bin
    # the first emptiest bin after the non-match mass, before the match mass
    assert 0.2 < r.suggested_threshold <= 0.88
    assert r.valley_count == 0
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE sc(score DOUBLE)")
    con.executemany("INSERT INTO sc VALUES (?)", [(s,) for s in scores])
    exp = con.execute(threshold_valley_sql("sc")).fetchone()
    assert tuple(r) == tuple(exp)


def test_blocking_quality_metrics(spark):
    """Hand-computable blocking scheme over 6 records: pass p1 blocks
    {1,2,3} + {4,5}, pass p2 blocks {1,4}. Truth = {(1,2), (4,5), (2,6)}."""
    from sneaky_data_matcher_spark.operators.evaluation import blocking_quality

    keys = spark.createDataFrame(
        [
            (1, "p1", "a"), (2, "p1", "a"), (3, "p1", "a"),
            (4, "p1", "b"), (5, "p1", "b"),
            (1, "p2", "x"), (4, "p2", "x"),
        ],
        "doc_id long, pass string, block_key string",
    )
    truth = spark.createDataFrame(
        [(1, 2), (4, 5), (2, 6)], "doc_id_a long, doc_id_b long"
    )
    out = {r["pass"]: r.asDict() for r in blocking_quality(keys, truth, 6).collect()}
    # p1: pairs {12,13,23,45} -> hits {12,45}; C(6,2)=15
    assert out["p1"]["n_candidates"] == 4 and out["p1"]["n_truth_hits"] == 2
    assert abs(out["p1"]["reduction_ratio"] - (1 - 4 / 15)) < 1e-6
    assert abs(out["p1"]["pairs_completeness"] - 2 / 3) < 1e-6
    assert abs(out["p1"]["pairs_quality"] - 0.5) < 1e-6
    # p2: one pair (1,4), no truth hit
    assert out["p2"]["n_candidates"] == 1 and out["p2"]["n_truth_hits"] == 0
    assert out["p2"]["pairs_quality"] == 0.0
    # union: {12,13,23,45,14} -> 5 candidates, 2 hits; (2,6) unreachable
    assert out["all"]["n_candidates"] == 5 and out["all"]["n_truth_hits"] == 2
    assert abs(out["all"]["pairs_completeness"] - 2 / 3) < 1e-6


def test_sampled_precision_bands_and_wilson(spark):
    from sneaky_data_matcher_spark.operators.evaluation import (
        WILSON_Z,
        sampled_precision,
    )

    # 120 matched pairs in band 80 (scores 0.80-0.849), 30 in band 95;
    # truth marks every pair whose doc_id_a is even
    rows = [(2 * i, 2 * i + 1, 0.81) for i in range(120)] + [
        (10_000 + 2 * i + 1, 10_000 + 2 * i + 2, 0.96) for i in range(30)
    ]
    m = spark.createDataFrame(rows, "doc_id_a long, doc_id_b long, score double")
    truth = spark.createDataFrame(
        [(a, b) for a, b, _ in rows if a % 2 == 0],
        "doc_id_a long, doc_id_b long",
    )
    out = {r["band_pct"]: r.asDict() for r in sampled_precision(m, truth, k_per_band=40).collect()}
    assert set(out) == {80, 95}
    assert out[80]["n_pairs"] == 120 and out[80]["n_sampled"] == 40
    assert out[95]["n_pairs"] == 30 and out[95]["n_sampled"] == 30
    # band 80 is all-even doc_id_a -> all true; band 95 all-odd -> none
    assert out[80]["n_true_sampled"] == 40 and out[80]["p_hat"] == 1.0
    assert out[95]["n_true_sampled"] == 0 and out[95]["p_hat"] == 0.0
    # Wilson interval: inside [0,1], contains p_hat, shrinks with n
    for b in (80, 95):
        r = out[b]
        assert 0.0 <= r["wilson_lo"] <= r["p_hat"] <= r["wilson_hi"] <= 1.0
    # closed-form check for the all-true band (p=1): lo = n/(n+z^2)... via
    # the standard formula computed directly
    import math

    n, z = 40.0, WILSON_Z
    denom = 1 + z * z / n
    center = (1.0 + z * z / (2 * n)) / denom
    half = z * math.sqrt(0.0 + z * z / (4 * n * n)) / denom
    assert abs(out[80]["wilson_lo"] - round(center - half, 6)) < 1e-9
    # determinism: rerun equals
    again = {r["band_pct"]: r.asDict() for r in sampled_precision(m, truth, k_per_band=40).collect()}
    assert again == out


def test_capture_recapture_chapman(spark):
    from sneaky_data_matcher_spark.operators.evaluation import (
        capture_recapture_recall,
    )

    # pass A finds pairs 1-4; pass B finds pairs 3-6: n_a=4, n_b=4,
    # n_both=2, union=6; Chapman: 5*5/3 - 1 = 7.333...
    rows = [("A", i, i + 100) for i in range(1, 5)] + [
        ("B", i, i + 100) for i in range(3, 7)
    ]
    t = spark.createDataFrame(rows, "pass string, doc_id_a long, doc_id_b long")
    r = capture_recapture_recall(t, "A", "B").collect()[0]
    assert (r["n_a"], r["n_b"], r["n_both"], r["n_union"]) == (4, 4, 2, 6)
    est = 5.0 * 5.0 / 3.0 - 1.0
    assert abs(r["est_total_matches"] - round(est, 6)) < 1e-9
    assert abs(r["est_missed"] - round(est - 6.0, 6)) < 1e-9
    assert abs(r["est_completeness"] - round(6.0 / est, 6)) < 1e-9
    # perfect overlap -> estimate equals the union, nothing missed
    both = spark.createDataFrame(
        [(p, i, i + 100) for p in ("A", "B") for i in range(1, 5)],
        "pass string, doc_id_a long, doc_id_b long",
    )
    r2 = capture_recapture_recall(both, "A", "B").collect()[0]
    assert r2["n_both"] == 4 and r2["est_missed"] == 0.0
    assert r2["est_completeness"] == 1.0
