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
