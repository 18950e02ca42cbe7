"""Count-min sketch: overestimate guarantee, exactness at low load,
mergeability, unseen tokens."""

from __future__ import annotations

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import sketches as SK


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _probe(spark, toks):
    return spark.createDataFrame([(t,) for t in toks], "token string")


def test_estimate_never_underestimates(spark):
    texts = ["a b c a", "a d e", "b b f"]
    true = {"a": 3, "b": 3, "c": 1, "d": 1, "e": 1, "f": 1, "zzz": 0}
    sk = SK.count_min_build(_docs(spark, texts))
    est = {
        r["token"]: r["est"]
        for r in SK.count_min_estimate(sk, _probe(spark, list(true))).collect()
    }
    for t, n in true.items():
        assert est[t] >= n, t


def test_exact_at_low_load(spark):
    # 6 distinct tokens across 4096 cells: collisions in ALL 4 rows are
    # essentially impossible -> estimates are exact
    texts = ["alpha beta gamma", "alpha delta", "epsilon zeta alpha"]
    sk = SK.count_min_build(_docs(spark, texts))
    est = {
        r["token"]: r["est"]
        for r in SK.count_min_estimate(
            sk, _probe(spark, ["alpha", "beta", "zeta", "missing"])
        ).collect()
    }
    assert est == {"alpha": 3, "beta": 1, "zeta": 1, "missing": 0}


def test_sketches_merge_cellwise(spark):
    a, b = ["x y z x"], ["x w"]
    sk_both = SK.count_min_build(_docs(spark, a + b))
    merged = (
        SK.count_min_build(_docs(spark, a))
        .unionByName(SK.count_min_build(_docs(spark, b)))
        .groupBy("r", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    key = lambda df: sorted((r["r"], r["col"], r["cnt"]) for r in df.collect())
    assert key(merged) == key(sk_both)


def test_sketch_size_bounded(spark):
    texts = [f"tok{i} tok{i + 1} filler" for i in range(200)]
    sk = SK.count_min_build(_docs(spark, texts))
    assert sk.count() <= SK.CMS_D * SK.CMS_W
