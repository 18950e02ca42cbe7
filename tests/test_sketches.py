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


def test_hll_reasonable_and_merge(spark):
    import math

    texts = [" ".join(f"w{i}" for i in range(j * 50, j * 50 + 50)) for j in range(8)]
    # 400 distinct tokens
    regs = SK.hll_registers(_docs(spark, texts))
    est = SK.hll_estimate(regs).collect()[0]["est"]
    assert abs(est - 400) / 400 < 0.35  # m=64 -> ~13% rse; 35% is safe
    # registers merge by cell-wise max
    r1 = SK.hll_registers(_docs(spark, texts[:4]))
    r2 = SK.hll_registers(_docs(spark, texts[4:]))
    from pyspark.sql import functions as FF

    merged = (
        r1.unionByName(r2).groupBy("bucket").agg(FF.max("reg").alias("reg"))
    )
    key = lambda df: sorted((r["bucket"], r["reg"]) for r in df.collect())
    assert key(merged) == key(regs)


def test_hll_small_range_linear_counting(spark):
    est = SK.hll_estimate(SK.hll_registers(_docs(spark, ["a b c"]))).collect()[0]
    assert 2.5 <= est["est"] <= 3.5  # linear counting is near-exact here


def test_hll_merge_equals_union_registers(spark):
    """Merged registers must be IDENTICAL to registers built on the union
    — HLL's defining property, not an approximation."""
    from sneaky_data_matcher_spark.operators import sketches as SK

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    by = SK.hll_registers_by(d, "lang")
    merged = {
        (r["bucket"]): r["reg"]
        for r in SK.hll_merge(by, ["zh", "es"]).collect()
    }
    union = {
        (r["bucket"]): r["reg"]
        for r in SK.hll_registers(
            d.where(F.col("lang").isin(["zh", "es"]))
        ).collect()
    }
    assert merged == union


def test_cms_join_estimate_upper_bounds_truth(spark):
    """Sketch inner product only ever overestimates (collisions add)."""
    from sneaky_data_matcher_spark.operators import sketches as SK

    a = spark.createDataFrame([(i % 7,) for i in range(100)], "k long")
    b = spark.createDataFrame([(i % 5,) for i in range(40)], "k long")
    est = SK.cms_join_estimate(
        SK.cms_build_keys(a, "k"), SK.cms_build_keys(b, "k")
    ).first()["est"]
    true_n = a.join(b, "k").count()
    assert est >= true_n
    # with only 7 and 5 distinct keys in 1024 columns, collisions are
    # essentially impossible: the estimate should be exact here
    assert est == true_n
