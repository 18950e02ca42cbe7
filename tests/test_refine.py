"""Cluster refinement: crafted over-merged graphs, pass-through of small
clusters, label invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators.clustering import (
    connected_components,
    refine_clusters,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "doc_id_a long, doc_id_b long, s double")


def _assign(spark, pairs, all_ids):
    comp = connected_components(pairs.select("doc_id_a", "doc_id_b"))
    ids = spark.createDataFrame([(i,) for i in all_ids], "doc_id long")
    return ids.join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )


def test_chain_split_at_weak_edge(spark):
    # 1-2-3 strong, 3-4 weak, 4-5 strong => one size-5 cluster; refinement
    # with max_size=3 cuts at the weak edge -> {1,2,3} and {4,5}
    scored = _scored(
        spark,
        [(1, 2, 0.95), (2, 3, 0.95), (3, 4, 0.81), (4, 5, 0.95), (7, 8, 0.81)],
    )
    assign = _assign(spark, scored.where(F.col("s") >= 0.8), [1, 2, 3, 4, 5, 7, 8])
    out = refine_clusters(assign, scored, F.col("s"), 3, 0.9)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    # the weak pair {7,8} is size 2 -> untouched even though its edge < 0.9
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 7: 7, 8: 7}


def test_full_shatter_when_no_strong_edges(spark):
    scored = _scored(spark, [(1, 2, 0.82), (2, 3, 0.82), (3, 4, 0.82)])
    assign = _assign(spark, scored, [1, 2, 3, 4])
    out = refine_clusters(assign, scored, F.col("s"), 3, 0.9)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 3, 4: 4}


def test_no_big_clusters_is_identity(spark):
    scored = _scored(spark, [(1, 2, 0.81), (3, 4, 0.99)])
    assign = _assign(spark, scored, [1, 2, 3, 4, 9])
    out = refine_clusters(assign, scored, F.col("s"), 3, 0.9)
    base = {r["doc_id"]: r["cluster_id"] for r in assign.collect()}
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == base
    assert got[9] == 9  # singleton preserved


def test_row_count_and_label_invariants(spark):
    # every doc exactly once; every label is a member of its own cluster
    scored = _scored(
        spark,
        [(i, i + 1, 0.81 if i % 3 == 0 else 0.95) for i in range(1, 12)],
    )
    assign = _assign(spark, scored, list(range(1, 13)))
    out = refine_clusters(assign, scored, F.col("s"), 2, 0.9)
    rows = out.collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(1, 13))
    members = {}
    for r in rows:
        members.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    for label, mem in members.items():
        assert label == min(mem)
