from __future__ import annotations

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import entity_ids as E
from sneaky_data_matcher_spark.operators.sampling import cluster_split


def _prev(spark):
    # entities: 10 -> {1,2,3}; 20 -> {4,5}; 30 -> {6,7}; 40 -> {8};
    # 50 -> {9} (dissolves: doc 9 absent from cur)
    rows = [
        (1, 10), (2, 10), (3, 10),
        (4, 20), (5, 20),
        (6, 30), (7, 30),
        (8, 40),
        (9, 50),
    ]
    return spark.createDataFrame(rows, "doc_id long, entity_id long")


def _cur(spark):
    # 100 = {1,2,3}        -> stable continuation of 10
    # 200 = {4,5,6,7}      -> merged (20 + 30)
    # 300 = {8, 11}        -> grown (all of 40 + new doc)
    # 400 = {12, 13}       -> new
    # doc 9 dropped        -> entity 50 dissolves
    rows = [
        (1, 100), (2, 100), (3, 100),
        (4, 200), (5, 200), (6, 200), (7, 200),
        (8, 300), (11, 300),
        (12, 400), (13, 400),
    ]
    return spark.createDataFrame(rows, "doc_id long, cluster_id long")


def test_persistent_ids_mutual_best(spark):
    out = E.persistent_entity_ids(_prev(spark), _cur(spark))
    got = {r["cluster_id"]: (r["entity_id"], r["id_source"]) for r in out.collect()}
    assert got[100] == (10, "inherited")
    # merged cluster inherits the larger-overlap entity; tie -> min id.
    # 20 and 30 both overlap 200 by 2 -> entity 20 wins the tie
    assert got[200] == (20, "inherited")
    assert got[300] == (40, "inherited")
    assert got[400] == (400, "minted")
    # every doc present, uniqueness of assigned ids across clusters
    assert out.count() == 11
    ids = out.select("cluster_id", "entity_id").distinct()
    assert ids.count() == ids.select("entity_id").distinct().count()


def test_persistent_ids_split_keeps_id_on_best_half(spark):
    prev = _prev(spark)
    # entity 10 splits: {1,2} vs {3}; bigger fragment keeps id 10
    cur = prev.sparkSession.createDataFrame(
        [(1, 100), (2, 100), (3, 333)], "doc_id long, cluster_id long"
    )
    out = E.persistent_entity_ids(prev, cur)
    got = {r["cluster_id"]: (r["entity_id"], r["id_source"]) for r in out.collect()}
    assert got[100] == (10, "inherited")
    assert got[333] == (333, "minted")


def test_cluster_churn_statuses(spark):
    rep = E.cluster_churn(_prev(spark), _cur(spark))
    got = {r["cluster_id"]: r.asDict() for r in rep.collect()}
    assert got[100]["status"] == "stable"
    assert got[200]["status"] == "merged"
    assert got[200]["n_prev_entities"] == 2
    assert got[300]["status"] == "grown"
    assert got[300]["n_new_docs"] == 1
    assert got[400]["status"] == "new"
    assert got[400]["n_prev_entities"] == 0


def test_cluster_churn_split_shrunk_changed(spark):
    prev = _prev(spark)
    # 10 -> {1,2} + {3}: split on both sides; 20 -> {4} only (5 dropped):
    # shrunk; 30 -> {6, 14}: 7 dropped AND 14 added: changed
    cur = prev.sparkSession.createDataFrame(
        [(1, 100), (2, 100), (3, 333), (4, 20), (6, 600), (14, 600)],
        "doc_id long, cluster_id long",
    )
    got = {r["cluster_id"]: r["status"] for r in E.cluster_churn(prev, cur).collect()}
    assert got[100] == "split"
    assert got[333] == "split"
    assert got[20] == "shrunk"
    assert got[600] == "changed"


def test_dissolved_entities_countable(spark):
    prev, cur = _prev(spark), _cur(spark)
    surviving = E.cluster_overlap(prev, cur).select("entity_id").distinct().count()
    total = prev.select("entity_id").distinct().count()
    assert total - surviving == 1  # entity 50


def test_cluster_split_is_leakproof_and_deterministic(spark):
    assign = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 500).alias("cluster_id")
    )
    out = cluster_split(assign)
    # every cluster maps to exactly one split
    per = out.groupBy("cluster_id").agg(F.countDistinct("split").alias("n"))
    assert per.where(F.col("n") != 1).count() == 0
    # rerun-stable
    a = sorted(out.collect())
    b = sorted(cluster_split(assign).collect())
    assert a == b
    # proportions roughly honor the weights (clusters are the unit)
    shares = {
        r["split"]: r["n"]
        for r in out.select("cluster_id", "split")
        .distinct()
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert shares["train"] > shares["val"] and shares["train"] > shares["test"]
    assert set(shares) == {"train", "val", "test"}
    # custom weights + ordering respected
    two = cluster_split(assign, splits=[("a", 0.5), ("b", 0.5)])
    assert set(r["split"] for r in two.select("split").distinct().collect()) == {
        "a",
        "b",
    }


def test_forget_bridge_splits_cluster(spark):
    """Removing a bridge doc must SPLIT its cluster in the churn report —
    the cascade a naive row-delete audit misses."""
    from sneaky_data_matcher_spark.operators.clustering import (
        connected_components,
    )

    # path 1-2-3: doc 2 is the bridge; separate pair 10-11 untouched
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_id_a long, doc_id_b long"
    )
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11)], "doc_id long"
    )
    def assign(e, ids, col):
        comp = connected_components(e)
        return (
            ids.join(comp, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("cluster_id", F.col("doc_id")).alias(col),
            )
        )

    prev = assign(edges, docs, "entity_id")
    forget = {2}
    kept_edges = edges.where(
        ~F.col("doc_id_a").isin(forget) & ~F.col("doc_id_b").isin(forget)
    )
    kept_docs = docs.where(~F.col("doc_id").isin(forget))
    cur = assign(kept_edges, kept_docs, "cluster_id")
    rep = {r["cluster_id"]: r["status"] for r in E.cluster_churn(prev, cur).collect()}
    # 1 and 3 are now singletons of the same former entity -> both split
    assert rep[1] == "split" and rep[3] == "split"
    assert rep[10] == "stable"
    assert set(rep.values()) <= {"stable", "shrunk", "split"}


def test_entity_timeline_islands(spark):
    r1 = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "doc_id long, entity_id long")
    r2 = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, entity_id long")
    r3 = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 30)], "doc_id long, entity_id long"
    )
    out = E.entity_timeline([(1, r1), (2, r2), (3, r3)])
    rows = {(r["doc_id"], r["run_from"]): (r["entity_id"], r["run_to"]) for r in out.collect()}
    # doc 1: same entity all three runs -> one open span
    assert rows[(1, 1)] == (10, None) and len([k for k in rows if k[0] == 1]) == 1
    # doc 2: entity changes at run 3 -> closed span (1..2) + open (3..)
    assert rows[(2, 1)] == (20, 2)
    assert rows[(2, 3)] == (99, None)
    # doc 3: absent in run 2 -> closed span (1..1) + open (3..)
    assert rows[(3, 1)] == (30, 1)
    assert rows[(3, 3)] == (30, None)


def test_entity_timeline_rejects_gappy_runs(spark):
    r = spark.createDataFrame([(1, 10)], "doc_id long, entity_id long")
    import pytest

    with pytest.raises(ValueError):
        E.entity_timeline([(1, r), (3, r)])


# --- property tests (pure-Python reference vs the Spark operator) -----------

from hypothesis import given, settings
from hypothesis import strategies as st


def _ref_persistent(prev_rows, cur_rows):
    """Brute-force reference of the mutual-best inheritance."""
    from collections import Counter

    cur_by_doc = dict(cur_rows)
    ov = Counter(
        (e, cur_by_doc[d]) for d, e in prev_rows if d in cur_by_doc
    )
    # entity nominates its best cluster
    nom = {}
    for (e, c), n in ov.items():
        best = nom.get(e)
        if best is None or n > best[1] or (n == best[1] and c < best[0]):
            nom[e] = (c, n)
    # cluster accepts its best nominator
    inh = {}
    for e, (c, n) in nom.items():
        best = inh.get(c)
        if best is None or n > best[1] or (n == best[1] and e < best[0]):
            inh[c] = (e, n)
    return {
        d: (inh[c][0] if c in inh else c, "inherited" if c in inh else "minted")
        for d, c in cur_rows
    }


@settings(max_examples=12, deadline=None)
@given(st.data())
def test_persistent_ids_property(spark, data):
    n_docs = data.draw(st.integers(4, 30))
    prev_rows = [
        (d, data.draw(st.integers(100, 106), label=f"pe{d}"))
        for d in range(n_docs)
        if data.draw(st.booleans(), label=f"pin{d}")
    ]
    cur_rows = [
        (d, data.draw(st.integers(200, 206), label=f"cc{d}"))
        for d in range(n_docs + 4)
        if data.draw(st.booleans(), label=f"cin{d}")
    ]
    if not cur_rows:
        return
    prev = spark.createDataFrame(
        prev_rows or [(-1, -1)], "doc_id long, entity_id long"
    )
    cur = spark.createDataFrame(cur_rows, "doc_id long, cluster_id long")
    out = E.persistent_entity_ids(prev, cur).collect()
    ref = _ref_persistent(prev_rows, cur_rows)
    got = {r["doc_id"]: (r["entity_id"], r["id_source"]) for r in out}
    # reference comparison (prev fallback row -1 never overlaps cur)
    assert got == ref
    # invariant: assigned (cluster -> entity) mapping is injective
    m = {(r["cluster_id"], r["entity_id"]) for r in out}
    ents = [e for _, e in m]
    assert len(ents) == len(set(ents))


@settings(max_examples=12, deadline=None)
@given(st.data())
def test_cluster_churn_counts_reconcile(spark, data):
    n_docs = data.draw(st.integers(4, 25))
    prev_rows = [
        (d, data.draw(st.integers(100, 104), label=f"pe{d}"))
        for d in range(n_docs)
        if data.draw(st.booleans(), label=f"pin{d}")
    ]
    cur_rows = [
        (d, data.draw(st.integers(200, 204), label=f"cc{d}"))
        for d in range(n_docs + 3)
        if data.draw(st.booleans(), label=f"cin{d}")
    ]
    if not prev_rows or not cur_rows:
        return
    prev = spark.createDataFrame(prev_rows, "doc_id long, entity_id long")
    cur = spark.createDataFrame(cur_rows, "doc_id long, cluster_id long")
    rep = E.cluster_churn(prev, cur).collect()
    # every current cluster appears exactly once with a legal status
    from collections import Counter

    cur_clusters = {c for _, c in cur_rows}
    assert Counter(r["cluster_id"] for r in rep) == Counter(cur_clusters)
    legal = {"new", "merged", "split", "stable", "grown", "shrunk", "changed"}
    assert all(r["status"] in legal for r in rep)
    # n_members sums to |cur|; carried + new == members per row
    assert sum(r["n_members"] for r in rep) == len(cur_rows)
    prev_docs = {d for d, _ in prev_rows}
    for r in rep:
        members = [d for d, c in cur_rows if c == r["cluster_id"]]
        carried = sum(1 for d in members if d in prev_docs)
        assert r["n_new_docs"] == len(members) - carried
