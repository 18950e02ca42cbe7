"""Meta-blocking: block purge, CBS/Jaccard edge weights, WEP/WNP pruning."""

from __future__ import annotations

from sneaky_data_matcher_spark.operators import metablocking as MB


def _keys(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, pass string, block_key string")


def test_block_purge_drops_hot_blocks(spark):
    keys = _keys(
        spark,
        [(i, "pfx", "stop") for i in range(10)] + [(1, "pfx", "rare"), (2, "pfx", "rare")],
    )
    out = MB.block_purge(keys, max_block_size=5)
    got = {(r["doc_id"], r["block_key"]) for r in out.collect()}
    assert got == {(1, "rare"), (2, "rare")}


def test_block_graph_edges_cbs_and_jaccard(spark):
    # docs 1,2 share two blocks; doc 3 joins one of them
    keys = _keys(
        spark,
        [
            (1, "pfx", "k1"), (2, "pfx", "k1"), (3, "pfx", "k1"),
            (1, "srt", "k2"), (2, "srt", "k2"),
            (3, "srt", "k3"),
        ],
    )
    edges = {
        (r["doc_id_a"], r["doc_id_b"]): r for r in MB.block_graph_edges(keys).collect()
    }
    assert edges[(1, 2)]["cbs"] == 2
    # blocks(1)=2, blocks(2)=2 -> jaccard = 2/(2+2-2) = 1.0
    assert edges[(1, 2)]["jaccard"] == 1.0
    assert edges[(1, 3)]["cbs"] == 1
    assert edges[(1, 3)]["jaccard"] == 1 / 3
    assert edges[(2, 3)]["cbs"] == 1


def test_wep_keeps_edges_at_or_above_mean(spark):
    keys = _keys(
        spark,
        [
            (1, "pfx", "k1"), (2, "pfx", "k1"), (3, "pfx", "k1"),
            (1, "srt", "k2"), (2, "srt", "k2"),
        ],
    )
    edges = MB.block_graph_edges(keys)
    # cbs: (1,2)=2, (1,3)=1, (2,3)=1 -> mean 4/3; WEP keeps cbs*3 >= 4
    kept = {(r["doc_id_a"], r["doc_id_b"]) for r in MB.wep_prune(edges).collect()}
    assert kept == {(1, 2)}


def test_wnp_keeps_local_maxima(spark):
    keys = _keys(
        spark,
        [
            (1, "pfx", "k1"), (2, "pfx", "k1"), (3, "pfx", "k1"),
            (1, "srt", "k2"), (2, "srt", "k2"),
        ],
    )
    edges = MB.block_graph_edges(keys)
    kept = {(r["doc_id_a"], r["doc_id_b"]) for r in MB.wnp_prune(edges).collect()}
    # node 3's incident edges all have cbs=1 (its local mean) -> kept by OR
    assert (1, 2) in kept
    assert (1, 3) in kept and (2, 3) in kept


def test_wnp_prunes_below_both_locals(spark):
    # star around 1: strong (1,2), weak (1,3),(1,4); plus strong (3,4)
    keys = _keys(
        spark,
        [
            # (1,2) share 3 blocks
            (1, "pfx", "a"), (2, "pfx", "a"),
            (1, "srt", "b"), (2, "srt", "b"),
            (1, "med", "c"), (2, "med", "c"),
            # (3,4) share 2 blocks; (1,3),(1,4) share 1 each
            (3, "pfx", "d"), (4, "pfx", "d"),
            (3, "srt", "e"), (4, "srt", "e"),
            (1, "x", "f"), (3, "x", "f"),
            (1, "y", "g"), (4, "y", "g"),
        ],
    )
    edges = MB.block_graph_edges(keys)
    kept = {(r["doc_id_a"], r["doc_id_b"]) for r in MB.wnp_prune(edges).collect()}
    # local means: node1 (3+1+1)/3=5/3, node3 (2+1)/2=1.5, node4 1.5
    # (1,3): cbs 1 < 5/3 and < 1.5 -> pruned; same (1,4)
    assert kept == {(1, 2), (3, 4)}


def test_block_filter_keeps_smallest_half(spark):
    # doc 1 sits in 4 blocks of sizes 4,3,2,2 -> keeps ceil(4/2)=2
    # smallest (sz 2 ties broken by (pass, block_key))
    rows = []
    for d in (1, 2, 3, 4):
        rows.append((d, "p", "big4"))      # size 4
    for d in (1, 2, 3):
        rows.append((d, "p", "mid3"))      # size 3
    rows += [(1, "p", "s_a"), (2, "p", "s_a")]   # size 2
    rows += [(1, "q", "s_b"), (3, "q", "s_b")]   # size 2
    kept = {
        (r["doc_id"], r["pass"], r["block_key"])
        for r in MB.block_filter(_keys(spark, rows)).collect()
    }
    assert {(1, "p", "s_a"), (1, "q", "s_b")} <= kept
    assert (1, "p", "big4") not in kept and (1, "p", "mid3") not in kept


def test_block_filter_singleton_record_keeps_one(spark):
    # a record in exactly one block must keep it (ceil(1/2)=1)
    kept = MB.block_filter(
        _keys(spark, [(1, "p", "a"), (2, "p", "a"), (2, "p", "b")])
    ).collect()
    assert (1, "p", "a") in {(r[0], r[1], r[2]) for r in kept}


def test_progressive_recall_curve_monotone_and_total(spark):
    # 3 strong-evidence pairs (cbs 2) + noise pairs (cbs 1); matches are
    # exactly the strong pairs -> recall hits 1.0 well before bucket 10
    rows = []
    for i, (a, b) in enumerate([(1, 2), (3, 4), (5, 6)]):
        rows += [(a, "p", f"k{i}"), (b, "p", f"k{i}")]
        rows += [(a, "q", f"m{i}"), (b, "q", f"m{i}")]
    for i in range(20):  # noise: singleton-evidence pairs
        rows += [(100 + i, "p", f"n{i}"), (200 + i, "p", f"n{i}")]
    keys = _keys(spark, rows)
    edges = MB.block_graph_edges(keys)
    matches = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "doc_id_a long, doc_id_b long"
    )
    curve = sorted(
        (r["bucket"], r["cum_pairs"], r["cum_matches"], r["recall"])
        for r in MB.progressive_decile_recall(edges, matches).collect()
    )
    assert curve[-1][1] == 23 and curve[-1][2] == 3  # all pairs, all matches
    assert curve[-1][3] == 1.0
    # strong pairs rank first: full recall already in the earliest buckets
    assert curve[1][2] == 3
    cums = [c[2] for c in curve]
    assert cums == sorted(cums)
