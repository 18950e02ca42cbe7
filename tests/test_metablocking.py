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
