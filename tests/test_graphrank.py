"""Integer PageRank: fixed points, hand-computed stars, sink leakage,
and single-node Python oracle agreement on a random graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators.graphrank import pagerank_int

BASE = 1_000_000


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _scores(df):
    return {r["node"]: r["score"] for r in df.collect()}


def test_cycle_is_fixed_point(spark):
    # k-cycle: every node keeps exactly base at every iteration
    e = _edges(spark, [(i, (i + 1) % 5) for i in range(5)])
    got = _scores(pagerank_int(e, iterations=4))
    assert got == {i: BASE for i in range(5)}


def test_star_hand_computed(spark):
    # leaves 1..4 -> center 0; center -> 1 (so no dangling node)
    e = _edges(spark, [(i, 0) for i in range(1, 5)] + [(0, 1)])
    got = _scores(pagerank_int(e, iterations=1))
    # center: (15e4*1e2? no) hold=15_000_000; in = 4 * (1e6 // 1)
    assert got[0] == (15_000_000 + 85 * 4_000_000) // 100  # 3_550_000
    assert got[1] == (15_000_000 + 85 * 1_000_000) // 100  # 1_000_000
    assert got[2] == 15_000_000 // 100  # no in-edges -> 150_000
    assert got[2] == got[3] == got[4]


def test_sink_leaks_mass(spark):
    # 0 -> 1, 1 has no out-edge: total mass after 1 iter < 2 * base
    e = _edges(spark, [(0, 1)])
    got = _scores(pagerank_int(e, iterations=1))
    assert got[1] == (15_000_000 + 85 * 1_000_000) // 100
    assert got[0] == 150_000
    assert sum(got.values()) < 2 * BASE


def test_matches_python_oracle_random_graph(spark):
    import random

    rng = random.Random(11)
    n = 40
    pairs = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(160)})
    pairs = [(a, b) for a, b in pairs if a != b]
    got = _scores(pagerank_int(_edges(spark, pairs), iterations=3))

    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    out = {}
    for a, _ in pairs:
        out[a] = out.get(a, 0) + 1
    score = {v: BASE for v in nodes}
    for _ in range(3):
        acc = {v: 0 for v in nodes}
        for a, b in pairs:
            acc[b] += score[a] // out[a]
        score = {v: (15 * BASE + 85 * acc[v]) // 100 for v in nodes}
    assert got == score
