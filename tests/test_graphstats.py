"""Degree-ordered triangle counting + degree histogram (operators/graphstats)."""

from __future__ import annotations

import itertools

from sneaky_data_matcher_spark.operators import graphstats as G


def _edges(spark, pairs):
    return spark.createDataFrame([(a, b) for a, b in pairs], "u long, v long")


def test_k4_every_node_in_three_triangles(spark):
    k4 = list(itertools.combinations(range(4), 2))
    got = {
        r["node"]: r["n_triangles"]
        for r in G.triangles_per_node(_edges(spark, k4)).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # K4 has 4 triangles, 3 per node


def test_wedge_without_closure_is_no_triangle(spark):
    got = G.triangles_per_node(_edges(spark, [(0, 1), (1, 2)])).collect()
    assert got == []


def test_direction_duplicates_and_self_loops_normalized(spark):
    # triangle given with mixed directions, a duplicate edge, and a loop
    e = _edges(spark, [(1, 0), (1, 2), (0, 2), (2, 0), (3, 3)])
    got = {
        r["node"]: r["n_triangles"]
        for r in G.triangles_per_node(e).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1}


def test_triangles_match_bruteforce_on_hashed_random_graph(spark):
    # deterministic pseudo-random graph: edge (i, j) present iff
    # (i*31 + j*17) % 7 < 2 — dense enough for hundreds of triangles
    n = 40
    pairs = [
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if (i * 31 + j * 17) % 7 < 2
    ]
    eset = set(pairs)
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1
    got = {
        r["node"]: r["n_triangles"]
        for r in G.triangles_per_node(_edges(spark, pairs)).collect()
    }
    assert got == want and sum(want.values()) > 100


def test_degree_histogram(spark):
    # star K1,4 : center degree 4, leaves degree 1
    e = _edges(spark, [(0, i) for i in range(1, 5)])
    got = {r["degree"]: r["n_nodes"] for r in G.degree_histogram(e).collect()}
    assert got == {4: 1, 1: 4}


def test_edge_support_k4(spark):
    """In K4 every edge lies in exactly 2 triangles."""
    from sneaky_data_matcher_spark.operators.graphstats import edge_support

    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(edges, "u int, v int")
    out = {(r.u, r.v): r.support for r in edge_support(df).collect()}
    assert out == {e: 2 for e in edges}


def test_edge_support_path_is_zero(spark):
    from sneaky_data_matcher_spark.operators.graphstats import edge_support

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "u int, v int")
    out = {(r.u, r.v): r.support for r in edge_support(df).collect()}
    assert out == {(1, 2): 0, (2, 3): 0, (3, 4): 0}


def test_edge_support_random_vs_bruteforce(spark):
    import random

    from sneaky_data_matcher_spark.operators.graphstats import edge_support

    rng = random.Random(99)
    edges = set()
    while len(edges) < 120:
        a, b = rng.randint(1, 25), rng.randint(1, 25)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {(a, b): len(adj[a] & adj[b]) for a, b in edges}
    df = spark.createDataFrame(sorted(edges), "u int, v int")
    got = {(r.u, r.v): r.support for r in edge_support(df).collect()}
    assert got == expected
