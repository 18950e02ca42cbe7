"""Match-graph analytics: degree histogram + triangle counting.

Triangles in the match graph are an ER diagnostic (a triangle is a
transitively-consistent match triple; a high open-wedge-to-triangle ratio
flags blocks whose pairwise scores disagree with transitivity — reference
parity: sneaky_data_matcher has no graph diagnostics at all, this extends
`MatchService`'s flat match lists, see SURVEY.md §2 J3).

Scale design: the naive triangle join (edges ⋈ edges ⋈ edges) explodes on
high-degree nodes (a node of degree d contributes d² wedges). The standard
fix (Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
Reducer", WWW'11) orients every edge from its lower-(degree, id) endpoint
to the higher one: each triangle then has exactly ONE apex (its lowest
endpoint in that total order), wedge fan-out is bounded by O(sqrt(m)) per
node, and total wedge volume by O(m^1.5) regardless of skew. Two shuffles:
one self-join on the apex, one semi-join against the oriented edge set.
All DataFrame ops — no UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalized(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct undirected edges as (u, v) with u < v; self-loops dropped."""
    e = edges.select(
        F.least(F.col(src), F.col(dst)).alias("u"),
        F.greatest(F.col(src), F.col(dst)).alias("v"),
    )
    return e.where(F.col("u") < F.col("v")).distinct()


def degrees(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """(node, degree) over the undirected simple graph."""
    e = _normalized(edges, src, dst)
    ends = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    )
    return ends.groupBy("node").agg(F.count("*").alias("degree"))


def degree_histogram(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """(degree, n_nodes) — the graph's degree distribution."""
    return degrees(edges, src, dst).groupBy("degree").agg(
        F.count("*").alias("n_nodes")
    )


def triangles_per_node(
    edges: DataFrame, src: str = "u", dst: str = "v"
) -> DataFrame:
    """(node, n_triangles) for every node in >= 1 triangle.

    Degree-ordered node-iterator: orient u->v iff (deg(u), u) < (deg(v), v)
    (a total order, so orientation is acyclic); enumerate wedges at each
    apex a: {a->b, a->c} with key(b) < key(c); a wedge closes iff the
    oriented edge b->c exists. Each triangle is found exactly once — at
    its unique apex — so exploding (a, b, c) gives exact per-node counts.
    """
    e = _normalized(edges, src, dst)
    tri = _closed_triangles(e)
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


def _closed_triangles(e: DataFrame) -> DataFrame:
    """All triangles of the normalized edge set, each exactly once, as
    (x, y, z) where x is the degree-order apex. Suri-Vassilvitskii
    oriented wedges — see triangles_per_node."""
    deg = degrees(e)
    key = F.struct(F.col("degree"), F.col("node")).alias("k")
    dk = deg.select("node", key)
    # attach orientation keys to both endpoints (two broadcast-ish joins on
    # the node dim — tiny next to the edge set)
    e2 = (
        e.join(dk.withColumnRenamed("node", "u").withColumnRenamed("k", "ku"), "u")
        .join(dk.withColumnRenamed("node", "v").withColumnRenamed("k", "kv"), "v")
    )
    oriented = e2.select(
        F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(F.col("ku") < F.col("kv"), F.col("kv")).otherwise(F.col("ku")).alias("dst_k"),
    )
    w1 = oriented.select("src", F.col("dst").alias("b"), F.col("dst_k").alias("kb"))
    w2 = oriented.select("src", F.col("dst").alias("c"), F.col("dst_k").alias("kc"))
    wedges = w1.join(w2, "src").where(F.col("kb") < F.col("kc"))
    closing = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    return wedges.join(closing, ["b", "c"]).select(
        F.col("src").alias("x"), F.col("b").alias("y"), F.col("c").alias("z")
    )


def edge_support(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Per-edge triangle support (embeddedness): for every undirected edge,
    how many triangles contain it — 0 for bridge-like edges. In ER this is
    the classic chain-merge diagnostic: a match edge with NO common
    neighbor is transitively uncorroborated, and dropping low-score
    zero-support edges before clustering repairs "hairball" clusters glued
    by a single weak pair (the structural complement of threshold-based
    refine_clusters).

    Same O(m^1.5) oriented-wedge enumeration as triangles_per_node (one
    triangle emits its 3 member edges), then a left join back onto the
    edge set so unsupported edges keep support 0. Output: (u, v, support)
    with u < v."""
    e = _normalized(edges, src, dst)
    tri = _closed_triangles(e)

    def norm(a: str, b: str):
        return F.struct(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )

    member_edges = tri.select(
        F.explode(F.array(norm("x", "y"), norm("x", "z"), norm("y", "z"))).alias("p")
    ).select("p.u", "p.v")
    sup = member_edges.groupBy("u", "v").agg(F.count("*").alias("support"))
    return e.join(sup, ["u", "v"], "left").select(
        "u", "v", F.coalesce("support", F.lit(0)).alias("support")
    )
