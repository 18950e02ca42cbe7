"""Integer-arithmetic PageRank over a DataFrame edge list.

Beyond connected components (clustering.py), a linkage/corpus pipeline
needs a centrality signal — canonical-record election, crawl
prioritization, spam-mass style quality propagation. This is the classic
iterative join/agg PageRank, with one twist that makes it ORACLE-EXACT:
all arithmetic is integer (scores in fixed-point units, contributions by
integer division, damping as integer percent), so a DuckDB twin unrolled
to the same iteration count reproduces every score bit-for-bit — no
float-summation-order drift, the same trick the decimal-sum queries use.

    score_0(v)   = base
    score_k+1(v) = ((100 - d_pct) * base
                    + d_pct * sum_{u->v} (score_k(u) // outdeg(u))) // 100

Scale notes (100 TB / 10^12 edges):
  - per iteration: ONE shuffle for the contribution groupBy(dst) plus a
    join of scores to edges on src; edges are re-read each round, so
    localCheckpoint the edge frame once (caller) and let AQE size the
    shuffles. Same shape as the production GraphX/Pregel PR translated
    to DataFrames.
  - integer division loses at most outdeg units per node per round —
    bounded, deterministic truncation (NOT stochastic error), the price
    of exact reproducibility across engines.
  - hub nodes (huge in-degree) are a groupBy hot key: the sum is
    map-side combinable, which is exactly what defuses them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_int(
    edges: DataFrame,
    iterations: int = 3,
    base: int = 1_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """edges(src, dst) distinct -> (node, score) after ``iterations``
    rounds of integer PageRank. Nodes = union of src/dst. Dangling nodes
    (no out-edges) leak their mass — standard simplification; redistribute
    upstream if the graph has sinks."""
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    scores = nodes.withColumn("score", F.lit(base).cast("long"))
    hold = (100 - damping_pct) * base
    for _ in range(iterations):
        contrib = (
            scores.join(deg, scores.node == deg.src)
            .join(e, "src")
            # `div`: exact integer division (a double `/` + cast would be
            # exact only below 2^53 — don't rely on it)
            .select("dst", F.expr("score div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        scores = nodes.join(
            contrib, nodes.node == contrib.dst, "left"
        ).select(
            "node",
            F.expr(
                f"({hold}L + {damping_pct} * coalesce(in_sum, 0L)) div 100"
            ).alias("score"),
        )
    return scores


def pagerank_int_sql(
    edges_rel: str,
    iterations: int = 3,
    base: int = 1_000_000,
    damping_pct: int = 85,
) -> str:
    """DuckDB twin: the same rounds unrolled as chained CTEs. Returns a
    CTE chain ending in ``pr{iterations}(node, score)``; embed after the
    caller's WITH list. ``edges_rel`` must provide (src, dst)."""
    hold = (100 - damping_pct) * base
    parts = [
        f"pe AS MATERIALIZED (SELECT DISTINCT src, dst FROM {edges_rel})",
        "pnodes AS MATERIALIZED (SELECT src AS node FROM pe "
        "UNION SELECT dst FROM pe)",
        "pdeg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM pe GROUP BY src)",
        f"pr0 AS (SELECT node, CAST({base} AS BIGINT) AS score FROM pnodes)",
    ]
    for k in range(iterations):
        parts.append(
            f"pc{k} AS (SELECT e.dst, CAST(sum(CAST(s.score AS BIGINT) "
            "// d.outdeg) AS BIGINT) AS in_sum "
            f"FROM pr{k} s JOIN pdeg d ON s.node = d.src "
            "JOIN pe e ON e.src = d.src GROUP BY e.dst)"
        )
        parts.append(
            f"pr{k + 1} AS (SELECT n.node, CAST(({hold} + {damping_pct} * "
            f"COALESCE(c.in_sum, 0)) // 100 AS BIGINT) AS score "
            f"FROM pnodes n LEFT JOIN pc{k} c ON n.node = c.dst)"
        )
    return ", ".join(parts)
