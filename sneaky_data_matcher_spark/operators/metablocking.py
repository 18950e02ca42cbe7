"""Meta-blocking — weight the blocking graph, prune low-evidence
comparisons before any pair is scored.

Multi-pass blocking (operators/blocking.py) is recall-oriented: a pair
sharing ANY key is a candidate. At 10^12 docs the resulting comparison
set is dominated by pairs that co-occur in exactly one weak block.
Meta-blocking (Papadakis et al., TKDE 2014 — public literature) treats
blocks as evidence: pairs are edges weighted by HOW MUCH blocking
evidence they share, and edges below a data-derived threshold are
pruned before the expensive scoring join.

Weighting schemes implemented (both from the paper's canonical set):
  CBS  — common-blocks: number of (pass, block_key) the pair shares.
  ECBS-like Jaccard — cbs / (|blocks(a)| + |blocks(b)| - cbs),
         normalizing away prolific documents.

Pruning schemes:
  WEP — weighted edge pruning: keep edges with weight >= the GLOBAL
        mean weight.
  WNP — weighted node pruning: keep edges whose weight >= the local
        mean weight of EITHER endpoint (node-centric; strictly higher
        recall than WEP at the same weight function).

Scale notes (100 TB):
  - `block_purge` drops degenerate blocks OUTRIGHT (stop-word keys):
    census + broadcast anti-join of the (rare) hot slice, mirroring
    salt_keys' broadcast strategy. Purging bounds the self-join below.
  - the edge build shuffles (pass, block_key) once for the self-join
    and (doc_id_a, doc_id_b) once for the CBS count — both map-side
    combinable. Only bare ids and ints travel.
  - WEP's threshold is ONE scalar (computed as an exact long ratio —
    sum(cbs)/count, no float-sum nondeterminism) broadcast into the
    filter; WNP's per-node means are exact long pairs, shuffled once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def block_purge(
    keys: DataFrame, max_block_size: int, hot_broadcast_limit: int = 1_000_000
) -> DataFrame:
    """Drop blocks larger than `max_block_size` entirely (classic block
    purging: such keys are stop-words — their pair mass is quadratic
    noise). Census + broadcast LEFT ANTI join of the hot slice; falls
    back to a shuffle anti-join if the hot slice is degenerate-huge."""
    census = keys.groupBy("pass", "block_key").agg(F.count("*").alias("sz"))
    hot = census.where(F.col("sz") > max_block_size).select("pass", "block_key")
    hot = hot.localCheckpoint(eager=True)
    if hot.count() <= hot_broadcast_limit:
        hot = F.broadcast(hot)
    return keys.join(hot, ["pass", "block_key"], "left_anti")


def block_graph_edges(keys: DataFrame) -> DataFrame:
    """keys(doc_id, pass, block_key) -> weighted comparison edges
    (doc_id_a < doc_id_b, cbs, jaccard).

    cbs counts shared (pass, block_key) blocks; jaccard normalizes by
    the union of the two docs' block sets. Per-doc block counts are
    exact ints computed once pre-join, so jaccard is a single
    deterministic division — oracle-portable without rounding tricks.
    """
    per_doc = keys.groupBy("doc_id").agg(F.count("*").alias("nb"))
    a = keys.select("pass", "block_key", F.col("doc_id").alias("doc_id_a"))
    b = keys.select("pass", "block_key", F.col("doc_id").alias("doc_id_b"))
    cbs = (
        a.join(b, ["pass", "block_key"])
        .where(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").alias("cbs"))
    )
    na = per_doc.select(F.col("doc_id").alias("doc_id_a"), F.col("nb").alias("nb_a"))
    nb = per_doc.select(F.col("doc_id").alias("doc_id_b"), F.col("nb").alias("nb_b"))
    return (
        cbs.join(na, "doc_id_a")
        .join(nb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            "cbs",
            (
                F.col("cbs").cast("double")
                / (F.col("nb_a") + F.col("nb_b") - F.col("cbs")).cast("double")
            ).alias("jaccard"),
        )
    )


def wep_prune(edges: DataFrame) -> DataFrame:
    """Weighted edge pruning on the CBS weight: keep edges with
    cbs >= mean(cbs). The mean is kept EXACT as the long pair
    (sum, count) and the comparison is cross-multiplied
    (cbs * n_edges >= cbs_sum) so no float summation order can flip the
    threshold between engines. One scalar aggregate, broadcast-joined
    into the filter."""
    stats = edges.agg(
        F.sum("cbs").alias("cbs_sum"), F.count("*").alias("n_edges")
    )
    return (
        edges.crossJoin(F.broadcast(stats))
        .where(F.col("cbs") * F.col("n_edges") >= F.col("cbs_sum"))
        .select("doc_id_a", "doc_id_b", "cbs", "jaccard")
    )


def wnp_prune(edges: DataFrame) -> DataFrame:
    """Weighted node pruning: keep an edge iff its cbs >= the mean cbs
    of edges incident to a-side OR to b-side. Per-node means stay exact
    long pairs; comparisons cross-multiply. Two shuffles (orientation
    union groupBy + join back), bare ids and longs only."""
    incident = (
        edges.select(F.col("doc_id_a").alias("doc_id"), "cbs")
        .unionByName(edges.select(F.col("doc_id_b").alias("doc_id"), "cbs"))
        .groupBy("doc_id")
        .agg(F.sum("cbs").alias("s"), F.count("*").alias("n"))
    )
    sa = incident.select(
        F.col("doc_id").alias("doc_id_a"), F.col("s").alias("s_a"), F.col("n").alias("n_a")
    )
    sb = incident.select(
        F.col("doc_id").alias("doc_id_b"), F.col("s").alias("s_b"), F.col("n").alias("n_b")
    )
    return (
        edges.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .where(
            (F.col("cbs") * F.col("n_a") >= F.col("s_a"))
            | (F.col("cbs") * F.col("n_b") >= F.col("s_b"))
        )
        .select("doc_id_a", "doc_id_b", "cbs", "jaccard")
    )
