"""One-to-one match assignment (mutual-best-match post-processing).

Entity resolution between two trusted sources often needs a 1:1 mapping:
each record may match AT MOST one partner (the reference's probe-match
surface returns every hit — SearchService.java:165 — and leaves conflict
resolution to the caller; deduplication literature resolves it with a
stable/greedy assignment over the scored pair graph).

The classic scalable relaxation of maximum-weight bipartite matching is
*mutual best match* (a.k.a. symmetric best match / exclusivity filter):
keep a scored pair (u, v) iff v is u's highest-scoring candidate AND u is
v's highest-scoring candidate. It is embarrassingly parallel — one shuffle
on node id, one window per direction — and deterministic given a total
tie-break order, whereas greedy sequential matching is order-dependent and
does not distribute.

Scale shape (100 TB): symmetrize pairs (map-only), `row_number` over
(node) ordered by (score desc, partner asc) — a single hash shuffle on
node id; the mutual check is a self-join of the two per-direction winners
on the undirected pair key, both sides already partitioned by their join
key. No all-pairs work beyond the candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mutual_best_match(
    pairs: DataFrame,
    id_a: str = "doc_id_a",
    id_b: str = "doc_id_b",
    score: str = "score",
) -> DataFrame:
    """Filter undirected scored pairs down to mutual-best 1:1 matches.

    `pairs` holds one row per undirected candidate pair (id_a < id_b by
    convention, not required) with a numeric `score`. Returns the subset
    where each endpoint's best partner (highest score, ties broken by the
    SMALLEST partner id so the result is deterministic) is the other
    endpoint. Output columns: (id_a, id_b, score) with id_a < id_b.
    """
    u = F.col("u")
    sym = pairs.select(
        F.col(id_a).alias("u"), F.col(id_b).alias("v"), F.col(score).alias("s")
    ).unionByName(
        pairs.select(
            F.col(id_b).alias("u"), F.col(id_a).alias("v"), F.col(score).alias("s")
        )
    )
    w = Window.partitionBy("u").orderBy(F.col("s").desc(), F.col("v").asc())
    best = (
        sym.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("u", "v", "s")
    )
    # A mutual pair appears twice in `best` (u->v and v->u); keep the
    # canonical orientation. Joining best-to-best on the flipped key is a
    # self-equi-join on (u, v) — Catalyst plans one shuffle reused by both
    # sides at this key.
    other = best.select(
        F.col("v").alias("u"), F.col("u").alias("v"), F.col("s").alias("s2")
    )
    return (
        best.join(other, ["u", "v"])
        .where(u < F.col("v"))
        .select(
            F.col("u").alias(id_a), F.col("v").alias(id_b), F.col("s").alias(score)
        )
    )
