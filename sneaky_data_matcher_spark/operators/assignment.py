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


def group_linkage(
    member_pairs: DataFrame,
    sizes_a: DataFrame,
    sizes_b: DataFrame,
    min_sim: float = 0.0,
) -> DataFrame:
    """Group linkage (On, Koudas, Lee & Srivastava, ICDE 2007): similarity
    between record GROUPS (households, author publication sets, multi-row
    entities) from two sources, computed from their members' pairwise
    similarities via a 1:1 bipartite assignment per group pair.

    `member_pairs` columns: (group_a, group_b, id_a, id_b, sim) — blocked
    candidate member pairs across the sources with per-pair similarity
    (callers pre-round `sim` to a rational/quantized value for engine
    portability). `sizes_a`/`sizes_b`: (group_a|group_b, na|nb) member
    counts. Returns one row per group pair with >=1 mutual match:
    (group_a, group_b, n_matched, group_sim, avg_sim) where
      group_sim = n_matched / (na + nb - n_matched)
    (the paper's normalized bipartite-match measure, count form — a
    Jaccard over 1:1-matched members) and avg_sim is the mean matched
    similarity (exact DECIMAL sum / count).

    The mutual-best restriction of max-weight bipartite matching is used
    (as in mutual_best_match): rank-1 in BOTH per-node windows within the
    (group_a, group_b) cell, ties broken by partner id — deterministic
    and one shuffle per direction, no sequential greedy loop.

    Scale shape: windows partition by (group pair, node) — granularity
    strictly finer than the blocking key that produced the candidates, so
    no new skew; the final rollup is one groupBy over matched pairs plus
    two broadcast-size joins on group ids (group census frames).
    """
    mp = member_pairs.where(F.col("sim") >= min_sim)
    wa = Window.partitionBy("group_a", "group_b", "id_a").orderBy(
        F.col("sim").desc(), F.col("id_b").asc()
    )
    wb = Window.partitionBy("group_a", "group_b", "id_b").orderBy(
        F.col("sim").desc(), F.col("id_a").asc()
    )
    mutual = (
        mp.withColumn("ra", F.row_number().over(wa))
        .withColumn("rb", F.row_number().over(wb))
        .where((F.col("ra") == 1) & (F.col("rb") == 1))
    )
    agg = mutual.groupBy("group_a", "group_b").agg(
        F.count("*").alias("n_matched"),
        F.sum(F.col("sim").cast("decimal(18,6)")).alias("sim_sum"),
    )
    out = (
        agg.join(sizes_a, "group_a")
        .join(sizes_b, "group_b")
        .select(
            "group_a",
            "group_b",
            "n_matched",
            (
                F.col("n_matched").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_matched")).cast("double")
            ).alias("group_sim"),
            (F.col("sim_sum").cast("double") / F.col("n_matched").cast("double")).alias(
                "avg_sim"
            ),
        )
    )
    return out


def group_linkage_sql_ctes(pairs_rel: str, sza_rel: str, szb_rel: str, min_sim: float = 0.0) -> str:
    """DuckDB twin CTE chain; final relation `gl_out` mirrors
    group_linkage's output columns."""
    return (
        f"gl_mp AS (SELECT * FROM {pairs_rel} WHERE sim >= {min_sim!r}), "
        "gl_rk AS (SELECT *, "
        "  row_number() OVER (PARTITION BY group_a, group_b, id_a ORDER BY sim DESC, id_b ASC) AS ra, "
        "  row_number() OVER (PARTITION BY group_a, group_b, id_b ORDER BY sim DESC, id_a ASC) AS rb "
        "  FROM gl_mp), "
        "gl_mutual AS (SELECT * FROM gl_rk WHERE ra = 1 AND rb = 1), "
        "gl_agg AS (SELECT group_a, group_b, count(*) AS n_matched, "
        "  sum(CAST(sim AS DECIMAL(18,6))) AS sim_sum FROM gl_mutual GROUP BY 1, 2), "
        f"gl_out AS (SELECT g.group_a, g.group_b, g.n_matched, "
        "  CAST(g.n_matched AS DOUBLE) / CAST(a.na + b.nb - g.n_matched AS DOUBLE) AS group_sim, "
        "  CAST(g.sim_sum AS DOUBLE) / CAST(g.n_matched AS DOUBLE) AS avg_sim "
        f"  FROM gl_agg g JOIN {sza_rel} a USING (group_a) JOIN {szb_rel} b USING (group_b))"
    )
