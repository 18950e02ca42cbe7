"""Persistent entity identity across clustering runs.

Production record linkage is re-run continuously (new batches, threshold
retunes, model upgrades), but downstream consumers key on ENTITY IDS —
an id that changes every run breaks every foreign key pointing at the
matcher's output. The reference sidesteps the problem by never clustering
at all (its Match jobs export flat rows, services/SearchService.java:
104-199); the Spark-native generalization needs the two operators every
production ER system grows:

  - :func:`persistent_entity_ids` — carry each prior entity id forward to
    the ONE current cluster that best continues it (mutual-best overlap,
    deterministic tie-breaks), minting fresh ids only for genuinely new
    entities. Ids stay unique per run by construction.
  - :func:`cluster_churn` — the steward-facing transition report: per
    current cluster, whether it is stable / grown / shrunk / split off /
    merged from / new vs the previous run, with member-flow counts.

Inputs are two assignment frames:
  prev(doc_id, entity_id)  — last run's committed ids
  cur(doc_id, cluster_id)  — this run's raw connected-components output

Scale notes (100 TB): both operators reduce to the OVERLAP frame —
``prev ⋈ cur`` on doc_id grouped to (entity_id, cluster_id, overlap_n) —
whose size is bounded by the doc count and in practice by the number of
entities; every window below partitions that small frame by entity or
cluster, never the corpus. The doc_id join is the only corpus-sized
shuffle, and it co-locates if both assignments are bucketed by doc_id
(sources/bucketed.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cluster_overlap(prev: DataFrame, cur: DataFrame) -> DataFrame:
    """(entity_id, cluster_id, overlap_n): how many docs each prior entity
    shares with each current cluster. The bipartite continuity graph both
    operators read."""
    return (
        prev.join(cur, "doc_id")
        .groupBy("entity_id", "cluster_id")
        .agg(F.count("*").alias("overlap_n"))
    )


def persistent_entity_ids(prev: DataFrame, cur: DataFrame) -> DataFrame:
    """Stable-id assignment: (doc_id, cluster_id, entity_id, id_source).

    Each prior entity nominates the current cluster it overlaps most
    (ties: lowest cluster_id); each current cluster accepts the nominating
    entity with the largest overlap (ties: lowest entity_id). The
    mutual-best pairing means every prior id is inherited by at most one
    cluster and every cluster inherits at most one id — assigned ids stay
    unique. Unclaimed clusters mint their cluster_id as the new entity id
    (id_source='minted'); callers whose prev ids share the cluster-id
    namespace (both are min-doc-id here) get no collisions because a
    minted cluster contains no prev doc, so its min doc id cannot equal
    any prev entity id.

    Determinism: overlap counts + total-order tie-breaks only — rerun- and
    partitioning-stable, and reproducible in plain SQL (the driver twin).
    """
    ov = cluster_overlap(prev, cur)
    by_entity = Window.partitionBy("entity_id").orderBy(
        F.col("overlap_n").desc(), F.col("cluster_id").asc()
    )
    nominated = (
        ov.withColumn("rk_e", F.row_number().over(by_entity))
        .where(F.col("rk_e") == 1)
        .drop("rk_e")
    )
    by_cluster = Window.partitionBy("cluster_id").orderBy(
        F.col("overlap_n").desc(), F.col("entity_id").asc()
    )
    inherited = (
        nominated.withColumn("rk_c", F.row_number().over(by_cluster))
        .where(F.col("rk_c") == 1)
        .select("cluster_id", "entity_id")
    )
    return cur.join(inherited, "cluster_id", "left").select(
        "doc_id",
        "cluster_id",
        F.coalesce("entity_id", F.col("cluster_id")).alias("entity_id"),
        F.when(F.col("entity_id").isNotNull(), F.lit("inherited"))
        .otherwise(F.lit("minted"))
        .alias("id_source"),
    )


def entity_timeline(assignments: list[tuple[int, DataFrame]]) -> DataFrame:
    """SCD2 membership history over successive clustering runs:
    (doc_id, entity_id, run_from, run_to), one row per maximal span of
    runs in which the doc kept the same entity id. ``run_to`` is NULL for
    spans alive at the latest run; a span closes when the doc changes
    entity OR disappears from a run. Inputs: ordered (run_id, frame)
    pairs with CONSECUTIVE integer run ids and frames of
    (doc_id, entity_id) — ids already made comparable across runs by
    :func:`persistent_entity_ids`.

    The island detection is two windows over the unioned assignment
    history — #docs × #runs rows, partitioned by doc — then one groupBy;
    nothing corpus-shaped beyond the union itself."""
    run_ids = [r for r, _ in assignments]
    if run_ids != sorted(run_ids) or any(
        b - a != 1 for a, b in zip(run_ids, run_ids[1:])
    ):
        raise ValueError(f"run ids must be consecutive ascending, got {run_ids}")
    latest = run_ids[-1]
    hist = None
    for run_id, df in assignments:
        part = df.select(
            "doc_id", "entity_id", F.lit(run_id).alias("run_id")
        )
        hist = part if hist is None else hist.unionByName(part)
    w = Window.partitionBy("doc_id").orderBy("run_id")
    flagged = hist.withColumn(
        "new_island",
        F.when(
            (F.lag("entity_id").over(w).isNull())
            | (F.lag("entity_id").over(w) != F.col("entity_id"))
            | (F.lag("run_id").over(w) != F.col("run_id") - 1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy("doc_id", "island")
        .agg(
            F.min("entity_id").alias("entity_id"),  # constant per island
            F.min("run_id").alias("run_from"),
            F.max("run_id").alias("_run_max"),
        )
        .select(
            "doc_id",
            "entity_id",
            "run_from",
            F.when(F.col("_run_max") == latest, F.lit(None).cast("int"))
            .otherwise(F.col("_run_max"))
            .alias("run_to"),
        )
    )


def cluster_churn(prev: DataFrame, cur: DataFrame) -> DataFrame:
    """Per-current-cluster transition report vs the previous run:
    (cluster_id, n_members, n_prev_entities, n_new_docs, status) where

      new    — no member was in the previous run
      merged — members of >= 2 prior entities
      split  — the one prior entity it continues also flows into other
               current clusters
      stable — exactly one prior entity, all of it, nothing else
      grown  — one whole prior entity plus new docs
      shrunk — part of one prior entity, docs dropped, none added
      changed— part of one prior entity plus new docs

    Dissolved prior entities (no member survives) do not appear here by
    construction; count them as prev entities minus distinct entity_id in
    :func:`cluster_overlap` (tested)."""
    ov = cluster_overlap(prev, cur)
    prev_sizes = prev.groupBy("entity_id").agg(F.count("*").alias("prev_size"))
    spread = ov.groupBy("entity_id").agg(
        F.countDistinct("cluster_id").alias("n_cur_clusters")
    )
    per_cluster = ov.groupBy("cluster_id").agg(
        F.countDistinct("entity_id").alias("n_prev_entities"),
        F.sum("overlap_n").alias("n_carried"),
    )
    cur_sizes = cur.groupBy("cluster_id").agg(F.count("*").alias("n_members"))
    # the single-entity detail (overlap vs prev size, spread) only matters
    # when n_prev_entities == 1, where the ov row per cluster is unique
    single = (
        ov.join(
            per_cluster.where(F.col("n_prev_entities") == 1).select("cluster_id"),
            "cluster_id",
        )
        .join(prev_sizes, "entity_id")
        .join(spread, "entity_id")
        .select("cluster_id", "overlap_n", "prev_size", "n_cur_clusters")
    )
    rep = (
        cur_sizes.join(per_cluster, "cluster_id", "left")
        .join(single, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_members",
            F.coalesce("n_prev_entities", F.lit(0)).alias("n_prev_entities"),
            (F.col("n_members") - F.coalesce("n_carried", F.lit(0))).alias(
                "n_new_docs"
            ),
            "overlap_n",
            "prev_size",
            "n_cur_clusters",
        )
    )
    whole = F.col("overlap_n") == F.col("prev_size")
    status = (
        F.when(F.col("n_prev_entities") == 0, F.lit("new"))
        .when(F.col("n_prev_entities") >= 2, F.lit("merged"))
        .when(F.col("n_cur_clusters") >= 2, F.lit("split"))
        .when(whole & (F.col("n_new_docs") == 0), F.lit("stable"))
        .when(whole, F.lit("grown"))
        .when(F.col("n_new_docs") == 0, F.lit("shrunk"))
        .otherwise(F.lit("changed"))
    )
    return rep.select(
        "cluster_id",
        "n_members",
        "n_prev_entities",
        "n_new_docs",
        status.alias("status"),
    )
