"""SemDeDup — semantic deduplication over embeddings (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication").

Text-level dedup (exact / MinHash / SimHash) misses paraphrases and
re-renderings of the same content; SemDeDup catches them in embedding
space: cluster the corpus embeddings, compare pairs WITHIN each cluster
only, and keep one representative per group of semantic duplicates.

Faithful-with-one-deviation implementation:
  - cells: nearest-centroid assignment, map-side (the ann.py IVF shape —
    the centroid set rides each partition as one broadcast array<struct>
    column, argmax inside codegen; no shuffle, no window);
  - candidate pairs: within-cell self-join with cosine >= eps (the
    paper's within-cluster restriction bounds the quadratic term by cell
    size, never corpus size);
  - grouping: CONNECTED COMPONENTS over the within-cell threshold graph
    (components cannot span cells — edges don't), where the paper's
    released code walks members greedily in similarity order. The greedy
    walk is inherently sequential; components give the same "one survivor
    per duplicate neighborhood" guarantee as pure relational ops and are
    replayable by a SQL oracle. Deviation documented here.
  - survivor per group: the member with the LOWEST cosine to its cell
    centroid (the paper's keep-farthest-from-centroid rule, argued for
    diversity), ties broken by smallest id; singletons survive.

Scale notes (100 TB): assignment is a scan; the self-join shuffles on
cell; CC runs on the (tiny) duplicate-edge graph only. Cells from real
k-means are bounded; a degenerate hot cell is the IVF skew story —
re-fit with more centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import cosine_similarity
from .clustering import connected_components


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def assign_cells(
    vecs: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell, cos_c, v): nearest centroid by cosine (ties ->
    smallest centroid_id), keeping the winning similarity for the
    survivor rule. Map-side: broadcast array-of-structs + array_sort."""
    cent_arr = F.broadcast(
        centroids.select(
            F.col("centroid_id"), _as_double(F.col(vec_col)).alias("centv")
        ).agg(F.collect_list(F.struct("centroid_id", "centv")).alias("cents"))
    )
    withc = vecs.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).crossJoin(cent_arr)
    sims = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            F.round(cosine_similarity(F.col("v"), c["centv"]), 6).alias("csim"),
            c["centroid_id"].alias("centroid_id"),
        ),
    )
    best = F.array_min(
        F.transform(sims, lambda s: F.struct((-s["csim"]).alias("neg"), s["centroid_id"]))
    )
    return withc.select(
        "vec_id",
        F.col("v").alias("v"),
        best["centroid_id"].alias("cell"),
        (-best["neg"]).alias("cos_c"),
    )


def semdedup_pairs(
    assigned: DataFrame, eps: float = 0.95
) -> DataFrame:
    """(vec_id_a, vec_id_b, cell, cos) — within-cell pairs with cosine >=
    eps, a < b. One shuffle on cell."""
    a = assigned.select(
        F.col("cell"), F.col("vec_id").alias("vec_id_a"), F.col("v").alias("va")
    )
    b = assigned.select(
        F.col("cell"), F.col("vec_id").alias("vec_id_b"), F.col("v").alias("vb")
    )
    cos = F.round(cosine_similarity(F.col("va"), F.col("vb")), 6)
    return (
        a.join(b, "cell")
        .where(F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b", "cell", cos.alias("cos"))
        .where(F.col("cos") >= eps)
    )


def semdedup(
    vecs: DataFrame,
    centroids: DataFrame,
    eps: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell, cos_c, group_id, keep): semantic-duplicate groups
    and the per-group survivor. group_id = min member id of the duplicate
    component (singletons: own id); keep = lowest cos-to-centroid in the
    group, ties -> smallest id."""
    assigned = assign_cells(vecs, centroids, id_col, vec_col).localCheckpoint(
        eager=False
    )
    edges = semdedup_pairs(assigned, eps).select(
        F.col("vec_id_a").alias("doc_id_a"), F.col("vec_id_b").alias("doc_id_b")
    )
    comp = connected_components(edges)
    grouped = (
        assigned.select("vec_id", "cell", "cos_c")
        .join(comp.withColumnRenamed("doc_id", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            "cos_c",
            F.coalesce("cluster_id", F.col("vec_id")).alias("group_id"),
        )
    )
    # one row per group — same order as the corpus worst-case (all
    # singletons), so this joins on group_id rather than broadcasting
    best = grouped.groupBy("group_id").agg(
        F.min(F.struct(F.col("cos_c"), F.col("vec_id"))).alias("b")
    )
    return grouped.join(best, "group_id").select(
        "vec_id",
        "cell",
        "cos_c",
        "group_id",
        (F.col("vec_id") == F.col("b.vec_id")).alias("keep"),
    )
