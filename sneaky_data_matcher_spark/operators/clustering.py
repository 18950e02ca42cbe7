"""Transitive clustering: large-star/small-star connected components.

The set-oriented generalization of the reference's join-by-shared-value
enrichment (repositories/SearchRepository.java:249-297): instead of merging
rows that share a column value one seed at a time (capped at maxJoinDepth),
we take the full match graph and compute connected components, assigning
every doc the min doc_id of its component.

Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014) — O(log n) rounds, each
round two groupBy/join stages; proven convergent. Each iteration is
localCheckpoint()ed to cut lineage (a driver-side fixpoint loop is the one
thing Catalyst cannot express).

Scale notes:
  - edge frames are (u, v) string pairs; every round shuffles on u — at
    10^12 docs this is the dominant shuffle, so rounds matter more than
    per-round constants; large/small-star's O(log n) rounds beat naive
    label propagation's O(diameter).
  - high-degree hubs (a celebrity doc matched by millions) are exactly what
    large-star handles: it re-attaches large neighbors to the min, splitting
    the star across partitions next round.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The fixpoint loop temporarily retunes session conf (AQE off, loop-sized
# shuffle partitions). Those knobs are session-global, so concurrent CC
# calls on one session would race on set/restore; serialize them. Other
# concurrent queries on the same session during a CC loop would still see
# the loop settings — documented non-reentrancy, acceptable for a
# single-driver pipeline.
_CONF_LOCK = threading.Lock()


def _sym(edges: DataFrame) -> DataFrame:
    """Both directions, self-loops dropped."""
    e = edges.select(F.col("u"), F.col("v"))
    return (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each u: m = min(N(u) ∪ {u}); emit (v, m) for v in N(u), v > u."""
    nbrs = _sym(edges)
    m = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        nbrs.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges small->large: for each u over neighbors v <= u:
    m = min(N ∪ {u}); emit (v, m) for v in N plus (u, m)."""
    nbrs = _sym(edges).where(F.col("v") < F.col("u"))
    m = nbrs.groupBy("u").agg(F.min("v").alias("m"))
    attach = nbrs.join(m, "u")
    out = attach.select(F.col("v").alias("u"), F.col("m").alias("v")).unionByName(
        attach.select(F.col("u"), F.col("m").alias("v")).distinct()
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def _contract_partitions(edges: DataFrame) -> DataFrame:
    """Partition-local union-find contraction: within each partition,
    replace its edge multiset by the star (node -> local component
    minimum). Connectivity is exactly preserved — two nodes connected
    through edges of one partition become connected through its star, and
    nodes shared across partitions glue the local stars back together in
    the global loop — while the per-partition edge count drops from |E_p|
    to at most |V_p| - 1.

    Why this matters at 100 TB: candidate pairs are GENERATED per block
    inside one partition, so a dense block of k members contributes
    k(k-1)/2 pair rows that all sit in the same map partition. Contracting
    BEFORE the first shuffle collapses that to k-1 rows — the initial
    distinct() and every large/small-star round then shuffle the
    contracted edge set. This is the standard local-aggregation phase of
    two-phase MapReduce CC (cf. Kiveris et al. §5 "CC-MR style"
    pre-processing); it is a pure optimization with identical output
    (asserted in tests/test_clustering.py on path/random/pipeline graphs).

    Kernel shape: Arrow-batched mapInPandas; per partition the string ids
    are factorized once (pandas, C speed) and the union-find itself runs
    over a compact int array with path halving — the only Python-level
    loop is O(E_p α(V_p)) on small ints, and it runs once per partition,
    off the row-at-a-time path. Local roots are chosen as the MINIMUM id
    in the local component so the emitted edge set is a deterministic
    function of the partition's content."""
    # id dtype (string or integral) rides through untouched: factorize
    # codes drive the union-find, uniques keep the original values.
    schema = edges.select("u", "v").schema

    def fn(batches):
        import numpy as np
        import pandas as pd

        us, vs = [], []
        for b in batches:
            us.append(b["u"])
            vs.append(b["v"])
        if not us:
            return
        u = pd.concat(us, ignore_index=True)
        v = pd.concat(vs, ignore_index=True)
        codes, uniques = pd.factorize(pd.concat([u, v], ignore_index=True))
        n = len(uniques)
        cu, cv = codes[: len(u)], codes[len(u):]
        # factorize maps nulls to code -1, which would silently index
        # parent[-1] (the LAST unique) and merge unrelated components.
        # A null endpoint edge is meaningless; drop the edge — exactly
        # what the join-based CC path does implicitly (ADVICE r3).
        ok = (cu >= 0) & (cv >= 0)
        if not ok.all():
            cu, cv = cu[ok], cv[ok]
        parent = np.arange(n, dtype=np.int64)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for a, b in zip(cu.tolist(), cv.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min id keeps labels deterministic without a
                # second relabel pass: uniques order is first-seen, so
                # compare the actual strings
                if uniques[rb] < uniques[ra]:
                    ra, rb = rb, ra
                parent[rb] = ra
        roots = np.array([find(i) for i in range(n)], dtype=np.int64)
        mask = roots != np.arange(n)
        out = pd.DataFrame(
            {"u": uniques[np.arange(n)[mask]], "v": uniques[roots[mask]]}
        )
        if len(out):
            yield out

    return edges.mapInPandas(fn, schema)


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        # bit_xor: order-insensitive, overflow-free (ANSI mode safe)
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def connected_components(
    matches: DataFrame,
    max_iterations: int = 25,
    checkpoint: bool = True,
    optimized_runs: bool = True,
    pre_contract: bool = False,
    _stats: dict | None = None,
) -> DataFrame:
    """matches(doc_id_a, doc_id_b, ...) -> (doc_id, cluster_id).

    cluster_id = min doc_id of the component. Docs absent from `matches`
    are not emitted — callers left-join and coalesce to doc_id for
    singleton clusters (see pipeline.assign_clusters).

    optimized_runs=True (default) uses Kiveris et al. §4's "optimized
    runs" schedule: repeat large-star until ITS OWN fixpoint, then one
    small-star, then repeat. A/B'd in tools/bench_cc_schedule.py
    (BENCH.md "CC schedule A/B", best-of-3 ×2 sessions): on a 20k-node
    path graph (high diameter) it converges in 2 outer rounds vs 16 —
    7.3-8.0x faster wall; on this pipeline's matcher-shaped graph (many
    small dense clusters) it is 1.4-1.7x faster too, because skipping
    half the small-stars saves more than the extra inner checksum jobs
    cost. Identical assignments on both shapes (asserted per trial).
    pre_contract=True runs a partition-local union-find contraction
    (see _contract_partitions) on the raw match pairs BEFORE the first
    distinct() shuffle — identical output, and on block-generated pair
    sets (k members -> k(k-1)/2 co-located pairs) it shrinks both the
    initial shuffle and every star round to ~node-count volume. Measured
    faster on all three A/B graph shapes (tools/bench_cc_schedule.py /
    BENCH.md: path 2.3x — it also collapses diameter, 17 large-stars ->
    5 — matcher 1.1x, dense 1.3x). Default False at the operator level so
    generic callers keep the minimal plan and both paths stay
    driver-proven (er_clusters vs er_clusters_contracted); the pipeline
    turns it on via PipelineConfig.cc_pre_contract.

    `_stats`, if passed, receives {"rounds", "large_stars",
    "small_stars"} for benchmarking.
    """
    edges = matches.select(
        F.col("doc_id_a").alias("u"), F.col("doc_id_b").alias("v")
    )
    if pre_contract:
        edges = _contract_partitions(edges)
    edges = edges.distinct()
    if checkpoint:
        edges = edges.localCheckpoint(eager=True)
    prev = _edge_checksum(edges)

    # The fixpoint loop issues ~6 micro-shuffles per iteration. Left at the
    # session's scan-sized settings, each one pays AQE re-planning plus a
    # full complement of near-empty tasks, and that fixed driver cost — not
    # the edge data — dominates CC wall-clock. Size the loop's shuffles to
    # the edge count and skip AQE inside the loop; restore settings after.
    conf = edges.sparkSession.conf
    with _CONF_LOCK:
        old_aqe = conf.get("spark.sql.adaptive.enabled", "true")
        old_sp = conf.get("spark.sql.shuffle.partitions", "200")
        loop_parts = max(8, min(int(old_sp), prev[0] // 50_000 + 8))
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", str(loop_parts))
        stats = {"rounds": 0, "large_stars": 0, "small_stars": 0}
        try:
            for _ in range(max_iterations):
                stats["rounds"] += 1
                if optimized_runs:
                    ls_prev = prev
                    for _ in range(max_iterations):
                        edges = _large_star(edges)
                        if checkpoint:
                            edges = edges.localCheckpoint(eager=True)
                        stats["large_stars"] += 1
                        cur = _edge_checksum(edges)
                        if cur == ls_prev:
                            break
                        ls_prev = cur
                    edges = _small_star(edges)
                    stats["small_stars"] += 1
                else:
                    edges = _small_star(_large_star(edges))
                    stats["large_stars"] += 1
                    stats["small_stars"] += 1
                if checkpoint:
                    edges = edges.localCheckpoint(eager=True)
                cur = _edge_checksum(edges)
                if cur == prev:
                    break
                prev = cur
        finally:
            conf.set("spark.sql.adaptive.enabled", old_aqe)
            conf.set("spark.sql.shuffle.partitions", old_sp)
        if _stats is not None:
            _stats.update(stats)
    # Fixpoint: every edge is (node, root). Emit both node->root and
    # root->root so component representatives appear in the output.
    assign = edges.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    roots = edges.select(F.col("v").alias("doc_id"), F.col("v").alias("cluster_id"))
    return (
        assign.unionByName(roots)
        .groupBy("doc_id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )


def refine_clusters(
    assign: DataFrame,
    scored_pairs: DataFrame,
    score,
    max_size: int,
    strict_threshold: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Split over-merged clusters: any cluster larger than ``max_size``
    is re-clustered using only edges whose ``score`` (a Column over
    ``scored_pairs``) is >= ``strict_threshold``; smaller clusters pass
    through untouched.

    Over-merging is the classic transitive-closure failure mode — one
    borderline pair chains two real entities into a single component. The
    standard production fix is exactly this two-tier scheme (loose
    threshold to recall candidates, strict threshold to re-cut the big
    components), cf. Dedoop/Magellan post-processing.

    Scale notes (100 TB):
      - the oversized-cluster id frame is tiny (clusters > max_size are
        rare by construction) and is BROADCAST to both the membership
        filter and the edge filter — no extra shuffle over the full
        assignment or edge set beyond the two semi-joins.
      - the re-clustering CC runs ONLY on the strong subgraph of the big
        clusters' members (bounded by member count, not corpus size).
      - labels stay min-member-id on both paths, so refined sub-cluster
        ids never collide with pass-through cluster ids (a pass-through
        label is the min over a SUPERSET of any refined sub-cluster).
    """
    sizes = assign.groupBy("cluster_id").agg(F.count("*").alias("_n"))
    big = sizes.where(F.col("_n") > max_size).select("cluster_id")
    bigm = assign.join(F.broadcast(big), "cluster_id").select(id_col)

    strong = scored_pairs.where(score >= strict_threshold).select(
        "doc_id_a", "doc_id_b"
    )
    strong = strong.join(
        F.broadcast(bigm.select(F.col(id_col).alias("doc_id_a"))),
        "doc_id_a",
        "left_semi",
    ).join(
        F.broadcast(bigm.select(F.col(id_col).alias("doc_id_b"))),
        "doc_id_b",
        "left_semi",
    )
    sub = connected_components(strong)
    refined = (
        bigm.join(sub.withColumnRenamed("doc_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )
    keep = assign.join(F.broadcast(big), "cluster_id", "left_anti")
    return keep.select(id_col, "cluster_id").unionByName(refined)


def golden_records(
    clusters: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "doc_text",
    numeric_ids: bool = True,
) -> DataFrame:
    """Survivorship: pick one canonical record per entity cluster.

    The reference stops at cluster assignment (the enrichment join merges
    rows but never elects a representative); a production ER pipeline
    needs the "golden record" — here: the member with the LONGEST
    canonical text (most information), ties broken by smallest doc_id
    (deterministic).

    Scale notes: a single groupBy with map-side combine — the per-group
    state is one (len, id, text) struct, so the combiner reduces each
    cluster to one row per input partition before the shuffle. No window
    (a window over cluster_id would sort whole partitions and cannot
    partial-aggregate). `numeric_ids=True` packs the tie-break into one
    max(struct) via id negation; for string ids the fallback is a two-agg
    join (max len per cluster, then min id among the maximal members).
    """
    j = clusters.select(F.col(id_col).alias("doc_id"), "cluster_id").join(
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
        ),
        "doc_id",
    )
    if numeric_ids:
        best = j.groupBy("cluster_id").agg(
            F.count("*").alias("n_members"),
            F.max(
                F.struct(
                    F.length("_text").alias("text_len"),
                    (-F.col("doc_id")).alias("neg_id"),
                    F.col("_text").alias("text"),
                )
            ).alias("best"),
        )
        return best.select(
            "cluster_id",
            (-F.col("best.neg_id")).alias("rep_doc_id"),
            F.col("best.text_len").alias("rep_text_len"),
            F.col("best.text").alias("rep_text"),
            "n_members",
        )
    lens = j.select("cluster_id", "doc_id", F.length("_text").alias("text_len"), "_text")
    agg1 = lens.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"), F.max("text_len").alias("rep_text_len")
    )
    maximal = lens.join(agg1, "cluster_id").where(
        F.col("text_len") == F.col("rep_text_len")
    )
    return (
        maximal.groupBy("cluster_id", "n_members", "rep_text_len")
        .agg(F.min(F.struct("doc_id", "_text")).alias("best"))
        .select(
            "cluster_id",
            F.col("best.doc_id").alias("rep_doc_id"),
            "rep_text_len",
            F.col("best._text").alias("rep_text"),
            "n_members",
        )
    )


def _source_priority(source: Column) -> Column:
    """Numeric priority of a 'src<digits>' id: the digits as int64, or a
    large sentinel for any other shape (so unparseable sources lose to
    every parseable one, ties broken by the source string). Bounded to 18
    digits so the cast can never overflow — the previous fixed
    substring(4,10)+cast parse silently mis-ranked long or non-numeric
    suffixes and diverged from the SQL twin."""
    digits = F.regexp_extract(source, r"^src(\d{1,18})$", 1)
    return F.when(digits != "", digits.cast("long")).otherwise(
        F.lit(4611686018427387904)
    )


def golden_fields(clusters: DataFrame, docs: DataFrame) -> DataFrame:
    """Field-level survivorship: compose the golden record from DIFFERENT
    members per attribute, each by its own rule — longest text for the
    representative, modal language (ties -> lexicographically smallest),
    highest-priority source (lowest numeric suffix). golden_records picks
    ONE member; real MDM picks per FIELD.

    One groupBy per rule, all max/min(struct) aggregations (map-side
    combinable — no windows, so a 100-million-member cluster still
    partial-aggregates before the shuffle); the modal-language rule needs
    a pre-count, so it is its own two-stage aggregation.
    """
    j = clusters.join(docs, "doc_id")
    rep = j.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.max(
            F.struct(
                F.length("doc_text").alias("l"),
                (-F.col("doc_id")).alias("nid"),
                F.col("doc_text").alias("t"),
            )
        ).alias("r"),
        F.min(
            F.struct(
                _source_priority(F.col("source")).alias("pri"),
                F.col("source").alias("s"),
            )
        ).alias("src"),
    )
    lang_counts = j.groupBy("cluster_id", "lang").agg(F.count("*").alias("n"))
    modal = (
        lang_counts.groupBy("cluster_id")
        .agg(
            F.min(
                F.struct((-F.col("n")).alias("nn"), F.col("lang").alias("lg"))
            ).alias("m")
        )
        .select("cluster_id", F.col("m.lg").alias("modal_lang"))
    )
    return rep.join(modal, "cluster_id").select(
        "cluster_id",
        "n_members",
        F.col("r.t").alias("rep_text"),
        "modal_lang",
        F.col("src.s").alias("best_source"),
    )


def lpa_communities(
    edges: DataFrame,
    nodes: DataFrame,
    rounds: int = 3,
    id_a: str = "doc_id_a",
    id_b: str = "doc_id_b",
    node_col: str = "doc_id",
) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al. 2007),
    made fully deterministic: every round, each node adopts the MOST
    FREQUENT label among its neighbors, ties broken by the SMALLEST
    label; isolated (or neighbor-less this round) nodes keep their label.
    Fixed `rounds` with synchronous updates — no asynchronous order
    dependence, so the result is a pure function of the graph and is
    SQL-replayable round by round.

    vs connected_components: CC merges everything reachable (a single
    weak bridge glues two communities); LPA needs a label to WIN a local
    majority, so dense subgraphs connected by a thin bridge keep distinct
    communities — the cluster-splitting view of the same match graph
    (complements edge_support-based repair, which edits edges instead).

    Scale shape: per round one equi-join (labels onto the symmetric edge
    list, shuffle on node), one groupBy(node, label) with map-side
    combine, one per-node window argmax — all bounded by E; rounds is a
    small constant. Labels never leave the node-id domain, so the frame
    stays (node, label) longs end to end."""
    from pyspark.sql import Window

    sym = edges.select(
        F.col(id_a).alias("u"), F.col(id_b).alias("v")
    ).unionByName(edges.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("label")
    )
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    for _ in range(rounds):
        nb = (
            sym.join(labels.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        best = (
            nb.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select(
                "node", F.coalesce("new_label", "label").alias("label")
            )
            .localCheckpoint(eager=False)
        )
    return labels.select(
        F.col("node").alias(node_col), F.col("label").alias("community")
    )


def lpa_sql_ctes(
    sym_rel: str, nodes_rel: str, rounds: int = 3, node_col: str = "doc_id"
) -> str:
    """DuckDB twin: the same synchronous rounds unrolled into CTEs; final
    relation `lpa_final` has (node, label). `sym_rel` must hold the
    SYMMETRIC edge list as (u, v); `nodes_rel` one row per node."""
    parts = [
        f"lpa_l0 AS (SELECT {node_col} AS node, {node_col} AS label FROM {nodes_rel})"
    ]
    prev = "lpa_l0"
    for r in range(1, rounds + 1):
        parts.append(
            f"lpa_nb{r} AS (SELECT s.v AS node, l.label, count(*) AS cnt "
            f"FROM {sym_rel} s JOIN {prev} l ON s.u = l.node GROUP BY s.v, l.label), "
            f"lpa_b{r} AS (SELECT node, label AS new_label FROM (SELECT node, label, "
            "row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn "
            f"FROM lpa_nb{r}) WHERE rn = 1), "
            f"lpa_l{r} AS (SELECT p.node, coalesce(b.new_label, p.label) AS label "
            f"FROM {prev} p LEFT JOIN lpa_b{r} b USING (node))"
        )
        prev = f"lpa_l{r}"
    parts.append(f"lpa_final AS (SELECT node, label FROM {prev})")
    return ", ".join(parts)
