"""Linkage-quality evaluation — pairwise confusion metrics and cluster
shape diagnostics.

The reference exposes no evaluation surface at all (its only quality
signal is the implicit LIMIT-1 EQUALS hit in
services/SearchService.java:165); a production matcher needs to report
precision/recall/F1 against whatever ground truth exists (exact-dup
pairs, labeled audits, a high-precision near-dup oracle) and the shape
of the clusters it emits. Both operators here are pure aggregations —
one shuffle each — so they run at any corpus size.

Scale notes (100 TB):
  - `pairwise_confusion` is a full outer join of two bare-id pair sets
    followed by a global count aggregation: the shuffled payload is two
    longs + two booleans per row, and the output is ONE row. No vectors,
    no text travel here.
  - `cluster_size_stats` is two chained aggregations (cluster -> size,
    size -> count), both map-side combinable; output is bounded by the
    number of DISTINCT cluster sizes (tiny even at 10^12 docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _canon_pairs(pairs: DataFrame) -> DataFrame:
    """Normalize a pair frame to (doc_id_a < doc_id_b), distinct."""
    return pairs.select(
        F.least("doc_id_a", "doc_id_b").alias("doc_id_a"),
        F.greatest("doc_id_a", "doc_id_b").alias("doc_id_b"),
    ).distinct()


def pairwise_confusion(pred: DataFrame, truth: DataFrame) -> DataFrame:
    """Pairwise-linkage confusion counts + precision/recall/F1.

    pred, truth: (doc_id_a, doc_id_b) pair frames (orientation-insensitive;
    both are canonicalized and deduped here). Returns ONE row:
    (tp, fp, fn, precision, recall, f1) — counts are exact longs; the
    ratios are single IEEE divisions of those longs (deterministic), F1
    computed from counts directly as 2*tp / (2*tp + fp + fn) so no
    intermediate rounding compounds. True negatives are intentionally
    absent: over n docs there are O(n²) of them and no linkage metric
    uses them.
    """
    p = _canon_pairs(pred).withColumn("in_pred", F.lit(True))
    t = _canon_pairs(truth).withColumn("in_truth", F.lit(True))
    j = p.join(t, ["doc_id_a", "doc_id_b"], "full_outer")
    agg = j.agg(
        F.count(F.when(F.col("in_pred") & F.col("in_truth"), 1)).alias("tp"),
        F.count(
            F.when(F.col("in_pred") & F.col("in_truth").isNull(), 1)
        ).alias("fp"),
        F.count(
            F.when(F.col("in_truth") & F.col("in_pred").isNull(), 1)
        ).alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return agg.select(
        tp,
        fp,
        fn,
        F.round(tp.cast("double") / F.greatest(tp + fp, F.lit(1)), 6).alias(
            "precision"
        ),
        F.round(tp.cast("double") / F.greatest(tp + fn, F.lit(1)), 6).alias(
            "recall"
        ),
        F.round(
            (2 * tp).cast("double") / F.greatest(2 * tp + fp + fn, F.lit(1)), 6
        ).alias("f1"),
    )


def blocking_quality(
    keys: DataFrame, truth: DataFrame, n_records: int
) -> DataFrame:
    """Christen's standard blocking-scheme metrics, per pass and for the
    union of passes ('all'): reduction ratio, pairs completeness, pairs
    quality.

      RR = 1 - |candidates| / C(n_records, 2)   (how much comparison work
                                                 blocking saved)
      PC = |candidates ∩ truth| / |truth|       (recall of the truth pairs
                                                 — what blocking can lose)
      PQ = |candidates ∩ truth| / |candidates|  (precision of the
                                                 candidate set)

    keys: (doc_id, pass, block_key) blocking keys; truth: (doc_id_a,
    doc_id_b) labeled/oracle duplicate pairs. The drop-or-keep evidence
    for each pass: a pass with PC ≈ 0 adds pair mass without recall; the
    'all' row is the scheme as shipped. Complements blocking_pass_report
    (coverage vs the matcher's own matches) with coverage vs EXTERNAL
    truth.

    Scale notes: candidate enumeration is the same per-block self-join the
    pipeline runs (bounded by salting upstream when used for real); counts
    are exact longs, the three ratios single IEEE divisions. Output rows =
    #passes + 1."""
    k = keys.select("doc_id", "pass", "block_key")
    a = k.select("pass", "block_key", F.col("doc_id").alias("doc_id_a"))
    b = k.select("pass", "block_key", F.col("doc_id").alias("doc_id_b"))
    per_pass = (
        a.join(b, ["pass", "block_key"])
        .where(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("pass", "doc_id_a", "doc_id_b")
        .distinct()
    )
    cand = per_pass.unionByName(
        per_pass.select(
            F.lit("all").alias("pass"), "doc_id_a", "doc_id_b"
        ).distinct()
    )
    t = _canon_pairs(truth)
    n_truth = t.count()
    hits = (
        cand.join(t, ["doc_id_a", "doc_id_b"], "left_semi")
        .groupBy("pass")
        .agg(F.count("*").alias("n_truth_hits"))
    )
    total_possible = n_records * (n_records - 1) // 2
    stats = (
        cand.groupBy("pass")
        .agg(F.count("*").alias("n_candidates"))
        .join(hits, "pass", "left")
        .select(
            "pass",
            "n_candidates",
            F.coalesce("n_truth_hits", F.lit(0)).alias("n_truth_hits"),
        )
    )
    return stats.select(
        "pass",
        "n_candidates",
        "n_truth_hits",
        F.round(
            F.lit(1.0)
            - F.col("n_candidates").cast("double") / F.lit(float(total_possible)),
            6,
        ).alias("reduction_ratio"),
        F.round(
            F.col("n_truth_hits").cast("double") / F.lit(float(max(n_truth, 1))), 6
        ).alias("pairs_completeness"),
        F.round(
            F.col("n_truth_hits").cast("double")
            / F.greatest(F.col("n_candidates"), F.lit(1)),
            6,
        ).alias("pairs_quality"),
    )


def capture_recapture_recall(
    tagged_matches: DataFrame, pass_a: str, pass_b: str
) -> DataFrame:
    """Estimate how many TRUE matches the blocking scheme missed — with no
    labeled truth at all — by treating two blocking passes as independent
    capture occasions (Lincoln–Petersen / Chapman, the census estimator
    record-linkage evaluation borrowed from ecology; cf. Winkler's
    coverage work). If pass A finds n_a matches, pass B finds n_b, and
    they agree on n_both, the Chapman estimate of the total match
    population is

        N̂ = (n_a + 1)(n_b + 1) / (n_both + 1) - 1

    and est_missed = N̂ - n_union is the mass NEITHER pass reached. Valid
    insofar as the passes' capture probabilities are independent across
    pairs (different key functions — prefix vs sorted-token — approximate
    this; the caveat ships in the output as the method's standard
    assumption, not hidden).

    tagged_matches: (pass, doc_id_a, doc_id_b) — match pairs attributed to
    every pass that generated them (a pair found by both passes appears
    twice). Output: ONE row of exact counts + the Chapman estimate and
    the implied union completeness.

    Scale: two groupBys over bare id pairs; output is one row."""
    t = tagged_matches.select("pass", "doc_id_a", "doc_id_b").distinct()
    per = (
        t.groupBy("doc_id_a", "doc_id_b")
        .agg(
            F.max(F.when(F.col("pass") == pass_a, 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("pass") == pass_b, 1).otherwise(0)).alias("in_b"),
        )
        .where((F.col("in_a") == 1) | (F.col("in_b") == 1))
    )
    agg = per.agg(
        F.sum("in_a").alias("n_a"),
        F.sum("in_b").alias("n_b"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
        F.count("*").alias("n_union"),
    )
    na, nb, m, nu = (
        F.col("n_a").cast("double"),
        F.col("n_b").cast("double"),
        F.col("n_both").cast("double"),
        F.col("n_union").cast("double"),
    )
    est = (na + 1.0) * (nb + 1.0) / (m + 1.0) - 1.0
    return agg.select(
        "n_a",
        "n_b",
        "n_both",
        "n_union",
        F.round(est, 6).alias("est_total_matches"),
        F.round(F.greatest(est - nu, F.lit(0.0)), 6).alias("est_missed"),
        F.round(F.least(nu / est, F.lit(1.0)), 6).alias("est_completeness"),
    )


WILSON_Z = 1.959964  # ~97.5th normal quantile; shared literal with the twin


def sampled_precision(
    matches: DataFrame,
    truth: DataFrame,
    score_col: str = "score",
    band_width_pct: int = 5,
    k_per_band: int = 50,
    salt: int = 0,
) -> DataFrame:
    """Audit-sample precision estimation for match decisions at a scale
    where labeling everything is impossible: stratify predicted matches by
    score band, draw a DETERMINISTIC k-per-band audit sample (Lehmer-hash
    order — rerun-stable, partition-independent), grade the sample against
    the truth relation (standing in for the clerical reviewer), and report
    per-band precision with a Wilson 95% interval.

    Output: (band_pct, n_pairs, n_sampled, n_true_sampled, p_hat,
    wilson_lo, wilson_hi), one row per non-empty band. The stratified
    corpus-level estimate is sum(n_pairs * p_hat) / sum(n_pairs) —
    computed by the caller/test so the per-band evidence stays visible.

    Scale notes: band assignment is a projection; the only window ranks
    WITHIN a band ordered by the hash, and only to cut off at k — at real
    scale replace with an approximate per-band threshold on the hash
    (keep u < k/n_band) to avoid the sort entirely; counts are exact longs
    and the Wilson terms are IEEE-deterministic expressions of them."""
    from .sampling import lehmer_unit

    band = (F.floor(F.col(score_col) * (100 / band_width_pct)) * band_width_pct).cast(
        "int"
    )
    key = F.col("doc_id_a") * 100000 + F.col("doc_id_b")
    m = matches.select(
        "doc_id_a",
        "doc_id_b",
        band.alias("band_pct"),
        lehmer_unit(key, salt).alias("u"),
    )
    w = Window.partitionBy("band_pct").orderBy(
        F.col("u").asc(), F.col("doc_id_a").asc(), F.col("doc_id_b").asc()
    )
    ranked = m.withColumn("rk", F.row_number().over(w))
    t = _canon_pairs(truth).withColumn("is_true", F.lit(1))
    graded = (
        ranked.where(F.col("rk") <= k_per_band)
        .join(t, ["doc_id_a", "doc_id_b"], "left")
        .groupBy("band_pct")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum(F.coalesce("is_true", F.lit(0))).alias("n_true_sampled"),
        )
    )
    pop = m.groupBy("band_pct").agg(F.count("*").alias("n_pairs"))
    z = F.lit(WILSON_Z)
    n = F.col("n_sampled").cast("double")
    p = F.col("n_true_sampled").cast("double") / n
    denom = F.lit(1.0) + z * z / n
    center = (p + z * z / (F.lit(2.0) * n)) / denom
    half = (
        z
        * F.sqrt(p * (F.lit(1.0) - p) / n + z * z / (F.lit(4.0) * n * n))
        / denom
    )
    return (
        pop.join(graded, "band_pct")
        .select(
            "band_pct",
            "n_pairs",
            "n_sampled",
            "n_true_sampled",
            F.round(p, 6).alias("p_hat"),
            F.round(center - half, 6).alias("wilson_lo"),
            F.round(center + half, 6).alias("wilson_hi"),
        )
    )


def cluster_size_stats(clusters: DataFrame) -> DataFrame:
    """clusters(doc_id, cluster_id) -> (cluster_size, n_clusters, n_docs):
    the cluster-size histogram. Two map-side-combinable aggregations; the
    result is as wide as the number of distinct sizes, so it stays tiny at
    any scale. Singletons count — a matcher that over-merges shows up as
    a fat tail here before any labeled metric moves."""
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        )
    )


def threshold_sweep(
    scored: DataFrame,
    truth: DataFrame,
    score_col: str = "score",
    scale: int = 100,
) -> DataFrame:
    """P/R/F1 at EVERY candidate match threshold in one pass.

    scored: distinct (doc_id_a, doc_id_b, <score_col>) candidate pairs;
    truth: ground-truth pair frame (orientation-insensitive). The score is
    quantized to an integer grid (`floor(score*scale)`, exact on identical
    doubles in any engine), bucketed, and cumulated from the highest bucket
    down, so row t reports the confusion counts of the rule
    "match iff score >= t/scale". Truth pairs the candidate stage never
    surfaced count as fn at every threshold (blocking misses are charged,
    not hidden).

    Scale notes (100 TB): the only pair-sized work is one bare-id left
    join (scored x truth) and ONE groupBy onto <= scale+1 buckets; the
    cumulative window runs over that tiny bucket frame (single partition
    by construction — bounded by `scale`, not the data). Counts are exact
    longs; ratios are single IEEE divisions. This replaces re-running the
    matcher per candidate threshold — the classic threshold-tuning loop —
    with one job.
    """
    s = scored.select(
        F.least("doc_id_a", "doc_id_b").alias("doc_id_a"),
        F.greatest("doc_id_a", "doc_id_b").alias("doc_id_b"),
        F.floor(F.col(score_col) * scale).cast("long").alias("threshold_pct"),
    )
    t = _canon_pairs(truth)
    lab = s.join(
        t.withColumn("is_pos", F.lit(1)), ["doc_id_a", "doc_id_b"], "left"
    ).select("threshold_pct", F.coalesce("is_pos", F.lit(0)).alias("is_pos"))
    buck = lab.groupBy("threshold_pct").agg(
        F.count("*").alias("n_all"), F.sum("is_pos").alias("n_pos")
    )
    w = (
        Window.orderBy(F.col("threshold_pct").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = buck.select(
        "threshold_pct",
        F.sum("n_all").over(w).alias("n_pred"),
        F.sum("n_pos").over(w).alias("tp"),
    )
    tot = t.agg(F.count("*").alias("total_pos"))
    j = cum.crossJoin(F.broadcast(tot))
    tp, npred, totp = F.col("tp"), F.col("n_pred"), F.col("total_pos")
    fp, fn = (npred - tp).alias("fp"), (totp - tp).alias("fn")
    return j.select(
        "threshold_pct",
        npred,
        tp,
        fp,
        fn,
        F.round(tp.cast("double") / F.greatest(npred, F.lit(1)), 6).alias(
            "precision"
        ),
        F.round(tp.cast("double") / F.greatest(totp, F.lit(1)), 6).alias(
            "recall"
        ),
        F.round(
            (2 * tp).cast("double")
            / F.greatest(2 * tp + (npred - tp) + (totp - tp), F.lit(1)),
            6,
        ).alias("f1"),
    )


def blocking_census(keys: DataFrame, max_block_size: int) -> DataFrame:
    """Per-pass blocking diagnostics: block counts, the largest block, the
    candidate-pair mass sum(s*(s-1)/2), and how much of that mass sits in
    over-cap (hot) blocks. This is the number you watch at 100 TB — pair
    mass, not row count, is what explodes when a key degenerates.

    One census aggregation (pass, block_key) -> size, then a per-pass
    rollup; all counts exact longs."""
    census = keys.groupBy("pass", "block_key").agg(F.count("*").alias("sz"))
    pair_mass = (F.col("sz") * (F.col("sz") - 1) / 2).cast("long")
    hot = F.col("sz") > max_block_size
    return (
        census.groupBy("pass")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum("sz").alias("n_keys"),
            F.max("sz").alias("max_block"),
            F.sum(pair_mass).alias("pair_mass"),
            F.count(F.when(hot, 1)).alias("hot_blocks"),
            F.coalesce(F.sum(F.when(hot, pair_mass)), F.lit(0)).alias(
                "hot_pair_mass"
            ),
        )
        .select(
            "pass",
            "n_blocks",
            "n_keys",
            "max_block",
            "pair_mass",
            "hot_blocks",
            "hot_pair_mass",
        )
    )


def bcubed(pred: DataFrame, truth: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """B-cubed precision/recall/F1 between two clusterings (Bagga &
    Baldwin 1998) — the standard ER cluster metric that, unlike pairwise
    F1, weights every RECORD equally instead of every pair (one giant
    cluster can't dominate the score).

    pred/truth: (id_col, cluster_id) assignments over the same records.
    Per record r: precision(r) = |C_pred(r) ∩ C_truth(r)| / |C_pred(r)|,
    recall(r) the same with the roles swapped; the scores are the means.

    Shape without materializing per-record cluster sets: join the two
    assignments on the record, count records per (pred_cluster,
    truth_cluster) CELL — for every record in a cell, the intersection
    size IS the cell count — then join cell counts with the two cluster
    sizes and average. Three groupBys + two bare-id joins, all exact
    longs until two final divisions; the mean is an exact rational of
    decimal-summed per-record fractions quantized to 1e-9 (engine-exact,
    same discipline as operators/fusion.py)."""
    p = pred.select(F.col(id_col).alias("rid"), F.col("cluster_id").alias("pc"))
    t = truth.select(F.col(id_col).alias("rid"), F.col("cluster_id").alias("tc"))
    j = p.join(t, "rid")
    cells = j.groupBy("pc", "tc").agg(F.count("*").alias("cell"))
    psz = p.groupBy("pc").agg(F.count("*").alias("pn"))
    tsz = t.groupBy("tc").agg(F.count("*").alias("tn"))
    per_rec = (
        j.join(cells, ["pc", "tc"])
        .join(psz, "pc")
        .join(tsz, "tc")
        .select(
            F.expr("(cell * 1000000000) DIV pn").alias("prec_n"),
            F.expr("(cell * 1000000000) DIV tn").alias("rec_n"),
        )
    )
    agg = per_rec.agg(
        F.count("*").alias("n"),
        F.sum("prec_n").alias("sp"),
        F.sum("rec_n").alias("sr"),
    )
    prec = F.col("sp").cast("double") / (F.col("n") * 1000000000).cast("double")
    rec = F.col("sr").cast("double") / (F.col("n") * 1000000000).cast("double")
    return agg.select(
        F.col("n").alias("n_records"),
        F.round(prec, 6).alias("bcubed_precision"),
        F.round(rec, 6).alias("bcubed_recall"),
        F.round(2 * prec * rec / (prec + rec), 6).alias("bcubed_f1"),
    )


def bcubed_sql(
    pred_rel: str, truth_rel: str, id_col: str = "doc_id",
    prelude_ctes: str = "", recursive: bool = False,
) -> str:
    """DuckDB twin of bcubed over two (id, cluster_id) relations.
    `prelude_ctes` is spliced in front (same WITH chain); set
    `recursive` when the prelude needs WITH RECURSIVE."""
    kw = "WITH RECURSIVE" if recursive else "WITH"
    pre = f"{prelude_ctes}, " if prelude_ctes else ""
    return (
        f"{kw} {pre}bc_p AS (SELECT {id_col} AS rid, cluster_id AS pc FROM {pred_rel}), "
        f"bc_t AS (SELECT {id_col} AS rid, cluster_id AS tc FROM {truth_rel}), "
        "bc_j AS (SELECT * FROM bc_p JOIN bc_t USING (rid)), "
        "bc_cells AS (SELECT pc, tc, count(*) AS cell FROM bc_j GROUP BY 1, 2), "
        "bc_psz AS (SELECT pc, count(*) AS pn FROM bc_p GROUP BY 1), "
        "bc_tsz AS (SELECT tc, count(*) AS tn FROM bc_t GROUP BY 1), "
        "bc_per AS (SELECT (c.cell * 1000000000) // s.pn AS prec_n, "
        "  (c.cell * 1000000000) // z.tn AS rec_n "
        "  FROM bc_j j JOIN bc_cells c USING (pc, tc) "
        "  JOIN bc_psz s USING (pc) JOIN bc_tsz z USING (tc)), "
        "bc_agg AS (SELECT count(*) AS n, CAST(sum(prec_n) AS BIGINT) AS sp, "
        "  CAST(sum(rec_n) AS BIGINT) AS sr FROM bc_per) "
        "SELECT n AS n_records, "
        "round(CAST(sp AS DOUBLE) / CAST(n * 1000000000 AS DOUBLE), 6) AS bcubed_precision, "
        "round(CAST(sr AS DOUBLE) / CAST(n * 1000000000 AS DOUBLE), 6) AS bcubed_recall, "
        "round(2 * (CAST(sp AS DOUBLE) / CAST(n * 1000000000 AS DOUBLE)) "
        "* (CAST(sr AS DOUBLE) / CAST(n * 1000000000 AS DOUBLE)) "
        "/ ((CAST(sp AS DOUBLE) / CAST(n * 1000000000 AS DOUBLE)) "
        "+ (CAST(sr AS DOUBLE) / CAST(n * 1000000000 AS DOUBLE))), 6) AS bcubed_f1 "
        "FROM bc_agg"
    )


def threshold_valley(
    scores: DataFrame,
    score_col: str = "score",
    bins_per_unit: int = 50,
    min_mode_gap_bins: int = 10,
) -> DataFrame:
    """Unsupervised match-threshold selection: quantize pair scores into
    1/bins_per_unit-wide bins, locate the two dominant modes (the
    non-match mass and the match mass — candidate-score distributions
    are characteristically bimodal), and suggest the threshold at the
    DENSITY VALLEY between them (the classic histogram-dip heuristic;
    labeled alternatives live in threshold_sweep).

    Fully deterministic: modes and the valley break ties toward the
    LOWER bin; bins absent from the census count 0 (the gap is filled
    with a sequence so an empty bin can win the valley). Returns ONE
    row: (mode_lo_bin, mode_hi_bin, valley_bin, valley_count,
    suggested_threshold) with the threshold at the valley bin's upper
    edge. Shape: one groupBy onto <= bins_per_unit*max_score rows, then
    driver-free window argmaxes over that tiny frame."""
    from pyspark.sql import Window

    b = scores.select(
        F.floor(F.col(score_col) * bins_per_unit).cast("long").alias("bin")
    )
    census = b.groupBy("bin").agg(F.count("*").alias("cnt"))
    w_all = Window.orderBy(F.col("cnt").desc(), F.col("bin").asc())
    m1 = (
        census.withColumn("rn", F.row_number().over(w_all))
        .where(F.col("rn") == 1)
        .select(F.col("bin").alias("m1"))
    )
    cand2 = census.crossJoin(F.broadcast(m1)).where(
        F.abs(F.col("bin") - F.col("m1")) >= min_mode_gap_bins
    )
    m2 = (
        cand2.withColumn("rn", F.row_number().over(w_all))
        .where(F.col("rn") == 1)
        .select(F.col("bin").alias("m2"), "m1")
    )
    span = m2.select(
        F.least("m1", "m2").alias("lo"), F.greatest("m1", "m2").alias("hi")
    )
    # guard: Spark's sequence(a, b) runs DESCENDING when a > b (DuckDB's
    # range is empty) — emit no grid rows for adjacent modes instead
    seq = F.when(
        F.col("hi") - 1 >= F.col("lo") + 1,
        F.sequence(F.col("lo") + 1, F.col("hi") - 1),
    )
    grid = span.select("lo", "hi", F.explode(seq).alias("bin"))
    filled = grid.join(census, "bin", "left").select(
        "lo", "hi", "bin", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    w_valley = Window.orderBy(F.col("cnt").asc(), F.col("bin").asc())
    valley = (
        filled.withColumn("rn", F.row_number().over(w_valley))
        .where(F.col("rn") == 1)
    )
    return valley.select(
        F.col("lo").alias("mode_lo_bin"),
        F.col("hi").alias("mode_hi_bin"),
        F.col("bin").alias("valley_bin"),
        F.col("cnt").alias("valley_count"),
        ((F.col("bin") + 1).cast("double") / bins_per_unit).alias(
            "suggested_threshold"
        ),
    )


def threshold_valley_sql(
    scores_rel: str,
    score_col: str = "score",
    bins_per_unit: int = 50,
    min_mode_gap_bins: int = 10,
) -> str:
    """DuckDB twin of threshold_valley (same tie-breaks, same gap fill)."""
    return (
        f"WITH tv_b AS (SELECT CAST(floor({score_col} * {bins_per_unit}) AS BIGINT) AS bin "
        f"FROM {scores_rel}), "
        "tv_census AS (SELECT bin, count(*) AS cnt FROM tv_b GROUP BY bin), "
        "tv_m1 AS (SELECT bin AS m1 FROM (SELECT bin, row_number() OVER "
        "(ORDER BY cnt DESC, bin ASC) AS rn FROM tv_census) WHERE rn = 1), "
        "tv_m2 AS (SELECT bin AS m2, m1 FROM (SELECT c.bin, c.cnt, m.m1, "
        "row_number() OVER (ORDER BY c.cnt DESC, c.bin ASC) AS rn "
        f"FROM tv_census c CROSS JOIN tv_m1 m WHERE abs(c.bin - m.m1) >= {min_mode_gap_bins}) "
        "WHERE rn = 1), "
        "tv_span AS (SELECT least(m1, m2) AS lo, greatest(m1, m2) AS hi FROM tv_m2), "
        "tv_grid AS (SELECT s.lo, s.hi, g.bin FROM tv_span s, "
        "  (SELECT unnest(range((SELECT lo + 1 FROM tv_span), (SELECT hi FROM tv_span))) AS bin) g), "
        "tv_filled AS (SELECT g.lo, g.hi, g.bin, coalesce(c.cnt, 0) AS cnt "
        "FROM tv_grid g LEFT JOIN tv_census c USING (bin)) "
        "SELECT lo AS mode_lo_bin, hi AS mode_hi_bin, bin AS valley_bin, "
        f"cnt AS valley_count, CAST(bin + 1 AS DOUBLE) / {bins_per_unit} AS suggested_threshold "
        "FROM (SELECT *, row_number() OVER (ORDER BY cnt ASC, bin ASC) AS rn FROM tv_filled) "
        "WHERE rn = 1"
    )
