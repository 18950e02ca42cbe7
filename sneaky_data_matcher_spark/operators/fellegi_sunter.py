"""Fellegi–Sunter probabilistic record linkage — agreement patterns,
m/u estimation (supervised counts and unsupervised EM), and per-pair
match weights.

The reference scores a probe by exact key equality only
(services/SearchService.java:165); the classical generalization
(Fellegi & Sunter 1969; Winkler's EM formulation) assigns each
candidate pair an agreement LEVEL per comparison feature, estimates
  m_f[l] = P(level l on feature f | pair is a match)
  u_f[l] = P(level l on feature f | pair is a non-match)
and scores pairs by the log-likelihood ratio
  W = sum_f log2( m_f[l_f] / u_f[l_f] ).

Scale notes (100 TB):
  - Levels are native CASE expressions over the already-computed
    similarity columns — no extra shuffle.
  - Supervised estimation is ONE melt + ONE groupBy over candidate
    pairs; the output is features x levels x 2 rows (tiny).
  - EM never iterates over pairs: candidate pairs are first reduced to
    DISTINCT-PATTERN COUNTS (at most prod(levels) rows — 27 here), and
    EM runs driver-side on that contingency table. One aggregation
    scan regardless of iteration count; this is the only correct shape
    at 10^12 pairs (an EM that rescans pairs per iteration is 20
    scans).
  - Weight application is a broadcast join of the (tiny) weights table
    pivoted per feature, summed in a FIXED expression order so the
    result is bit-deterministic and oracle-checkable.

Determinism: probabilities are single IEEE divisions of exact longs;
weights are floor-quantized to 6 decimals (floor avoids round-half tie
semantics differing across engines); the pair weight sums the QUANTIZED
per-feature weights left-to-right in declared feature order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# feature -> descending (threshold, level) cut points; below all -> 0.
# Levels bin the scoring operator's similarity columns (operators/
# scoring.py): jw and lev_ratio in [0,1], tok_jaccard in [0,1].
DEFAULT_BINS: dict[str, list[tuple[float, int]]] = {
    "jw": [(0.95, 2), (0.85, 1)],
    "tok_jaccard": [(0.6, 2), (0.3, 1)],
    "lev_ratio": [(0.75, 2), (0.5, 1)],
}
N_LEVELS = 3


def level_expr(col: str, bins: list[tuple[float, int]]) -> F.Column:
    e = None
    for thr, lvl in bins:
        e = (
            F.when(F.col(col) >= thr, F.lit(lvl))
            if e is None
            else e.when(F.col(col) >= thr, F.lit(lvl))
        )
    return e.otherwise(F.lit(0))


def agreement_levels(
    scored: DataFrame, bins: dict[str, list[tuple[float, int]]] | None = None
) -> DataFrame:
    """Add one `<feature>_lvl` int column per binned feature. Pure
    projection — no shuffle."""
    bins = bins or DEFAULT_BINS
    out = scored
    for feat, cuts in bins.items():
        out = out.withColumn(f"{feat}_lvl", level_expr(feat, cuts))
    return out


def estimate_mu_supervised(
    levels: DataFrame,
    labels: DataFrame,
    features: list[str] | None = None,
    n_levels: int = N_LEVELS,
) -> DataFrame:
    """Supervised m/u from labeled candidate pairs.

    levels: (doc_id_a, doc_id_b, <f>_lvl ...); labels: (doc_id_a,
    doc_id_b, is_match boolean). Laplace-smoothed so empty cells stay
    finite: m_f[l] = (c_match[f,l] + 1) / (n_match + n_levels), same for
    u. Output long-format: (feature, level, m_prob, u_prob, weight) with
    weight = floor6(log2(m/u)). One melt-explode + one groupBy; output
    size = |features| x n_levels.
    """
    features = features or [c[: -len("_lvl")] for c in levels.columns if c.endswith("_lvl")]
    lab = levels.join(labels, ["doc_id_a", "doc_id_b"])
    melted = lab.select(
        "is_match",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f).alias("feature"),
                        F.col(f"{f}_lvl").alias("level"),
                    )
                    for f in features
                ]
            )
        ).alias("fl"),
    ).select("is_match", "fl.feature", "fl.level")
    counts = melted.groupBy("feature", "level").agg(
        F.count(F.when(F.col("is_match"), 1)).alias("c_m"),
        F.count(F.when(~F.col("is_match"), 1)).alias("c_u"),
    )
    # totals are per-feature constants (= labeled pair counts); derive them
    # from the same aggregation rather than a second pass over pairs
    totals = counts.groupBy("feature").agg(
        F.sum("c_m").alias("n_m"), F.sum("c_u").alias("n_u")
    )
    # densify: every (feature, level) cell exists even when unobserved
    grid = (
        totals.select("feature", "n_m", "n_u")
        .crossJoin(
            levels.sparkSession.range(n_levels).select(
                F.col("id").cast("int").alias("level")
            )
        )
        .join(counts, ["feature", "level"], "left")
        .fillna(0, ["c_m", "c_u"])
    )
    m = (F.col("c_m") + 1).cast("double") / (F.col("n_m") + n_levels).cast("double")
    u = (F.col("c_u") + 1).cast("double") / (F.col("n_u") + n_levels).cast("double")
    w = F.floor(F.log2(m / u) * 1e6) / 1e6
    return grid.select(
        "feature",
        "level",
        m.alias("m_prob"),
        u.alias("u_prob"),
        w.alias("weight"),
    )


def match_weights(
    levels: DataFrame, weights: DataFrame, features: list[str]
) -> DataFrame:
    """Per-pair Fellegi–Sunter weight: sum of the per-feature quantized
    weights, added in DECLARED feature order (bit-deterministic). The
    weights table is tiny (features x levels) and broadcast per feature."""
    out = levels
    for f in features:
        wf = weights.where(F.col("feature") == f).select(
            F.col("level").alias(f"{f}_lvl"), F.col("weight").alias(f"w_{f}")
        )
        out = out.join(F.broadcast(wf), f"{f}_lvl")
    total = None
    for f in features:
        total = F.col(f"w_{f}") if total is None else total + F.col(f"w_{f}")
    return out.select(
        "doc_id_a", "doc_id_b", *[f"{f}_lvl" for f in features], total.alias("fs_weight")
    )


def pattern_counts(levels: DataFrame, features: list[str]) -> DataFrame:
    """Reduce candidate pairs to distinct-agreement-pattern counts — the
    sufficient statistic for EM. Output ≤ n_levels^|features| rows."""
    return levels.groupBy(*[f"{f}_lvl" for f in features]).agg(
        F.count("*").alias("n_pairs")
    )


def em_estimate_mu(
    patterns: list[tuple],
    features: list[str],
    n_levels: int = N_LEVELS,
    n_iter: int = 50,
    init_lambda: float = 0.1,
) -> dict:
    """Unsupervised EM on the (tiny, collected) pattern contingency
    table: latent 2-class model with conditionally-independent
    categorical features (Winkler 1988's formulation). `patterns` is a
    list of (lvl_f1, ..., lvl_fk, n_pairs) tuples — at most
    n_levels^k rows, so this is pure driver-side float math:
    deterministic, no RNG, no Spark iteration.

    Init breaks the label-swap symmetry by seeding the match class to
    prefer HIGH levels (monotone in level), the canonical choice.
    Returns {"lambda": float, "m": {feat: [p0..]}, "u": {...}}.
    """
    k = len(features)
    rows = [(tuple(p[:k]), int(p[k])) for p in patterns]
    # monotone-in-level init, normalized
    def _init(hi: bool) -> dict[str, list[float]]:
        out = {}
        for f in features:
            raw = [
                (lvl + 1.0) if hi else (n_levels - lvl + 0.0)
                for lvl in range(n_levels)
            ]
            s = sum(raw)
            out[f] = [r / s for r in raw]
        return out

    lam = init_lambda
    m, u = _init(True), _init(False)
    for _ in range(n_iter):
        # E-step: responsibility of the match class per pattern
        resp = []
        for lv, n in rows:
            pm, pu = lam, 1.0 - lam
            for i, f in enumerate(features):
                pm *= m[f][lv[i]]
                pu *= u[f][lv[i]]
            tot = pm + pu
            resp.append((lv, n, pm / tot if tot > 0 else 0.5))
        # M-step with Laplace smoothing (mirrors the supervised estimator)
        nm = sum(n * r for _, n, r in resp)
        nu = sum(n * (1.0 - r) for _, n, r in resp)
        n_all = nm + nu
        lam = nm / n_all if n_all else init_lambda
        for i, f in enumerate(features):
            cm = [0.0] * n_levels
            cu = [0.0] * n_levels
            for lv, n, r in resp:
                cm[lv[i]] += n * r
                cu[lv[i]] += n * (1.0 - r)
            m[f] = [(c + 1.0) / (nm + n_levels) for c in cm]
            u[f] = [(c + 1.0) / (nu + n_levels) for c in cu]
    return {"lambda": lam, "m": m, "u": u}


def em_weights_frame(spark, em: dict, features: list[str], n_levels: int = N_LEVELS) -> DataFrame:
    """Materialize EM-estimated m/u as the same (feature, level, m_prob,
    u_prob, weight) frame the supervised estimator emits, so
    `match_weights` consumes either interchangeably."""
    import math

    rows = []
    for f in features:
        for lvl in range(n_levels):
            m, u = em["m"][f][lvl], em["u"][f][lvl]
            w = math.floor(math.log2(m / u) * 1e6) / 1e6
            rows.append((f, lvl, m, u, w))
    return spark.createDataFrame(
        rows, "feature string, level int, m_prob double, u_prob double, weight double"
    )
