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


# Dedicated level for comparisons where the feature value is missing on
# either side (Splink's null-level convention): NULL must NOT collapse
# into "disagree" (that biases m downward and u upward for the feature);
# instead it is its own level, EXCLUDED from m/u estimation and worth
# weight 0 at scoring time ("no evidence either way").
NULL_LEVEL = -1


def level_expr(
    col: str, bins: list[tuple[float, int]], null_level: int | None = None
) -> F.Column:
    e = None
    if null_level is not None:
        e = F.when(F.col(col).isNull(), F.lit(null_level))
    for thr, lvl in bins:
        cond = F.col(col) >= thr
        e = F.when(cond, F.lit(lvl)) if e is None else e.when(cond, F.lit(lvl))
    return e.otherwise(F.lit(0))


def agreement_levels(
    scored: DataFrame,
    bins: dict[str, list[tuple[float, int]]] | None = None,
    null_level: int | None = None,
) -> DataFrame:
    """Add one `<feature>_lvl` int column per binned feature. Pure
    projection — no shuffle. Pass ``null_level=NULL_LEVEL`` when features
    can be missing (default None keeps the historical NULL->level-0
    mapping for never-null features)."""
    bins = bins or DEFAULT_BINS
    out = scored
    for feat, cuts in bins.items():
        out = out.withColumn(f"{feat}_lvl", level_expr(feat, cuts, null_level))
    return out


def estimate_mu_supervised(
    levels: DataFrame,
    labels: DataFrame,
    features: list[str] | None = None,
    n_levels: int = N_LEVELS,
    exclude_level: int | None = None,
) -> DataFrame:
    """Supervised m/u from labeled candidate pairs.

    levels: (doc_id_a, doc_id_b, <f>_lvl ...); labels: (doc_id_a,
    doc_id_b, is_match boolean). Laplace-smoothed so empty cells stay
    finite: m_f[l] = (c_match[f,l] + 1) / (n_match + n_levels), same for
    u. Output long-format: (feature, level, m_prob, u_prob, weight) with
    weight = floor6(log2(m/u)). One melt-explode + one groupBy; output
    size = |features| x n_levels.

    ``exclude_level`` (typically NULL_LEVEL) drops that level's rows
    from the melt BEFORE counting, so a feature's m/u normalize over its
    OBSERVED comparisons only — a missing field then neither supports
    nor opposes a match (per-feature totals differ when missingness
    differs per feature; that is the point).
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
    if exclude_level is not None:
        melted = melted.where(F.col("level") != exclude_level)
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
    weights table is tiny (features x levels) and broadcast per feature.

    Levels absent from the weights table (the NULL_LEVEL convention —
    missing field values) contribute weight 0 via the left join +
    coalesce, instead of silently DROPPING the pair as the old inner
    join would."""
    out = levels
    for f in features:
        wf = weights.where(F.col("feature") == f).select(
            F.col("level").alias(f"{f}_lvl"), F.col("weight").alias(f"w_{f}")
        )
        out = out.join(F.broadcast(wf), f"{f}_lvl", "left")
    total = None
    for f in features:
        t = F.coalesce(F.col(f"w_{f}"), F.lit(0.0))
        total = t if total is None else total + t
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
    rows = sorted((tuple(p[:k]), int(p[k])) for p in patterns)
    # Canonical pattern order: float folds below depend on summation
    # order, so sorting makes the result independent of the collect()
    # order AND lets the SQL twin (`em_weights_sql_ctes`) reproduce
    # every intermediate bit-for-bit with ordered list folds.
    lam = init_lambda
    m = _em_init(features, n_levels, True)
    u = _em_init(features, n_levels, False)
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


def _em_init(features: list[str], n_levels: int, hi: bool) -> dict[str, list[float]]:
    """The monotone-in-level init used by `em_estimate_mu`, factored out
    so the SQL twin embeds the SAME IEEE doubles as literals."""
    out = {}
    for f in features:
        raw = [
            (lvl + 1.0) if hi else (n_levels - lvl + 0.0) for lvl in range(n_levels)
        ]
        s = sum(raw)
        out[f] = [r / s for r in raw]
    return out


def em_weights_sql_ctes(
    features: list[str],
    n_levels: int = N_LEVELS,
    n_iter: int = 50,
    init_lambda: float = 0.1,
    pat_rel: str = "pat",
) -> str:
    """DuckDB twin of `em_estimate_mu` + `em_weights_frame`: the EM loop
    UNROLLED into one CTE pair per iteration over the pattern
    contingency table `pat_rel(<f>_lvl ..., n_pairs)`.

    Bit-for-bit float parity with the Python EM:
      - init probabilities are embedded as repr() literals parsed via
        CAST('…' AS DOUBLE) (correctly-rounded string->double, no
        decimal intermediate);
      - the E-step product multiplies left-to-right in declared feature
        order, exactly like the Python `pm *= m[f][lv]` loop;
      - every M-step sum is an ORDERED left fold
        (list_reduce over list(x ORDER BY l0..lk)) in the same
        canonical pattern order `em_estimate_mu` sorts into, because
        float addition is not associative.
    The resulting CTE `em_weights(feature, level, m_prob, u_prob,
    weight)` matches `em_weights_frame` exactly. Output CTE chain has
    O(n_iter) CTEs over <= n_levels^k rows each — trivial for DuckDB.
    """
    k = len(features)
    lc = [f"l{i}" for i in range(k)]
    order = ", ".join(lc)

    def lit(x: float) -> str:
        return f"CAST('{x!r}' AS DOUBLE)"

    def fold(expr: str, flt: str | None = None) -> str:
        f = f" FILTER (WHERE {flt})" if flt else ""
        return (
            f"coalesce(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list({expr} ORDER BY {order}){f}), (a, b) -> a + b), CAST(0 AS DOUBLE))"
        )

    m0 = _em_init(features, n_levels, True)
    u0 = _em_init(features, n_levels, False)
    init_cols = [f"{lit(init_lambda)} AS lam"]
    for pref, vals in (("m", m0), ("u", u0)):
        for f in features:
            for lvl in range(n_levels):
                init_cols.append(f"{lit(vals[f][lvl])} AS {pref}_{f}_{lvl}")
    pat_cols = ", ".join(f"{f}_lvl AS l{i}" for i, f in enumerate(features))
    ctes = [
        f"empat AS (SELECT {pat_cols}, n_pairs AS n FROM {pat_rel})",
        f"mu_0 AS (SELECT {', '.join(init_cols)})",
    ]

    def sel(pref: str, i: int, f: str) -> str:
        whens = " ".join(
            f"WHEN {lvl} THEN mu.{pref}_{f}_{lvl}" for lvl in range(n_levels - 1)
        )
        return f"CASE p.l{i} {whens} ELSE mu.{pref}_{f}_{n_levels - 1} END"

    for it in range(1, n_iter + 1):
        pm = " * ".join(["mu.lam"] + [sel("m", i, f) for i, f in enumerate(features)])
        pu = " * ".join(
            ["(1.0 - mu.lam)"] + [sel("u", i, f) for i, f in enumerate(features)]
        )
        ctes.append(
            f"resp_{it} AS MATERIALIZED (SELECT {order}, n, "
            "CASE WHEN pm + pu > 0 THEN pm / (pm + pu) ELSE 0.5 END AS r "
            f"FROM (SELECT p.*, {pm} AS pm, {pu} AS pu "
            f"FROM empat p CROSS JOIN mu_{it - 1} mu))"
        )
        aggs = [
            f"{fold('n * r')} AS nm",
            f"{fold('n * (1.0 - r)')} AS nu",
        ]
        for i, f in enumerate(features):
            for lvl in range(n_levels):
                aggs.append(f"{fold('n * r', f'l{i} = {lvl}')} AS cm_{f}_{lvl}")
                aggs.append(
                    f"{fold('n * (1.0 - r)', f'l{i} = {lvl}')} AS cu_{f}_{lvl}"
                )
        outs = [
            f"CASE WHEN nm + nu <> 0 THEN nm / (nm + nu) "
            f"ELSE {lit(init_lambda)} END AS lam"
        ]
        for f in features:
            for lvl in range(n_levels):
                outs.append(
                    f"(cm_{f}_{lvl} + 1.0) / (nm + {float(n_levels)!r}) AS m_{f}_{lvl}"
                )
        for f in features:
            for lvl in range(n_levels):
                outs.append(
                    f"(cu_{f}_{lvl} + 1.0) / (nu + {float(n_levels)!r}) AS u_{f}_{lvl}"
                )
        ctes.append(
            f"mu_{it} AS MATERIALIZED (SELECT {', '.join(outs)} "
            f"FROM (SELECT {', '.join(aggs)} FROM resp_{it}))"
        )
    finals = []
    for f in features:
        for lvl in range(n_levels):
            finals.append(
                f"SELECT '{f}' AS feature, {lvl} AS level, m_{f}_{lvl} AS m_prob, "
                f"u_{f}_{lvl} AS u_prob, floor(log2(m_{f}_{lvl} / u_{f}_{lvl}) "
                f"* 1000000) / 1000000 AS weight FROM mu_{n_iter}"
            )
    ctes.append("em_weights AS (" + " UNION ALL ".join(finals) + ")")
    return ", ".join(ctes)


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


# ---------------------------------------------------------------------------
# Term-frequency adjustment (r3)
# ---------------------------------------------------------------------------

def tf_adjusted_weights(
    pairs: DataFrame,
    values: DataFrame,
    id_a: str = "doc_id_a",
    id_b: str = "doc_id_b",
    val_col: str = "val",
) -> DataFrame:
    """Splink-style term-frequency adjustment for exact agreement on a
    field VALUE. The field-average u-probability treats agreement on
    "SMITH" and on "ZWICKY" as equally informative; in truth
      u_v = P(two random records share value v | one has v) = p_v,
    so the value-specific correction to the field weight is
      tf_adj(v) = log2(u_field / p_v),  u_field = sum_v p_v^2
    (positive for rare values, negative for common ones). With exact
    counts, u_field / p_v = sum_v(n_v^2) / (N * n_v) — a ratio of exact
    longs, so both engines hit identical doubles before the one log2.

    `pairs` holds candidate pairs that AGREE exactly on `val_col`;
    `values` holds one row per record with its field value. Returns
    (id_a, id_b, val, n_v, tf_adj) with tf_adj floor-quantized to 6
    decimals (the module's weight-quantization convention).

    Scale shape: the value census is one groupBy on the field (map-side
    combine); corpus totals reduce to ONE broadcast row; the per-pair
    join keys on the value — the same distribution the blocking key
    already induced, and hot values ARE hot blocks, so blocking.salt_keys
    composes upstream. sum(n_v^2) overflows int64 only past ~3B rows of
    a single value; at that point widen to DECIMAL(38,0) on both engines.
    """
    census = values.groupBy(val_col).agg(F.count("*").alias("n_v"))
    stats = census.agg(
        F.sum("n_v").alias("n_total"),
        F.sum(F.col("n_v") * F.col("n_v")).alias("sum_sq"),
    )
    tf = F.log2(
        F.col("sum_sq").cast("double")
        / (F.col("n_total") * F.col("n_v")).cast("double")
    )
    return (
        pairs.join(census, val_col)
        .crossJoin(F.broadcast(stats))
        .select(
            id_a,
            id_b,
            val_col,
            "n_v",
            (F.floor(tf * 1000000) / 1000000).alias("tf_adj"),
        )
    )


def tf_adjusted_weights_sql(
    pairs_rel: str, values_rel: str, id_a: str = "doc_id_a",
    id_b: str = "doc_id_b", val_col: str = "val", prelude_ctes: str = "",
) -> str:
    """DuckDB twin of tf_adjusted_weights (same exact-integer ratio,
    same floor quantization). `pairs_rel`/`values_rel` are relation
    names with the same columns; `prelude_ctes` (optional) is spliced
    in front so callers can define them in the same WITH chain."""
    pre = f"{prelude_ctes}, " if prelude_ctes else ""
    return (
        f"WITH {pre}tf_census AS (SELECT {val_col}, count(*) AS n_v "
        f"FROM {values_rel} GROUP BY {val_col}), "
        "tf_stats AS (SELECT CAST(sum(n_v) AS BIGINT) AS n_total, "
        "CAST(sum(n_v * n_v) AS BIGINT) AS sum_sq FROM tf_census) "
        f"SELECT p.{id_a}, p.{id_b}, p.{val_col}, c.n_v, "
        "floor(log2(CAST(s.sum_sq AS DOUBLE) / CAST(s.n_total * c.n_v AS DOUBLE)) "
        "* 1000000) / 1000000 AS tf_adj "
        f"FROM {pairs_rel} p JOIN tf_census c USING ({val_col}) CROSS JOIN tf_stats s"
    )
