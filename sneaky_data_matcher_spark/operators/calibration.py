"""Score calibration: binned reliability + EXACT isotonic regression.

A matcher's similarity score is a ranking signal, not a probability; the
review-queue and threshold-picking operators downstream want calibrated
P(match | score). The standard fix (Zadrozny & Elkan 2002 binning;
isotonic regression as in Splink's m/u-to-probability step) is:

  1. bin candidate pairs by score, count truth positives per bin
     (reliability table);
  2. fit the least-squares NON-DECREASING precision curve over the bins —
     isotonic regression with bin counts as weights.

Instead of the sequential pool-adjacent-violators scan (driver-side,
order-dependent — the wrong shape for this engine), the fit uses the
minimax characterization of weighted isotonic regression:

    fit_i = max_{j<=i} min_{k>=i} avg(y, w over bins j..k)

which is pure joins/aggregations over the BIN frame. That frame has at
most ``n_bins`` rows, so the O(B^3) segment lattice is a few thousand
rows of arithmetic — trivially safe — while the corpus-sized work (the
binning groupBy) stays one map-side-combinable aggregation over the
pairs. Both engines compute segment means as single divisions of exact
int64 prefix-sum differences (identical doubles), rounded to 9 before
min/max (exact on rounded values), so the fit is bit-portable.

Scale notes (100 TB): pairs -> bins is the only corpus-bound stage; truth
labeling is the caller's join (typically the scored frame already carries
a label). Nothing here shuffles more than (n_bins) rows after that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def reliability_bins(
    pairs: DataFrame,
    score_col: str = "score",
    label_col: str = "is_match",
    n_bins: int = 20,
) -> DataFrame:
    """(bin, n, n_pos, mean_score, precision): pairs bucketed by
    floor(score * n_bins), clamped so score == 1.0 lands in the top bin.
    ``label_col`` must be 0/1. Only observed bins appear."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        pairs.select(
            b.alias("bin"),
            F.col(score_col).alias("_s"),
            F.col(label_col).cast("long").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("_y").alias("n_pos"),
            F.round(F.avg("_s"), 6).alias("mean_score"),
            F.round(F.sum("_y") / F.count("*"), 6).alias("precision"),
        )
    )


def isotonic_calibration(
    pairs: DataFrame,
    score_col: str = "score",
    label_col: str = "is_match",
    n_bins: int = 20,
) -> DataFrame:
    """(bin, n, n_pos, precision, iso_precision): reliability bins plus
    the exact weighted-isotonic (non-decreasing) fit of precision over
    bins, via fit_i = max_{j<=i} min_{k>=i} segment-mean(j..k).

    The segment lattice runs on the <= n_bins-row bin frame: prefix sums
    (one tiny ordered window), a j<=k self-join for segment means, then a
    bin-in-segment join and two aggregations. All O(n_bins^3) rows of
    driver-free arithmetic."""
    # the bin frame is referenced five times below (lo, hi, lattice, fit,
    # final join); without a checkpoint Catalyst re-derives the corpus-
    # bound binning aggregation once per reference (plan-audited: 5
    # rescans of the pair frame). Lazy localCheckpoint computes it once.
    bins = reliability_bins(pairs, score_col, label_col, n_bins).localCheckpoint(
        eager=False
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pre = bins.select(
        "bin",
        "n",
        "n_pos",
        "precision",
        F.sum("n").over(w).alias("cn"),
        F.sum("n_pos").over(w).alias("cp"),
    )
    lo = pre.select(
        F.col("bin").alias("j"),
        (F.col("cn") - F.col("n")).alias("cn0"),
        (F.col("cp") - F.col("n_pos")).alias("cp0"),
    )
    hi = pre.select(
        F.col("bin").alias("k"), F.col("cn").alias("cn1"), F.col("cp").alias("cp1")
    )
    seg = (
        lo.join(hi, F.col("j") <= F.col("k"))
        .select(
            "j",
            "k",
            F.round(
                (F.col("cp1") - F.col("cp0"))
                / (F.col("cn1") - F.col("cn0")).cast("double"),
                9,
            ).alias("avg"),
        )
    )
    lattice = seg.join(
        pre.select(F.col("bin").alias("i")),
        (F.col("j") <= F.col("i")) & (F.col("i") <= F.col("k")),
    )
    inner = lattice.groupBy("i", "j").agg(F.min("avg").alias("mn"))
    fit = inner.groupBy("i").agg(F.round(F.max("mn"), 6).alias("iso_precision"))
    return (
        bins.join(fit, bins["bin"] == fit["i"])
        .select("bin", "n", "n_pos", "precision", "iso_precision")
    )


def calibration_sql_ctes(
    pairs_rel: str,
    score_expr: str = "score",
    label_expr: str = "is_match",
    n_bins: int = 20,
) -> str:
    """DuckDB twin; final relation ``cal_out`` mirrors
    isotonic_calibration's columns. ``pairs_rel`` must expose the score
    and 0/1 label expressions."""
    return (
        f"cal_b AS (SELECT least(CAST(floor(({score_expr}) * {n_bins}) AS INT), {n_bins - 1}) AS bin, "
        f"  count(*) AS n, CAST(sum({label_expr}) AS BIGINT) AS n_pos, "
        f"  round(avg({score_expr}), 6) AS mean_score, "
        f"  round(CAST(sum({label_expr}) AS DOUBLE) / count(*), 6) AS precision "
        f"  FROM {pairs_rel} GROUP BY 1), "
        "cal_pre AS (SELECT bin, n, n_pos, precision, "
        "  CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn, "
        "  CAST(sum(n_pos) OVER (ORDER BY bin) AS BIGINT) AS cp FROM cal_b), "
        "cal_seg AS (SELECT l.bin AS j, h.bin AS k, "
        "  round(CAST(h.cp - (l.cp - l.n_pos) AS DOUBLE) / (h.cn - (l.cn - l.n)), 9) AS avg "
        "  FROM cal_pre l JOIN cal_pre h ON l.bin <= h.bin), "
        "cal_in AS (SELECT p.bin AS i, s.j, min(s.avg) AS mn "
        "  FROM cal_seg s JOIN cal_pre p ON s.j <= p.bin AND p.bin <= s.k "
        "  GROUP BY 1, 2), "
        "cal_fit AS (SELECT i AS bin, round(max(mn), 6) AS iso_precision FROM cal_in GROUP BY 1), "
        "cal_out AS (SELECT b.bin, b.n, b.n_pos, b.precision, f.iso_precision "
        "  FROM cal_b b JOIN cal_fit f USING (bin))"
    )


def brier_scores(
    pairs: DataFrame,
    calibrated: DataFrame,
    score_col: str = "score",
    label_col: str = "is_match",
    n_bins: int = 20,
) -> DataFrame:
    """One-row frame (n_pairs, brier_raw, brier_iso): mean squared error
    of the raw score vs the isotonic per-bin fit as probability
    estimates. The calibrated map is <= n_bins rows -> broadcast."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    j = pairs.select(
        b.alias("bin"),
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("double").alias("_y"),
    ).join(F.broadcast(calibrated.select("bin", "iso_precision")), "bin")
    return j.agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg((F.col("_s") - F.col("_y")) ** 2), 6).alias("brier_raw"),
        F.round(
            F.avg((F.col("iso_precision") - F.col("_y")) ** 2), 6
        ).alias("brier_iso"),
    )
