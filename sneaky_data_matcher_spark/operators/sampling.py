"""Deterministic sampling + training-mixture weighting.

The reference has no sampling (it always processes full uploads), but a
100 TB training-data pipeline lives on it: reproducible subsets for
ablations, and per-domain/per-language resampling to hit a target data
mixture. Everything here is a pure projection/broadcast-join — no RNG, no
shuffle of the corpus — and the hash is the portable double-Lehmer mix
(same family as operators/ann.py LSH_*), so a DuckDB oracle reproduces
every kept row bit-for-bit.

Scale notes (100 TB):
  - :func:`deterministic_sample` is a WHERE clause — fully pushed into the
    scan, zero shuffles, and stable across reruns/partitionings (the keep
    decision is a function of the key alone, not of row order or
    partition assignment, unlike ``df.sample`` whose output depends on
    the split layout).
  - :func:`mixture_weights` aggregates a census of (stratum, count) —
    a map-side-combined groupBy over a single column; the census (rows =
    #strata, tiny) is then normalized via a broadcast of its own 1-row
    totals, never a single-partition window.
  - :func:`stratified_sample` broadcasts that census back; the corpus
    side stays a scan + filter.
  - keys must be non-negative (synthetic ids are); the Lehmer step needs
    ``x % M`` first so the 64-bit product never overflows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LEHMER_M = 2147483647  # 2^31 - 1 (Mersenne prime), shared with ann.py
LEHMER_A = 48271


def lehmer_unit(key: Column, salt: int = 0) -> Column:
    """Deterministic uniform-ish double in [0, 1) from an integer key:
    two Park-Miller steps over (key + salt). Portable integer arithmetic
    (DuckDB twin: the same two ``% 2147483647`` multiplies)."""
    x = (key.cast("long") + F.lit(salt)) % LEHMER_M
    h = (x * LEHMER_A) % LEHMER_M
    h = (h * LEHMER_A) % LEHMER_M
    return h.cast("double") / F.lit(float(LEHMER_M))


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: int = 0
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-key: rerun-stable,
    partition-layout-independent, and disjoint across salts (change the
    salt to draw an independent subset, e.g. train/holdout splits)."""
    return df.where(lehmer_unit(F.col(key_col), salt) < fraction)


def _target_share_expr(targets: dict[str, float]) -> "F.Column":
    tot = float(sum(targets.values()))
    expr = None
    for k, v in sorted(targets.items()):
        if expr is None:
            expr = F.when(F.col("stratum") == k, F.lit(v / tot))
        else:
            expr = expr.when(F.col("stratum") == k, F.lit(v / tot))
    return expr.otherwise(F.lit(0.0))


def mixture_weights(
    df: DataFrame,
    stratum_col: str,
    targets: dict[str, float] | None = None,
) -> DataFrame:
    """Per-stratum keep-probabilities that reshape the corpus toward a
    target mixture while retaining as much data as possible.

    ``targets`` maps stratum -> desired proportion (need not sum to 1; it
    is normalized). Default: uniform over the observed strata. The weight
    for stratum s with observed share p_s and target share t_s is
    ``(t_s / p_s) / max_s(t_s / p_s)`` — the largest ratio is pinned to
    keep-everything (1.0), so expected sampled counts are proportional to
    the targets with no stratum oversampled past its data.

    Output: (stratum, n_rows, observed_share, target_share, weight).
    """
    # The census is referenced three times below (shares, totals, max
    # ratio); without a checkpoint Catalyst re-derives it from scratch and
    # the corpus gets scanned 4x for a #strata-row frame. Lazy
    # localCheckpoint computes it once and shares it.
    census = (
        df.groupBy(F.col(stratum_col).alias("stratum"))
        .agg(F.count("*").alias("n_rows"))
        .localCheckpoint(eager=False)
    )
    if targets:
        target_share = _target_share_expr(targets)
    else:
        target_share = F.lit(1.0) / F.col("n_strata")
    shares = census.crossJoin(
        F.broadcast(
            census.agg(
                F.sum("n_rows").alias("total"), F.count("*").alias("n_strata")
            )
        )
    ).select(
        "stratum",
        "n_rows",
        (F.col("n_rows").cast("double") / F.col("total")).alias("observed_share"),
        target_share.alias("target_share"),
    )
    ratio = F.col("target_share") / F.col("observed_share")
    maxed = shares.crossJoin(
        F.broadcast(
            shares.agg(
                F.max(
                    F.col("target_share") / F.col("observed_share")
                ).alias("max_ratio")
            )
        )
    )
    return maxed.select(
        "stratum",
        "n_rows",
        F.round("observed_share", 9).alias("observed_share"),
        F.round("target_share", 9).alias("target_share"),
        F.round(ratio / F.col("max_ratio"), 9).alias("weight"),
    )


def cluster_split(
    assign: DataFrame,
    splits: list[tuple[str, float]] | None = None,
    key_col: str = "cluster_id",
    salt: int = 0,
) -> DataFrame:
    """Leakage-safe train/val/test split: the split decision is a pure
    function of the CLUSTER key, so every member of an entity (and
    therefore every near-duplicate the matcher found) lands in the same
    split — the standard guard against train/eval contamination that
    row-level splitting of a deduplicated-but-clustered corpus violates
    (eval examples with a near-twin in train inflate benchmark scores;
    cf. the decontamination operator, which handles EXTERNAL benchmarks,
    while this handles internal holdouts).

    ``splits`` is an ordered list of (name, weight); weights are
    normalized and carved as half-open cumulative intervals of the
    cluster key's Lehmer unit, so the assignment is rerun-stable,
    partition-independent, and portable to the DuckDB twin bit-for-bit.

    Scale: a broadcast-free projection — one Lehmer expression and a CASE
    chain per row, fully codegen'd; no shuffle, no census."""
    splits = splits or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    tot = float(sum(w for _, w in splits))
    u = lehmer_unit(F.col(key_col), salt)
    expr = None
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w / tot
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return assign.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    targets: dict[str, float] | None = None,
    salt: int = 0,
) -> DataFrame:
    """Resample the corpus toward the target mixture: broadcast the
    per-stratum weights from :func:`mixture_weights` and keep rows where
    the key's Lehmer unit falls under the stratum weight."""
    w = F.broadcast(
        mixture_weights(df, stratum_col, targets).select(
            F.col("stratum").alias(stratum_col), "weight"
        )
    )
    return (
        df.join(w, stratum_col)
        .where(lehmer_unit(F.col(key_col), salt) < F.col("weight"))
        .drop("weight")
    )
