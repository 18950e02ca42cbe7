"""Column profiling — the "what's in this table" pass a 100 TB ingest
runs before anything else.

The reference exposes a pre-scan row count and per-column value indexes
(services/UploadService.java pre-count + repositories/IndexManager.java
per-column index) but no statistics; this operator produces the per-column
profile (null count, exact/approx distinct, numeric min/max, string
length stats) that drives blocking-key choice and skew planning.

Scale notes (100 TB): ONE scan — every per-column metric is an aggregate
expression in a single `agg()` (Catalyst evaluates them all in one
whole-stage-codegen pass with partial aggregation); the result is one row,
unpivoted driver-side via an in-plan `stack`. Exact count(DISTINCT) over
many columns expands rows K-fold in the shuffle (Spark's Expand operator),
so the scale path is `approx=True` -> approx_count_distinct (HLL++, one
pass, no expand); the exact form is kept for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile(df: DataFrame, cols: list[str] | None = None, approx: bool = False) -> DataFrame:
    """Per-column profile -> (column, n_rows, n_null, n_distinct,
    min_num, max_num, avg_len). min/max/avg_len are NULL where the type
    has no such metric (numeric -> min/max, string -> avg_len)."""
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"))
        if approx:
            aggs.append(F.approx_count_distinct(c).alias(f"{c}__dist"))
        else:
            aggs.append(F.countDistinct(c).alias(f"{c}__dist"))
        if dtypes[c] in _NUMERIC:
            aggs.append(F.min(F.col(c).cast("double")).alias(f"{c}__min"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"{c}__max"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__avglen"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__max"))
            aggs.append(
                F.round(F.avg(F.length(F.col(c).cast("string"))), 6).alias(
                    f"{c}__avglen"
                )
            )
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__null`, `{c}__dist`, `{c}__min`, `{c}__max`, `{c}__avglen`"
        for c in cols
    )
    return one.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_null, n_distinct, min_num, max_num, avg_len)",
    ).select("column", "n_rows", "n_null", "n_distinct", "min_num", "max_num", "avg_len")


def profile_sql(table: str, cols: list[str], numeric: set[str]) -> str:
    """DuckDB twin of `profile(approx=False)`: one subselect per column,
    UNION ALL'd (the oracle recomputes; the Spark side is the one-scan
    plan)."""
    parts = []
    for c in cols:
        if c in numeric:
            mn, mx, al = (
                f"min(CAST({c} AS DOUBLE))",
                f"max(CAST({c} AS DOUBLE))",
                "CAST(NULL AS DOUBLE)",
            )
        else:
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            al = f"round(avg(length(CAST({c} AS VARCHAR))), 6)"
        parts.append(
            f"SELECT '{c}' AS column, count(*) AS n_rows, "
            f"count(CASE WHEN {c} IS NULL THEN 1 END) AS n_null, "
            f"count(DISTINCT {c}) AS n_distinct, "
            f"{mn} AS min_num, {mx} AS max_num, {al} AS avg_len FROM {table}"
        )
    return " UNION ALL ".join(parts)


def k_anonymity_report(
    df: DataFrame, quasi_identifiers: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: every QI
    equivalence class with fewer than k rows (the re-identifiable ones),
    plus its size. A released table is k-anonymous iff this report is
    EMPTY — the standard privacy gate before a linkage corpus or training
    extract leaves the pipeline (complements functions/pii.py's direct-
    identifier scan: QIs re-identify by COMBINATION, not content).

    One groupBy over the QI columns (map-side combine), filter < k —
    identical shape at 100 TB; the report size is bounded by the number
    of small classes, not the table."""
    qi = [F.col(c) for c in quasi_identifiers]
    return (
        df.groupBy(*qi)
        .agg(F.count("*").alias("class_size"))
        .where(F.col("class_size") < k)
    )
