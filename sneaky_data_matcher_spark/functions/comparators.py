"""Numeric field comparators for record linkage.

Amounts, counts and measurements disagree across sources by rounding,
unit drift and clerical error; like dates (functions/dates.py), linkage
systems grade numeric agreement in LEVELS that feed Fellegi-Sunter
weights rather than boolean equality. Native CASE/abs/greatest exprs —
codegen at 100 TB; the DuckDB twin mirrors each branch on identical
double pipelines.

Levels:
  3 exact equality
  2 relative difference <= 1%
  1 relative difference <= 10%
  0 everything else (incl. exactly one side NULL — handled by callers)

Relative difference = |a-b| / max(|a|, |b|); both-zero is exact (level 3
via equality); one-zero yields reldiff 1 -> level 0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def numeric_match_level(a: Column, b: Column) -> Column:
    rel = F.abs(a - b) / F.greatest(F.abs(a), F.abs(b))
    return (
        F.when(a == b, F.lit(3))
        .when(rel <= 0.01, F.lit(2))
        .when(rel <= 0.1, F.lit(1))
        .otherwise(F.lit(0))
    )


def numeric_match_sql(a: str, b: str) -> str:
    rel = f"abs({a} - {b}) / greatest(abs({a}), abs({b}))"
    return (
        f"CASE WHEN {a} = {b} THEN 3 "
        f"WHEN {rel} <= 0.01 THEN 2 "
        f"WHEN {rel} <= 0.1 THEN 1 ELSE 0 END"
    )
