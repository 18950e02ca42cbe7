"""Date-of-birth / date fuzzy-match comparators for record linkage.

Exact DOB equality is too strict for real linkage: the dominant real-world
error modes are (1) day/month transposition (03-07 vs 07-03 — field-order
confusion between DMY and MDY sources), (2) off-by-one-day clerical slips,
and (3) single-digit typos. Linkage systems (Splink, febrl) therefore
compare dates at graded agreement LEVELS rather than boolean equality; the
levels feed Fellegi-Sunter weights like any other comparison vector.

All expressions are native Catalyst date/int functions (no UDF): at 100 TB
this comparator runs inside whole-stage codegen on the candidate-pair
stream. The DuckDB twin (`date_match_sql`) mirrors every branch with the
same make_date/day-arithmetic semantics, so the driver value-hash holds.

Levels (descending strength):
  3 exact equality
  2 day/month transposition (same year, month==other day and vice versa,
    and the transposition is non-trivial: month != day) OR +/- 1 day
  1 same year and month
  0 everything else
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def swapped_day_month(a: Column, b: Column) -> Column:
    """b equals a with day and month transposed (non-trivially)."""
    return (
        (F.year(a) == F.year(b))
        & (F.month(a) == F.dayofmonth(b))
        & (F.dayofmonth(a) == F.month(b))
        & (F.month(a) != F.dayofmonth(a))
    )


def date_match_level(a: Column, b: Column) -> Column:
    """Graded agreement level (3/2/1/0) between two date columns."""
    return (
        F.when(a == b, F.lit(3))
        .when(swapped_day_month(a, b) | (F.abs(F.datediff(a, b)) == 1), F.lit(2))
        .when((F.year(a) == F.year(b)) & (F.month(a) == F.month(b)), F.lit(1))
        .otherwise(F.lit(0))
    )


def date_match_sql(a: str, b: str) -> str:
    """DuckDB twin of date_match_level over two DATE expressions."""
    swap = (
        f"(year({a}) = year({b}) AND month({a}) = day({b}) "
        f"AND day({a}) = month({b}) AND month({a}) <> day({a}))"
    )
    return (
        f"CASE WHEN {a} = {b} THEN 3 "
        f"WHEN {swap} OR abs(date_diff('day', {b}, {a})) = 1 THEN 2 "
        f"WHEN year({a}) = year({b}) AND month({a}) = month({b}) THEN 1 "
        "ELSE 0 END"
    )
