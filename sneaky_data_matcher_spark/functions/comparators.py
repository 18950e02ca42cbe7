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


def phone_match_level(a: Column, b: Column) -> Column:
    """Graded phone agreement over NORMALIZED digit strings (callers run
    canonicalize.phone_rule first): 3 exact; 2 same last 7 digits
    (national number match across formatting/country-code drift — the
    classic linkage fallback); 1 same last 4; 0 otherwise/short."""
    l7 = (F.length(a) >= 7) & (F.length(b) >= 7)
    l4 = (F.length(a) >= 4) & (F.length(b) >= 4)
    return (
        F.when(a.isNotNull() & (a == b), F.lit(3))
        .when(l7 & (F.substring(a, -7, 7) == F.substring(b, -7, 7)), F.lit(2))
        .when(l4 & (F.substring(a, -4, 4) == F.substring(b, -4, 4)), F.lit(1))
        .otherwise(F.lit(0))
    )


def phone_match_sql(a: str, b: str) -> str:
    return (
        f"CASE WHEN {a} IS NOT NULL AND {a} = {b} THEN 3 "
        f"WHEN length({a}) >= 7 AND length({b}) >= 7 "
        f"AND right({a}, 7) = right({b}, 7) THEN 2 "
        f"WHEN length({a}) >= 4 AND length({b}) >= 4 "
        f"AND right({a}, 4) = right({b}, 4) THEN 1 ELSE 0 END"
    )


def email_match_level(a: Column, b: Column) -> Column:
    """Graded email agreement (case-folded): 3 exact; 2 same local part
    with Gmail-style dots/plus-tag stripped AND same domain; 1 same
    domain only; 0 otherwise. The dot/plus canonicalization is applied
    to ALL domains (deliberate recall-over-precision choice for
    linkage, documented)."""
    la, da = F.split(F.lower(a), "@").getItem(0), F.substring_index(F.lower(a), "@", -1)
    lb, db = F.split(F.lower(b), "@").getItem(0), F.substring_index(F.lower(b), "@", -1)
    canon = lambda l: F.replace(  # noqa: E731
        F.substring_index(l, "+", 1), F.lit("."), F.lit("")
    )
    return (
        F.when(a.isNotNull() & (F.lower(a) == F.lower(b)), F.lit(3))
        .when((da == db) & (canon(la) == canon(lb)), F.lit(2))
        .when(da == db, F.lit(1))
        .otherwise(F.lit(0))
    )


def email_match_sql(a: str, b: str) -> str:
    la, da = f"string_split(lower({a}), '@')[1]", f"split_part(lower({a}), '@', -1)"
    lb, db = f"string_split(lower({b}), '@')[1]", f"split_part(lower({b}), '@', -1)"
    canon = lambda l: f"replace(split_part({l}, '+', 1), '.', '')"  # noqa: E731
    return (
        f"CASE WHEN {a} IS NOT NULL AND lower({a}) = lower({b}) THEN 3 "
        f"WHEN {da} = {db} AND {canon(la)} = {canon(lb)} THEN 2 "
        f"WHEN {da} = {db} THEN 1 ELSE 0 END"
    )
