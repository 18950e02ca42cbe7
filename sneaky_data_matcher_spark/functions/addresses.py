"""Rule-based postal address standardization for blocking/matching.

Address strings are the highest-variance field in person/company linkage:
the same address arrives as "123 North Main Street, Apt. 4B" and
"123 N MAIN ST UNIT 4B". The reference matches canonical keys by exact
equality (SearchService.java:165), so address agreement is only as good
as the canonicalization in front of it. This module applies the standard
USPS-style token normalization: uppercase, strip punctuation, collapse
whitespace, rewrite street-suffix / directional / unit-designator tokens
to their canonical abbreviations, and split the secondary-unit designator
(APT/STE/UNIT #) into its own column so "same building, different unit"
can be scored separately.

Everything is native Catalyst (regexp + higher-order array functions) —
whole-stage codegen at 100 TB, no UDF. The DuckDB twin mirrors each step
with the same token table (Spark lambdas are 0-indexed, DuckDB's
1-indexed; both sides are written against their own convention and
property-tested equal), so driver value-hashes hold.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# USPS publication-28 style abbreviations (the high-frequency subset).
TOKEN_MAP: dict[str, str] = {
    "STREET": "ST",
    "AVENUE": "AVE",
    "AV": "AVE",
    "ROAD": "RD",
    "DRIVE": "DR",
    "BOULEVARD": "BLVD",
    "LANE": "LN",
    "COURT": "CT",
    "PLACE": "PL",
    "SQUARE": "SQ",
    "HIGHWAY": "HWY",
    "PARKWAY": "PKWY",
    "NORTH": "N",
    "SOUTH": "S",
    "EAST": "E",
    "WEST": "W",
    "APARTMENT": "APT",
    "SUITE": "STE",
    "FLOOR": "FL",
}

UNIT_DESIGNATORS = ("APT", "STE", "UNIT", "FL")


def _canon_token(t: Column) -> Column:
    out = None
    for raw, canon in TOKEN_MAP.items():
        out = (
            F.when(t == raw, F.lit(canon))
            if out is None
            else out.when(t == raw, F.lit(canon))
        )
    return out.otherwise(t)


def _clean_tokens(col: Column) -> Column:
    """Uppercase, strip punctuation (.,#), split on whitespace, drop
    empties, canonicalize each token through TOKEN_MAP."""
    up = F.regexp_replace(F.upper(col), r"[.,#]", " ")
    toks = F.filter(F.split(up, r"\s+"), lambda t: t != "")
    return F.transform(toks, _canon_token)


def normalize_address(col: Column) -> Column:
    """Canonical single-line address (unit designator + its value removed)."""
    toks = _clean_tokens(col)

    def keep(t: Column, i: Column) -> Column:
        prev_is_unit = F.when(
            i > 0, F.element_at(toks, i).isin(*UNIT_DESIGNATORS)
        ).otherwise(F.lit(False))
        return (~t.isin(*UNIT_DESIGNATORS)) & (~prev_is_unit)

    return F.array_join(F.filter(toks, keep), " ")


def address_unit(col: Column) -> Column:
    """The secondary-unit value (token after APT/STE/UNIT/FL), or NULL."""
    toks = _clean_tokens(col)
    flags = F.transform(
        toks, lambda t: F.when(t.isin(*UNIT_DESIGNATORS), F.lit(1)).otherwise(0)
    )
    idx = F.array_position(flags, 1)  # 1-based; 0 when absent
    return F.when(
        (idx > 0) & (idx < F.size(toks)),
        F.element_at(toks, (idx + 1).cast("int")),
    )


def _units_sql() -> str:
    return "[" + ", ".join(f"'{u}'" for u in UNIT_DESIGNATORS) + "]"


def _clean_tokens_sql(col: str) -> str:
    cases = " ".join(f"WHEN t = '{r}' THEN '{c}'" for r, c in TOKEN_MAP.items())
    return (
        "list_transform(list_filter(string_split_regex("
        f"regexp_replace(upper({col}), '[.,#]', ' ', 'g'), '\\s+'), x -> x <> ''), "
        f"t -> CASE {cases} ELSE t END)"
    )


def normalize_address_sql(col: str) -> str:
    """DuckDB twin of normalize_address. DuckDB list lambdas take a
    1-based index, so 'previous token' is toks[i-1] guarded by i > 1."""
    u = _units_sql()
    toks = _clean_tokens_sql(col)
    # coalesce: DuckDB's array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — align on ''.
    return (
        f"coalesce(array_to_string(list_filter({toks}, (t, i) -> "
        f"NOT list_contains({u}, t) "
        f"AND NOT (i > 1 AND list_contains({u}, ({toks})[i - 1]))), ' '), '')"
    )


def address_unit_sql(col: str) -> str:
    """DuckDB twin of address_unit."""
    u = _units_sql()
    toks = _clean_tokens_sql(col)
    idx = (
        f"list_position(list_transform({toks}, "
        f"t -> CASE WHEN list_contains({u}, t) THEN 1 ELSE 0 END), 1)"
    )
    return (
        f"CASE WHEN {idx} IS NOT NULL AND {idx} > 0 AND {idx} < len({toks}) "
        f"THEN ({toks})[{idx} + 1] END"
    )
