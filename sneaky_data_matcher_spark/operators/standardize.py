"""Value standardization via fingerprint key-collision clustering.

The data-cleaning step between raw cells and matching: cluster the
DISTINCT VALUES of a column whose surface forms vary (re-ordered tokens,
case, accents, stray punctuation) and elect one canonical form per
cluster — OpenRefine's "key collision / fingerprint" method, the standard
first pass before any similarity-based clustering. The reference's NRM
transform (utils/StringTransformer.java:24-45) does the trivial fraction
of this (whitespace/quote trim); fingerprinting adds token re-ordering,
punctuation and accent invariance, which is what collapses
"Smith, John A." / "john a smith" / "JOHN A SMITH." into one key.

fingerprint(v) = sort(distinct(tokens(strip_punct(fold_accents(
    lower(trim(v))))))) joined by single spaces.

Canonical election is frequency-modal over ROW counts (the most common
surface form wins; ties break to the lexicographically smallest), which
is survivorship by evidence mass — same convention as
clustering.golden_fields' modal rule.

Scale notes (100 TB): the value census (groupBy value → count) is the
only corpus-sized shuffle and it map-side combines; everything after
operates on DISTINCT values (≪ rows). The election window partitions by
fingerprint over that census — skew equals the largest synonym family,
thousands at worst. Applying the mapping back is a broadcast join when
the dictionary is small, a hash join otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.canonicalize import fold_accents, fold_accents_sql


def fingerprint(col: Column) -> Column:
    """OpenRefine-style key-collision fingerprint (see module doc)."""
    cleaned = F.regexp_replace(
        fold_accents(F.lower(F.trim(col))), r"[^a-z0-9]+", " "
    )
    toks = F.filter(F.split(cleaned, " "), lambda t: t != "")
    return F.array_join(F.array_sort(F.array_distinct(toks)), " ")


def fingerprint_sql(expr: str) -> str:
    """DuckDB twin of :func:`fingerprint` (same steps, same order)."""
    cleaned = (
        f"regexp_replace({fold_accents_sql(f'lower(trim({expr}))')}, "
        "'[^a-z0-9]+', ' ', 'g')"
    )
    # DuckDB array_to_string([], sep) is NULL where Spark array_join
    # yields '' (NOTES.md) — coalesce so empty fingerprints agree
    return (
        "coalesce(array_to_string(list_sort(list_distinct(list_filter("
        f"string_split({cleaned}, ' '), t -> t <> ''))), ' '), '')"
    )


def standardize_values(df: DataFrame, value_col: str) -> DataFrame:
    """Distinct-value → canonical-value dictionary:
    (value, canonical_value, n_rows, group_size) where group_size is the
    number of distinct surface forms sharing the fingerprint and
    canonical_value is the row-count-modal form (ties → smallest).
    Values with an EMPTY fingerprint (nothing but punctuation) map to
    themselves — collapsing them into one cluster would merge unrelated
    garbage."""
    census = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("value"))
        .agg(F.count("*").alias("n_rows"))
        .withColumn("fp", fingerprint(F.col("value")))
    )
    w = Window.partitionBy("fp").orderBy(F.col("n_rows").desc(), F.col("value").asc())
    ranked = census.withColumn("rk", F.row_number().over(w))
    canon = ranked.where(F.col("rk") == 1).select(
        "fp", F.col("value").alias("canonical_value")
    )
    sizes = census.groupBy("fp").agg(F.count("*").alias("group_size"))
    out = (
        census.join(canon, "fp")
        .join(sizes, "fp")
        .select(
            "value",
            F.when(F.col("fp") == "", F.col("value"))
            .otherwise(F.col("canonical_value"))
            .alias("canonical_value"),
            "n_rows",
            F.when(F.col("fp") == "", F.lit(1))
            .otherwise(F.col("group_size"))
            .alias("group_size"),
        )
    )
    return out


def apply_standardization(
    df: DataFrame, value_col: str, mapping: DataFrame, broadcast: bool = True
) -> DataFrame:
    """Replace ``value_col`` with its canonical form via the dictionary
    from :func:`standardize_values` (broadcast by default — synonym
    dictionaries are tiny relative to the corpus)."""
    m = mapping.select(
        F.col("value").alias(value_col),
        F.col("canonical_value").alias("__canon"),
    )
    if broadcast:
        m = F.broadcast(m)
    return (
        df.join(m, value_col, "left")
        .withColumn(value_col, F.coalesce("__canon", F.col(value_col)))
        .drop("__canon")
    )
