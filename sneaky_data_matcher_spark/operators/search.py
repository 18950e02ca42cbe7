"""Reference-parity query surface (SURVEY.md §2 F1-F9, J1-J3, L1, A2-A3).

The reference stores each cell as a Neo4j value node under a dynamic label
and reassembles rows per query (repositories/SearchRepository.java). Here
the same semantics run over a LONG-FORMAT KEYS FRAME:

    keys(doc_id, key_kind, value)   -- key_kind = the former dynamic label

plus the corpus frame for row reassembly. The dynamic label set becomes
data, not schema — `key_kind IN (...)` replaces the Cypher label union
(SearchRepository.java:94-95), and all N+1 per-seed round-trips collapse
into set-oriented joins.

Determinism: the reference paginates with no ORDER BY (storage order);
we impose orderBy(doc_id) everywhere (SURVEY.md L1 note).
"""

from __future__ import annotations

import functools
import operator as op

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.pyoracle import parse_search_query


def predicate_for(value_col: Column, query: str, query_type: str) -> Column:
    """F2-F5 (SearchRepository.java:62-65)."""
    if query_type == "MATCHES":
        return value_col == F.lit(query)
    if query_type == "STARTS_WITH":
        return value_col.startswith(query)
    if query_type == "ENDS_WITH":
        return value_col.endswith(query)
    if query_type == "CONTAINS":
        return value_col.contains(query)
    raise ValueError(query_type)


def search_seeds(
    keys: DataFrame,
    column_searches: list[str],
    logical_predicate: str = "AND",
    limit_by_sources: list[str] | None = None,
    source_col: str = "source",
) -> DataFrame:
    """F1+F6+F8+F9: parse mini-language searches, evaluate over the keys
    frame, AND/OR combine per doc — returns distinct seed doc_ids.

    AND means: every columnSearch matched by SOME key of the doc (the
    reference evaluates each predicate over the label union then conjoins,
    SearchRepository.java:53-69,94-95). Implemented as per-search semi-
    aggregation + count == n_searches, which is one shuffle on doc_id.
    """
    parsed = [parse_search_query(cs) for cs in column_searches]
    per_search = None
    for i, (col_name, q, qt) in enumerate(parsed):
        hit = keys.where(
            (F.col("key_kind") == col_name)
            & predicate_for(F.col("value"), q, qt)
        ).select("doc_id", F.lit(i).alias("search_id"))
        per_search = hit if per_search is None else per_search.unionByName(hit)
    assert per_search is not None, "at least one column search required"
    if logical_predicate.upper() == "AND":
        seeds = (
            per_search.groupBy("doc_id")
            .agg(F.countDistinct("search_id").alias("n"))
            .where(F.col("n") == len(parsed))
            .select("doc_id")
        )
    else:
        seeds = per_search.select("doc_id").distinct()
    if limit_by_sources:
        prov = keys.where(
            (F.col("key_kind") == source_col)
            & F.col("value").isin(limit_by_sources)
        ).select("doc_id").distinct()
        seeds = seeds.join(prov, "doc_id", "left_semi")
    return seeds


def reassemble_rows(seeds: DataFrame, keys: DataFrame) -> DataFrame:
    """J1 (SearchRepository.java:213-247): seed doc -> all its (key_kind,
    values) as multi-valued cells. One join + one groupBy instead of a
    round-trip per seed."""
    return (
        seeds.join(keys, "doc_id")
        .groupBy("doc_id", "key_kind")
        .agg(F.array_distinct(F.sort_array(F.collect_list("value"))).alias("values"))
    )


def join_enrichment(
    seeds: DataFrame,
    keys: DataFrame,
    join_by_columns: list[str],
    max_join_depth: int = 2,
) -> DataFrame:
    """J2 (SearchRepository.java:249-297): for each seed and each joinOn
    column, pull OTHER docs sharing a value in that column; cap at
    max_join_depth+1 distinct other docs per seed (the reference's
    idCounter break at :265-272), deterministically (orderBy other doc_id).

    Returns (doc_id, other_doc_id, join_col, join_value).

    NOTE: the reference's Cypher interpolates List.toString() so its join
    matches nothing in practice (bug, SURVEY.md J2); this implements the
    intended equality-join semantics.
    """
    jk = keys.where(F.col("key_kind").isin(join_by_columns))
    seed_vals = seeds.join(jk, "doc_id").select(
        "doc_id", F.col("key_kind").alias("join_col"), F.col("value").alias("join_value")
    )
    others = jk.select(
        F.col("doc_id").alias("other_doc_id"),
        F.col("key_kind").alias("join_col"),
        F.col("value").alias("join_value"),
    )
    hits = (
        seed_vals.join(others, ["join_col", "join_value"])
        .where(F.col("doc_id") != F.col("other_doc_id"))
    )
    w = Window.partitionBy("doc_id").orderBy("other_doc_id", "join_col", "join_value")
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_join_depth + 1)
        .drop("rn")
        .select("doc_id", "other_doc_id", "join_col", "join_value")
    )


def paginate(df: DataFrame, skip: int = 0, limit: int = 10, order_col: str = "doc_id") -> DataFrame:
    """L1 with imposed deterministic order (reference relies on storage
    order — SearchRepository.java:94)."""
    return df.orderBy(order_col).offset(skip).limit(limit)


def probe_match(
    probe: DataFrame,
    keys: DataFrame,
    probe_key_cols: dict[str, str],
    limit_per_probe: int = 1,
) -> DataFrame:
    """J3 (services/SearchService.java:104-199): batch matcher. Each probe
    row produces EQUALS searches (probe canonical value == corpus key value
    per key_kind); AND across mappings; top-`limit_per_probe` corpus docs
    per probe, deterministic by doc_id. One distributed join replaces the
    reference's 1-3 Neo4j round-trips per probe row.

    probe_key_cols: {probe_column_name: corpus_key_kind}. Probe columns
    must already be canonicalized by the caller (same transform chain).

    AND semantics use countDistinct over a per-mapping index (same shape as
    search_seeds): in the reference's multi-valued cell model a doc can
    carry several values under one key_kind (SearchRepository.java:231-236),
    so a raw count(*) would let two hits on ONE mapping satisfy a
    two-mapping AND — a false positive the index tag rules out.
    """
    n = len(probe_key_cols)
    per = None
    for i, (pcol, kind) in enumerate(probe_key_cols.items()):
        k = keys.where(F.col("key_kind") == kind).select(
            "doc_id", F.col("value").alias(pcol)
        )
        hit = probe.select("probe_id", pcol).join(k, pcol).select(
            "probe_id", "doc_id", F.lit(i).alias("mapping_id")
        )
        per = hit if per is None else per.unionByName(hit)
    assert per is not None
    matched = (
        per.groupBy("probe_id", "doc_id")
        .agg(F.countDistinct("mapping_id").alias("n"))
        .where(F.col("n") == n)
    )
    w = Window.partitionBy("probe_id").orderBy("doc_id")
    return (
        matched.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= limit_per_probe)
        .select("probe_id", "doc_id")
    )


def distinct_key_kinds(keys: DataFrame) -> DataFrame:
    """A3 (repositories/ColumnsRepository.java:21-32): the dynamic 'column'
    set, sorted."""
    return keys.select("key_kind").distinct().orderBy("key_kind")


def export_wide(rows: DataFrame, all_kinds: list[str]) -> DataFrame:
    """S6 (services/SearchService.java:233-259): wide export with the global
    sorted header; multi-valued cells JSON-encoded, missing cells empty."""
    wide = (
        rows.groupBy("doc_id")
        .pivot("key_kind", sorted(all_kinds))
        .agg(F.first("values"))
    )
    cols = [F.col("doc_id")] + [
        F.coalesce(F.to_json(F.col(k)), F.lit("")).alias(k) for k in sorted(all_kinds)
    ]
    return wide.select(*cols)
