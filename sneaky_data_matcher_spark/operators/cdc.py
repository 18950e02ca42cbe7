"""Change-data-capture apply: fold an I/U/D changelog into a base table.

The reference mutates rows in place (Neo4j MERGE overwrites node
properties); a lakehouse pipeline instead receives the mutations as a
CHANGELOG (Debezium/DMS shape: key, op ∈ {I,U,D}, seq, payload) and must
fold it into the previous snapshot — the core of every incremental table
format (Delta MERGE, Iceberg upsert, Hudi copy-on-write compaction).

Semantics: per key, the change with the highest ``seq`` wins (ties broken
by op descending — deterministic; give seqs unique upstream). Winning
I/U replaces (or inserts) the row; winning D removes it. Base rows with
no changes pass through.

Scale notes (100 TB):
  - latest-change-per-key is ONE groupBy with a max(struct) — map-side
    combinable, so a chatty changelog (many updates per key) compresses
    before the shuffle; never a row_number window (whole-partition sort,
    no partial aggregation).
  - the base pass-through is an anti-join against the (small) distinct
    changed-key frame — broadcast when it fits, which is the common case
    for an incremental batch against a huge base.
  - this is exactly the fallback-parquet analogue of an Iceberg MERGE;
    on a real catalog TableIO's Iceberg branch would push this down to
    `MERGE INTO`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_per_key(
    changes: DataFrame, key: str, seq: str, payload_cols: list[str]
) -> DataFrame:
    """One row per key: the change with the highest (seq, op) —
    max(struct) aggregation, partial-aggregate friendly."""
    packed = changes.groupBy(key).agg(
        F.max(
            F.struct(
                F.col(seq).alias("_seq"),
                F.col("op").alias("op"),
                *[F.col(c).alias(c) for c in payload_cols],
            )
        ).alias("w")
    )
    return packed.select(
        key,
        F.col("w.op").alias("op"),
        F.col("w._seq").alias(seq),
        *[F.col(f"w.{c}").alias(c) for c in payload_cols],
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq: str = "seq",
) -> DataFrame:
    """Fold ``changes(key, op, seq, <payload...>)`` into ``base(key,
    <payload...>)``. Payload columns are every base column except the
    key; the changelog must carry the same columns."""
    payload = [c for c in base.columns if c != key]
    win = latest_per_key(changes, key, seq, payload)
    keep = base.join(F.broadcast(win.select(key)), key, "left_anti")
    upserts = win.where(F.col("op") != "D").select(key, *payload)
    return keep.unionByName(upserts)


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, compare_cols: list[str]
) -> DataFrame:
    """Row-level diff of two table snapshots: (key, status, old/new values)
    with status in {added, deleted, changed, unchanged}.

    The audit primitive for any CDC/merge pipeline — after cdc_apply (or a
    real Iceberg MERGE), diffing the snapshots proves the changelog did
    exactly what it claimed, and diffing two time-travel reads explains a
    regression. One full outer join on the key (single shuffle each side,
    broadcast when one snapshot is an incremental slice); the struct
    comparison is null-safe via eqNullSafe per column.
    """
    # dedicated presence markers: payload columns can be legitimately
    # NULL, so "side missing" must not be judged from them
    o = old.select(
        key, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("_in_old", F.lit(True))
    n = new.select(
        key, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("_in_new", F.lit(True))
    j = o.join(n, key, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("deleted"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(key, status.alias("status"), *[
        c for pair in (
            (f"old_{cc}", f"new_{cc}") for cc in compare_cols
        ) for c in pair
    ])
