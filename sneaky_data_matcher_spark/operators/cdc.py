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
