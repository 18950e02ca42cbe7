"""Write-side table layout: hive partitioning, range clustering, compaction.

At 100 TB the WRITE layout decides every future read's cost:

* :func:`write_partitioned` — hive-style directory partitioning on a
  low-cardinality column; equality/range predicates on it become
  PartitionFilters (directories never listed, files never opened).
* :func:`write_clustered` — range-repartition + sort-within-partitions
  on a clustering key: parquet row-group min/max stats become selective,
  so point/range predicates skip row groups even inside files (poor-man's
  Z-order for the single-key case); also the shape bucketed joins want.
* :func:`compact` — rewrite a directory of dribble files (streaming
  sinks, per-batch appends) into ~``target_rows``-sized files; small
  files are a namenode/scan-planning tax, the classic lakehouse
  maintenance job.

All three are thin, testable policies over the plain writer — the point
is encoding the decisions (and asserting their effects in-plan in
tests/test_layout.py), not wrapping Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_col: str, mode: str = "overwrite"
) -> None:
    """Hive-partitioned parquet. ``partition_col`` should be
    low-cardinality (date, lang, source); a high-cardinality partition
    column is the small-files anti-pattern — use write_clustered."""
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-partition into ``n_files`` disjoint key ranges and sort
    within each, so every file's parquet min/max stats cover a narrow,
    non-overlapping slice of ``cluster_col``."""
    (
        df.repartitionByRange(n_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .parquet(path)
    )


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_rows: int = 1_000_000,
) -> int:
    """Rewrite ``path`` into files of ~``target_rows`` rows at
    ``out_path``; returns the file count written. Row-count-based (not
    byte-based) so it is deterministic for tests; production would size
    by bytes via maxRecordsPerFile tuned to row width."""
    df = spark.read.parquet(path)
    n = df.count()
    files = max(1, -(-n // target_rows))
    df.repartition(files).write.mode("overwrite").parquet(out_path)
    return files


# ---------------------------------------------------------------------------
# Z-order clustering (r3 continuation): multi-dim data skipping. A single
# sort key clusters ONE dimension; bit-interleaving two bucketed keys into
# a Morton code keeps BOTH dimensions locally coherent, so per-file
# min/max stats prune 2D box predicates (the Delta/Iceberg OPTIMIZE
# ZORDER idea, done with plain integer math — no engine extension).
# ---------------------------------------------------------------------------

ZORDER_BITS = 8


def zorder_key(x, y, bits: int = ZORDER_BITS):
    """Morton interleave of two already-bucketed integer columns (each in
    [0, 2^bits)): bit i of x lands at position 2i, of y at 2i+1. Pure
    shift/mask arithmetic — the identical expression exists in any SQL
    engine, so layouts are portable and oracle-checkable."""
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftright(x, i).bitwiseAND(F.lit(1)) * (1 << (2 * i))
            + F.shiftright(y, i).bitwiseAND(F.lit(1)) * (1 << (2 * i + 1))
        )
    return z


def zorder_key_sql(x: str, y: str, bits: int = ZORDER_BITS) -> str:
    """DuckDB twin of :func:`zorder_key` (same shifts, same masks)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
    bits: int = ZORDER_BITS,
    mode: str = "overwrite",
) -> None:
    """Range-partition on the Morton code and sort within partitions, so
    every output file covers a compact Z-curve segment — tight min/max on
    BOTH x and y. At cluster scale this is the exact write shape; the
    local[] cost is one range exchange + local sorts."""
    z = zorder_key(F.col(x_col), F.col(y_col), bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
