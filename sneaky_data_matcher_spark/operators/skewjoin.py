"""Skew-aware salted equi-join: replicate-the-small-side / salt-the-big-side.

Blocking already salts within its own key derivation
(blocking.py:183-222); this is the GENERAL-PURPOSE version for any
fact-to-dimension equi-join with hot keys, the pattern AQE's skew-join
handles for sort-merge joins but which must be done by hand when the
build side is replicated (or on engines/AQE-off paths):

  1. census the fact side's keys (one cheap partial-agg pass);
  2. keys whose row count exceeds ``hot_threshold`` get ``n_salts``
     sub-keys; the fact row's salt is ``pmod(xxhash64(tiebreak), n)``
     (content-independent, deterministic, uniform);
  3. the dimension side EXPLODES hot keys into all ``n_salts`` copies
     (cold keys: one copy, salt 0);
  4. ordinary equi-join on (key, salt).

Results are exactly the plain join's — salting only re-buckets rows.

Scale notes (100 TB):
  - the census is a map-side-combined groupBy on the join key — tiny
    output (distinct keys), broadcast to both sides; hot-key metadata
    never shuffles the fact table.
  - replication factor is |dim rows for hot keys| x n_salts, bounded by
    (few hot keys) x n_salts — the whole point is hot keys are few.
  - a broadcast-able dimension should just be broadcast (Catalyst does
    this already); use this operator when the dimension is too big to
    broadcast AND the fact key distribution is Zipf — the exact case
    where one reducer otherwise gets the head key's entire partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    tiebreak: str,
    n_salts: int = 8,
    hot_threshold: int = 100_000,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` to ``dim`` on ``key`` with deterministic salting
    of keys hotter than ``hot_threshold`` on the fact side. ``tiebreak``
    is any fact column with high cardinality (row id) — it only seeds the
    salt hash. ``how`` may be ``inner`` or ``left`` (dim rows are
    replicated, so right/full would duplicate unmatched dim rows)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    census = fact.groupBy(key).agg(F.count("*").alias("_kn"))
    hot = census.where(F.col("_kn") > hot_threshold).select(
        key, F.lit(n_salts).alias("_ns")
    )

    f = fact.join(F.broadcast(hot), key, "left").withColumn(
        "_salt",
        F.when(
            F.col("_ns").isNull(), F.lit(0)
        ).otherwise(F.pmod(F.xxhash64(tiebreak), F.col("_ns")).cast("int")),
    ).drop("_ns")

    d = (
        dim.join(F.broadcast(hot), key, "left")
        .withColumn(
            "_salt",
            F.explode(F.sequence(F.lit(0), F.coalesce(F.col("_ns") - 1, F.lit(0)))),
        )
        .withColumn("_salt", F.col("_salt").cast("int"))
        .drop("_ns")
    )

    return f.join(d, [key, "_salt"], how).drop("_salt")
