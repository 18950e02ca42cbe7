"""Bucketed temporal joins: point-in-interval lookup and interval overlap.

Spark has no native range/interval join — a naive ``a.join(b, (a.start <=
b.ts) & (b.ts < a.end))`` plans as BroadcastNestedLoop/Cartesian, which is
O(|a|·|b|) and a non-starter at scale. These operators rewrite the range
predicate into an EQUI-join on fixed-width time buckets (the standard
range-bucketing strategy, cf. Databricks' range-join hints and Flink's
interval joins), so Catalyst plans an ordinary shuffled hash / sort-merge
join:

* intervals explode to every bucket they span (``sequence`` of bucket
  ordinals — one JVM-side projection, no Python);
* points map to exactly ONE bucket, so point-in-interval pairs appear
  exactly once — no post-join dedup;
* interval×interval overlap pairs would appear once per shared bucket, so
  a pair is emitted only from the bucket containing the LATER of the two
  starts (``greatest(a.start, b.start)``) — exactly-once without a
  ``distinct`` shuffle.

Scale notes (100 TB):
  - cost is |rows| × (span/width) exploded rows; pick ``bucket_width``
    near the median interval length so the explode factor stays small
    while each bucket's population stays bounded. Both sides shuffle once
    on (key, bucket); no nested loop anywhere.
  - open-ended intervals (``end IS NULL`` — e.g. the current SCD2
    version) cannot be bucketed; they are routed through a separate plain
    equi-join on the key (bounded: one open interval per entity in SCD2)
    and unioned back in.
  - skew: the bucket dimension spreads a hot key's timeline across
    buckets, which is exactly the salting you'd otherwise add by hand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def _bucket_of(ts_col, width_s: int):
    return F.floor(F.unix_micros(ts_col.cast("timestamp")) / (width_s * _US))


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    key_cols: list[str] | None = None,
    bucket_width_s: int = 86400,
) -> DataFrame:
    """Inner-join each point to every interval containing it
    (``start <= ts < end``, half-open; ``end IS NULL`` = open-ended),
    optionally also matching on equality of ``key_cols``.

    Output: all columns of ``points`` then all non-key columns of
    ``intervals``. Column names must not collide apart from ``key_cols``.
    """
    keys = list(key_cols or [])
    closed = intervals.where(F.col(end_col).isNotNull())
    opened = intervals.where(F.col(end_col).isNull())

    lo = _bucket_of(F.col(start_col), bucket_width_s)
    # end is exclusive: a point at exactly `end` is NOT covered, so the
    # last bucket an interval can match is bucket_of(end - 1us).
    hi = _bucket_of(
        F.timestamp_micros(F.unix_micros(F.col(end_col).cast("timestamp")) - 1),
        bucket_width_s,
    )
    iv = closed.withColumn("_b", F.explode(F.sequence(lo, hi)))
    pt = points.withColumn("_b", _bucket_of(F.col(point_ts), bucket_width_s))

    contains = (F.col(start_col) <= F.col(point_ts)) & (
        F.col(point_ts) < F.col(end_col)
    )
    hit_closed = pt.join(iv, on=keys + ["_b"], how="inner").where(contains)

    open_pred = F.col(start_col) <= F.col(point_ts)
    if keys:
        hit_open = points.join(opened, on=keys, how="inner").where(open_pred)
    else:
        hit_open = points.crossJoin(F.broadcast(opened)).where(open_pred)

    return hit_closed.drop("_b").unionByName(hit_open)


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    key_cols: list[str] | None = None,
    bucket_width_s: int = 86400,
) -> DataFrame:
    """Inner-join intervals of ``a`` to every CLOSED interval of ``b``
    they overlap (half-open overlap: ``a.start < b.end AND b.start <
    a.end``), optionally also matching on ``key_cols``. Both inputs must
    have non-null ends (assemble open ends upstream, e.g. cap at the
    watermark/"now"). Each overlapping pair is emitted exactly once via
    the later-start-bucket rule."""
    keys = list(key_cols or [])

    def burst(df, start, end):
        lo = _bucket_of(F.col(start), bucket_width_s)
        hi = _bucket_of(
            F.timestamp_micros(F.unix_micros(F.col(end).cast("timestamp")) - 1),
            bucket_width_s,
        )
        return df.withColumn("_b", F.explode(F.sequence(lo, hi)))

    ea, eb = burst(a, a_start, a_end), burst(b, b_start, b_end)
    overlap = (F.col(a_start) < F.col(b_end)) & (F.col(b_start) < F.col(a_end))
    once = F.col("_b") == _bucket_of(
        F.greatest(F.col(a_start), F.col(b_start)), bucket_width_s
    )
    return ea.join(eb, on=keys + ["_b"], how="inner").where(overlap & once).drop("_b")
