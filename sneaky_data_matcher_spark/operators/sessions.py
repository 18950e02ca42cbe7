"""Gap-based sessionization over the events stream/table.

The reference has no session concept (its closest analogue is the upload
`Descriptor` lifecycle, `DescriptorController.java`), but any large-scale
event pipeline feeding a training-data engine needs sessionization; this
module provides the two canonical shapes:

* :func:`sessionize` — per-event session assignment via the lag/cumsum
  window idiom (every row keeps its identity; downstream joins can attach
  the session id).
* :func:`session_stats` — per-session aggregates via Spark's NATIVE
  ``F.session_window`` (a purpose-built gap-merging operator that skips
  the per-row window state entirely and works identically in Structured
  Streaming with a watermark).

Both define a session break as ``ts - prev_ts >= gap`` (Spark's session
window half-open ``[start, last_event + gap)`` merge rule), so the two
shapes agree event-for-event — asserted in tests/test_sessions.py.

Scale notes (100 TB):
  - both shapes shuffle ONCE on the user key; the window variant then
    sorts within partitions, the session_window variant is a streaming-
    capable aggregation with partial merge. No corpus-wide sort.
  - hot users (bots) skew the user partition; the bound is events-per-
    user, not corpus size. Salting is NOT applicable (session assembly is
    order-dependent within a user), so the mitigation at scale is an
    upstream per-user event cap or time-bucketed pre-aggregation.
  - in streaming, ``session_window`` + watermark bounds state by the gap:
    a session closes (and its state drops) once the watermark passes
    last_event + gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_S = 30 * 60  # 30-minute inactivity gap (the classic default)


def _micros(ts_col: str):
    """Epoch microseconds of a TIMESTAMP or TIMESTAMP_NTZ column. Parquet
    fixtures read as NTZ; unix_micros only takes TIMESTAMP, and the cast
    is an identity re-interpretation because the session timezone is
    pinned to UTC (session.py:54)."""
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = DEFAULT_GAP_S,
) -> DataFrame:
    """Assign every event a per-user session ordinal (1-based) and a
    globally unique ``session_id``.

    A new session starts when the gap since the user's previous event is
    >= ``gap_s`` seconds. Ties in ``ts`` are ordered by the remaining
    columns only for determinism of row order — the session boundary is a
    function of the timestamp multiset alone, so the assignment itself is
    order-stable under ties.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    us = _micros(ts_col)
    prev = F.lag(us).over(w)
    is_new = (prev.isNull() | (us - prev >= gap_s * 1_000_000)).cast("int")
    running = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = events.withColumn("session_no", F.sum(is_new).over(running))
    return out.withColumn(
        "session_id",
        F.concat_ws("-", F.col(user_col).cast("string"), F.col("session_no")),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = DEFAULT_GAP_S,
    value_col: str = "value",
) -> DataFrame:
    """Per-session aggregates via the native session window operator.

    Output: (user, session_start, session_events, duration_s, sum_value).
    ``session_start`` is the first event's timestamp (NOT the padded
    window end — ``session_window.end`` includes the trailing gap, so
    duration is computed from min/max event time instead, making the
    numbers gap-independent and SQL-reproducible).

    The decimal-sum cast mirrors events_windowed's hash-stability trick:
    double addition is order-sensitive at the last ulp; decimal is exact.
    """
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(value_col).alias("value"),
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", f"{gap_s} seconds"))
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count("*").alias("session_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("first_ts").cast("timestamp_ntz").alias("session_start"),
            "session_events",
            (
                (F.unix_micros(F.col("last_ts")) - F.unix_micros(F.col("first_ts")))
                / 1_000_000.0
            ).alias("duration_s"),
            "sum_value",
        )
    )
