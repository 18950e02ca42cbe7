"""As-of (most-recent-at-or-before) join — the canonical time-series
enrichment operator Spark lacks as a built-in.

The reference has no temporal joins (its `join` is exact-value
enrichment, JoinRequest.java); this fills the gap for event/feature
pipelines: attach to every left row the LATEST right row with the same
key whose timestamp is <= the left timestamp.

Spark-first implementation — the union/window idiom, NOT a theta join:
tag both inputs, union them, and run one window per key ordered by
(ts, side) taking the last non-null right payload. A naive
``left.join(right, key).where(r.ts <= l.ts)`` + max() explodes to
O(|L_k| x |R_k|) rows per key before filtering; the union form is
O((|L_k|+|R_k|) log) with exactly ONE shuffle on the key and a
within-partition sort — the plan you want at 100 TB. (Each side's scan
still prunes to the projected columns; the window is
whole-stage-codegen'd.)

Tie rules: right rows at the same (key, ts) are ordered by ``tiebreak``
(latest wins, deterministic); a right row at exactly the left row's ts
DOES match (inclusive, like DuckDB/pandas ASOF backward).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of LEFT join: every left row, plus the payload of the
    most recent right row with the same ``on`` key and
    ``right_ts <= left_ts`` (NULL payload when none exists).

    ``payload`` defaults to all right columns except the key; the right
    timestamp is always included (output columns are ``asof_<name>``).
    ``tiebreak`` breaks equal-timestamp right rows (defaults to the last
    payload column).
    """
    if payload is None:
        payload = [c for c in right.columns if c not in (on, right_ts)]
    pay_cols = [right_ts, *[c for c in payload if c != right_ts]]
    tiebreak = tiebreak or pay_cols[-1]

    pay_struct = F.struct(*[F.col(c) for c in pay_cols])
    pay_type = right.select(pay_struct.alias("_p")).schema["_p"].dataType
    tb_type = right.schema[tiebreak].dataType
    left_cols = list(left.columns)

    r_side = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        pay_struct.alias("_pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        # NULL-ts right rows can never be "at or before" anything, but the
        # window sort is asc_nulls_first, so unfiltered they'd sit at the
        # partition start and fabricate a match for every left row that
        # precedes all real right rows. ASOF semantics: drop them.
    ).where(F.col("_t").isNotNull())
    l_side = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tb_type).alias("_tb"),
        F.lit(None).cast(pay_type).alias("_pay"),
        *left_cols,
    )
    u = r_side.unionByName(l_side)

    # right (_side 0) sorts before left (_side 1) at equal ts -> inclusive
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_asof", F.last("_pay", ignorenulls=True).over(w))
    return matched.where(F.col("_side") == 1).select(
        *left_cols,
        *[F.col("_asof")[c].alias(f"asof_{c}") for c in pay_cols],
    )
