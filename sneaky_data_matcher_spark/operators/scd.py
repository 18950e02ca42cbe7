"""Slowly-changing-dimension (type 2) interval assembly from change events.

The reference keeps only the LATEST state of every uploaded row (Neo4j
node properties are overwritten in place — ``Repository.java``'s MERGE
semantics); a warehouse-scale pipeline instead needs the full history:
given an event stream carrying an entity key and an attribute value,
produce one row per *run* of consecutive equal values with
``[valid_from, valid_to)`` validity intervals, a per-entity version
number, and an ``is_current`` flag. This is the classic gaps-and-islands
assembly, built entirely from native window functions.

Shapes:

* :func:`scd2_assemble` — change events → SCD2 dimension rows.
* :func:`scd2_snapshot` — the dimension as of a timestamp (point-in-time
  query over the intervals; equivalently "which version was live at t").

Scale notes (100 TB):
  - ONE shuffle on the entity key; the lag/cumsum/lead windows and the
    run groupBy all share the ``partitionBy(entity)`` clustering, so
    Catalyst plans a single exchange followed by in-partition sorts.
  - the per-entity sort bounds memory by events-per-entity, not corpus
    size; like sessionization the assembly is order-dependent within an
    entity, so skew mitigation is an upstream per-entity cap, not salting.
  - consecutive-duplicate collapse happens BEFORE the interval rows are
    materialized (the groupBy is a partial-aggregate), so a chatty source
    that re-emits unchanged state compresses map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_assemble(
    events: DataFrame,
    entity_col: str,
    attr_col: str,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assemble type-2 dimension rows from per-entity change events.

    A new version starts whenever ``attr_col`` differs (null-safely) from
    the entity's previous event in ``(ts, tiebreak)`` order; consecutive
    events with the same value collapse into one interval. Output one row
    per version: ``(entity, attr_value, version, valid_from, valid_to,
    n_events, is_current)`` where ``valid_to`` is the next version's
    ``valid_from`` (null on the current version) — half-open intervals,
    so an entity's intervals tile its observed timeline exactly.

    ``tiebreak_col`` makes ordering total when timestamps tie (pass the
    event id); without it, ties between DIFFERENT attr values would make
    the version assignment nondeterministic.
    """
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    prev = F.lag(attr_col).over(w)
    changed = (~prev.eqNullSafe(F.col(attr_col))).cast("int")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Keep the ORIGINAL entity column name until the final select: aliasing
    # it here breaks Catalyst's alias-aware output-partitioning propagation
    # and costs two extra exchanges (measured — 3 shuffles vs 1).
    versioned = events.select(
        entity_col,
        attr_col,
        ts_col,
        F.sum(changed).over(running).alias("version"),
    )
    runs = versioned.groupBy(entity_col, "version").agg(
        F.first(attr_col).alias("attr_value"),
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    wv = Window.partitionBy(entity_col).orderBy("version")
    out = runs.withColumn("valid_to", F.lead("valid_from").over(wv))
    return out.select(
        F.col(entity_col).alias("entity"),
        "attr_value",
        "version",
        "valid_from",
        "valid_to",
        "n_events",
        F.col("valid_to").isNull().alias("is_current"),
    )


def scd2_apply_batch(
    io,
    batch: DataFrame,
    entity_col: str,
    attr_col: str,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
    events_table: str = "scd2_events",
    dim_table: str = "scd2_dim",
) -> DataFrame:
    """Incrementally maintain an SCD2 dimension as event batches arrive.

    Design: the RAW events stay the committed source of truth
    (append-only ``events_table``); each batch appends, then ONLY the
    entities present in the batch get their history re-assembled from
    raw and spliced into the dimension. Rebuilding from raw (rather than
    merging against the compressed intervals) is what makes splitting a
    stream into batches EXACTLY equivalent to one-shot assembly — an
    interval compresses away intra-run event times, so a late event
    landing inside an existing run could not be ordered correctly against
    it (the same reason incremental_cc_update contracts onto committed
    edges, not onto derived cluster labels).

    Scale notes (100 TB):
      - per-batch cost ∝ (affected entities' full histories), not corpus
        size: the affected-id frame is the batch's distinct keys
        (broadcast), and with ``events_table`` partitioned/bucketed by
        entity the history scan prunes to their buckets.
      - the dimension rewrite is untouched-rows ∪ reassembled-rows; on a
        real lakehouse this is a MERGE/replaceWhere on the entity
        partition — here, an overwrite of the fallback parquet table.
      - idempotence caveat: appending the same batch twice duplicates raw
        events (n_events inflates; boundaries survive). Exactly-once
        ingest is the upstream contract, same as the reference's staged
        upload commits (UploadController resume semantics).

    Returns the new dimension (also committed to ``dim_table``).
    """
    if io.exists(events_table):
        io.append(batch, events_table)
    else:
        io.save(batch, events_table)
    events = io.load(events_table)

    affected = batch.select(entity_col).distinct()
    his = events.join(F.broadcast(affected), entity_col, "left_semi")
    rebuilt = scd2_assemble(
        his, entity_col, attr_col, ts_col=ts_col, tiebreak_col=tiebreak_col
    )
    if io.exists(dim_table):
        untouched = io.load(dim_table).join(
            F.broadcast(affected.withColumnRenamed(entity_col, "entity")),
            "entity",
            "left_anti",
        )
        dim = untouched.unionByName(rebuilt)
    else:
        dim = rebuilt
    # materialize before overwrite: the new dim reads the OLD dim table
    dim = dim.localCheckpoint(eager=True)
    io.save(dim, dim_table)
    return io.load(dim_table)


def scd2_snapshot(dim: DataFrame, at_ts) -> DataFrame:
    """Point-in-time slice of an SCD2 dimension: the version live at
    ``at_ts`` (half-open interval semantics: ``valid_from <= t <
    valid_to``). Entities whose first version starts after ``at_ts``
    drop out. A pure filter — no shuffle; with the dimension stored
    partitioned/bucketed by entity this is a metadata-only scan plus
    predicate, and Catalyst pushes both bounds to the source."""
    t = F.lit(at_ts).cast("timestamp_ntz")
    return dim.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
