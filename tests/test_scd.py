"""SCD2 interval assembly: crafted change histories vs hand-computed
dimensions, interval tiling invariants, and point-in-time snapshots."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import scd


def _mk(spark, rows):
    # rows: (entity, second-offset, attr or None, event_id)
    return spark.createDataFrame(
        [(u, datetime(2026, 1, 1, 0, 0, s), a, i) for u, s, a, i in rows],
        "user_id long, ts timestamp, event_type string, event_id long",
    )


def _assemble(ev):
    return scd.scd2_assemble(
        ev, "user_id", "event_type", ts_col="ts", tiebreak_col="event_id"
    )


def test_runs_collapse_and_versions(spark):
    ev = _mk(
        spark,
        [
            (1, 0, "a", 1),
            (1, 10, "a", 2),  # same value: collapses into version 1
            (1, 20, "b", 3),
            (1, 30, "a", 4),  # a again: NEW version (run-based, not distinct)
            (2, 5, "x", 5),
        ],
    )
    out = {
        (r["entity"], r["version"]): (
            r["attr_value"],
            r["valid_from"].second,
            None if r["valid_to"] is None else r["valid_to"].second,
            r["n_events"],
            r["is_current"],
        )
        for r in _assemble(ev).collect()
    }
    assert out == {
        (1, 1): ("a", 0, 20, 2, False),
        (1, 2): ("b", 20, 30, 1, False),
        (1, 3): ("a", 30, None, 1, True),
        (2, 1): ("x", 5, None, 1, True),
    }


def test_ts_tie_broken_by_event_id(spark):
    # two different values at the SAME timestamp: event_id orders them
    ev = _mk(spark, [(1, 0, "a", 2), (1, 0, "b", 1)])
    rows = sorted(_assemble(ev).collect(), key=lambda r: r["version"])
    assert [r["attr_value"] for r in rows] == ["b", "a"]
    assert rows[0]["valid_to"] == rows[1]["valid_from"]


def test_null_attr_is_a_version(spark):
    ev = _mk(spark, [(1, 0, "a", 1), (1, 10, None, 2), (1, 20, None, 3)])
    rows = sorted(_assemble(ev).collect(), key=lambda r: r["version"])
    assert [r["attr_value"] for r in rows] == ["a", None]
    assert rows[1]["n_events"] == 2  # consecutive NULLs collapse null-safely


def test_intervals_tile_timeline(spark):
    # valid_to of version k == valid_from of version k+1; exactly one
    # current version per entity
    ev = _mk(
        spark,
        [(u, s, t, u * 100 + s) for u in (1, 2, 3) for s, t in
         [(0, "a"), (10, "b"), (20, "b"), (30, "c"), (40, "a")]],
    )
    dim = _assemble(ev)
    per_entity = dim.groupBy("entity").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_cur")
    )
    assert all(r["n_cur"] == 1 for r in per_entity.collect())
    rows = dim.collect()
    by_ent = {}
    for r in rows:
        by_ent.setdefault(r["entity"], []).append(r)
    for ent_rows in by_ent.values():
        ent_rows.sort(key=lambda r: r["version"])
        for a, b in zip(ent_rows, ent_rows[1:]):
            assert a["valid_to"] == b["valid_from"]
        assert ent_rows[-1]["valid_to"] is None


def test_snapshot_half_open(spark):
    ev = _mk(spark, [(1, 0, "a", 1), (1, 10, "b", 2)])
    dim = _assemble(ev)
    at_boundary = scd.scd2_snapshot(dim, datetime(2026, 1, 1, 0, 0, 10)).collect()
    assert [r["attr_value"] for r in at_boundary] == ["b"]  # [from, to)
    before = scd.scd2_snapshot(dim, datetime(2026, 1, 1, 0, 0, 9)).collect()
    assert [r["attr_value"] for r in before] == ["a"]
    pre_history = scd.scd2_snapshot(
        dim, datetime(2025, 12, 31, 23, 59, 59)
    ).collect()
    assert pre_history == []


def test_incremental_batches_equal_one_shot(spark, tmp_path):
    # random 3-way split of an event stream, applied incrementally,
    # must equal one-shot assembly — including late events landing
    # INSIDE an existing run (the case interval-merging would get wrong)
    import random

    from sneaky_data_matcher_spark.sources.io import TableIO

    rng = random.Random(5)
    rows = []
    eid = 0
    for u in range(1, 9):
        for s in range(0, 48, 4):  # _mk seconds stay < 60
            rows.append((u, s + (u % 4), rng.choice(["a", "b", "c"]), (eid := eid + 1)))
    rng.shuffle(rows)  # batches arrive in arbitrary (non-time) order
    cuts = [rows[:20], rows[20:55], rows[55:]]

    io = TableIO(spark, str(tmp_path))
    dim = None
    for batch_rows in cuts:
        dim = scd.scd2_apply_batch(
            io, _mk(spark, batch_rows), "user_id", "event_type",
            ts_col="ts", tiebreak_col="event_id",
        )
    one_shot = _assemble(_mk(spark, rows))

    def norm(df):
        return sorted(
            (r["entity"], r["version"], r["attr_value"], r["valid_from"],
             r["valid_to"], r["n_events"], r["is_current"])
            for r in df.collect()
        )

    assert norm(dim) == norm(one_shot)


def test_incremental_untouched_entities_preserved(spark, tmp_path):
    from sneaky_data_matcher_spark.sources.io import TableIO

    io = TableIO(spark, str(tmp_path))
    scd.scd2_apply_batch(
        io, _mk(spark, [(1, 0, "a", 1), (2, 0, "x", 2)]),
        "user_id", "event_type", ts_col="ts", tiebreak_col="event_id",
    )
    dim = scd.scd2_apply_batch(
        io, _mk(spark, [(1, 10, "b", 3)]),
        "user_id", "event_type", ts_col="ts", tiebreak_col="event_id",
    )
    got = {(r["entity"], r["version"]): r["attr_value"] for r in dim.collect()}
    assert got == {(1, 1): "a", (1, 2): "b", (2, 1): "x"}


def test_multi_attribute_struct_scd2(spark):
    # track a struct of attributes: any component change opens a version
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [
            (1, datetime(2026, 1, 1, 0, 0, 0), "gold", "us", 1),
            (1, datetime(2026, 1, 1, 0, 0, 10), "gold", "eu", 2),  # region change
            (1, datetime(2026, 1, 1, 0, 0, 20), "gold", "eu", 3),  # no change
            (1, datetime(2026, 1, 1, 0, 0, 30), "free", "eu", 4),  # plan change
        ],
        "user_id long, ts timestamp, plan string, region string, event_id long",
    ).withColumn("state", F.struct("plan", "region"))
    out = sorted(
        scd.scd2_assemble(
            ev, "user_id", "state", ts_col="ts", tiebreak_col="event_id"
        ).collect(),
        key=lambda r: r["version"],
    )
    assert [(r["attr_value"]["plan"], r["attr_value"]["region"], r["n_events"])
            for r in out] == [("gold", "us", 1), ("gold", "eu", 2), ("free", "eu", 1)]
