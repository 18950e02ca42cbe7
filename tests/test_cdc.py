"""CDC apply: insert/update/delete folding, latest-wins ordering,
delete-then-reinsert, and idempotence of an empty changelog."""

from __future__ import annotations

from sneaky_data_matcher_spark.operators.cdc import cdc_apply, latest_per_key


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )


def _ch(spark, rows):
    return spark.createDataFrame(rows, "k long, op string, seq long, name string, v double")


def _collect(df):
    return sorted((r["k"], r["name"], r["v"]) for r in df.collect())


def test_insert_update_delete(spark):
    ch = _ch(
        spark,
        [
            (2, "U", 1, "b2", 21.0),
            (3, "D", 1, None, None),
            (9, "I", 1, "new", 90.0),
        ],
    )
    out = cdc_apply(_base(spark), ch, "k")
    assert _collect(out) == [(1, "a", 10.0), (2, "b2", 21.0), (9, "new", 90.0)]


def test_latest_seq_wins_per_key(spark):
    ch = _ch(
        spark,
        [
            (2, "U", 1, "first", 1.0),
            (2, "U", 3, "third", 3.0),
            (2, "U", 2, "second", 2.0),
        ],
    )
    out = cdc_apply(_base(spark), ch, "k")
    assert (2, "third", 3.0) in _collect(out)


def test_delete_then_reinsert(spark):
    ch = _ch(spark, [(1, "D", 1, None, None), (1, "I", 2, "back", 11.0)])
    out = cdc_apply(_base(spark), ch, "k")
    assert (1, "back", 11.0) in _collect(out)
    # and the reverse order really deletes
    ch2 = _ch(spark, [(1, "I", 1, "back", 11.0), (1, "D", 2, None, None)])
    out2 = cdc_apply(_base(spark), ch2, "k")
    assert all(k != 1 for k, _, _ in _collect(out2))


def test_empty_changelog_identity(spark):
    ch = _ch(spark, [])
    assert _collect(cdc_apply(_base(spark), ch, "k")) == _collect(_base(spark))


def test_latest_per_key_shape(spark):
    ch = _ch(spark, [(5, "U", 1, "x", 1.0), (5, "D", 2, None, None)])
    row = latest_per_key(ch, "k", "seq", ["name", "v"]).collect()
    assert len(row) == 1 and row[0]["op"] == "D" and row[0]["seq"] == 2


def test_streaming_cdc_equals_one_shot(spark, tmp_path):
    """Three changelog micro-batches (per-key seqs non-decreasing across
    batches) folded via foreachBatch == one-shot cdc_apply."""
    from sneaky_data_matcher_spark.sources.io import TableIO
    from sneaky_data_matcher_spark.streaming.incremental import cdc_stream_apply

    batches = [
        [(1, "U", 1, "a1", 1.0), (2, "I", 1, "b1", 2.0)],
        [(1, "U", 2, "a2", 1.5), (3, "I", 2, "c1", 3.0), (2, "D", 2, None, None)],
        [(2, "I", 3, "b3", 9.0), (3, "U", 3, "c2", 3.5)],
    ]
    schema = "k long, op string, seq long, name string, v double"
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    io = TableIO(spark, str(tmp_path / "state"))

    stream = spark.readStream.schema(
        spark.createDataFrame([], schema).schema
    ).json(str(in_dir))
    q = cdc_stream_apply(io, stream, "k", "seq", table="base")
    try:
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).json(str(in_dir))
            q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r["k"], r["name"], r["v"]) for r in io.load("base").collect()
    )
    base0 = spark.createDataFrame([], "k long, name string, v double")
    all_changes = spark.createDataFrame(
        [r for b in batches for r in b], schema
    )
    want = sorted(
        (r["k"], r["name"], r["v"]) for r in cdc_apply(base0, all_changes, "k").collect()
    )
    assert got == want == [(1, "a2", 1.5), (2, "b3", 9.0), (3, "c2", 3.5)]


def test_snapshot_diff_all_statuses(spark):
    from sneaky_data_matcher_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, None, "C"), (4, 40.0, "D")],
        "k long, price double, st string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 25.0, "B"), (3, None, "C"), (5, 50.0, "E")],
        "k long, price double, st string",
    )
    got = {
        r["k"]: r
        for r in snapshot_diff(old, new, "k", ["price", "st"]).collect()
    }
    assert got[1]["status"] == "unchanged"
    assert got[2]["status"] == "changed" and got[2]["new_price"] == 25.0
    # NULL payload on both sides compares equal (eqNullSafe), not "changed"
    assert got[3]["status"] == "unchanged"
    assert got[4]["status"] == "deleted" and got[4]["new_price"] is None
    assert got[5]["status"] == "added" and got[5]["old_price"] is None


def test_snapshot_diff_audits_cdc_apply(spark):
    """Applying a changelog then diffing must report exactly the keys the
    changelog touched."""
    from sneaky_data_matcher_spark.operators.cdc import cdc_apply, snapshot_diff

    base = spark.createDataFrame(
        [(i, float(i), "X") for i in range(100)], "k long, v double, st string"
    )
    ch = spark.createDataFrame(
        [(7, "U", 1, 700.0, "X"), (8, "D", 1, 0.0, "X"), (200, "U", 1, 1.0, "X")],
        "k long, op string, seq int, v double, st string",
    )
    new = cdc_apply(base, ch, key="k")
    got = {r["k"]: r["status"] for r in snapshot_diff(base, new, "k", ["v", "st"]).collect()}
    assert got[7] == "changed" and got[8] == "deleted" and got[200] == "added"
    assert sum(1 for s in got.values() if s != "unchanged") == 3
