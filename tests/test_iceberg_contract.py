"""Iceberg-branch contract tests with a mock catalog (VERDICT r3 #7).

The sandbox has no Iceberg jar and no network, so ``TableIO``'s
Iceberg-first branch (sources/io.py) has never executed against a real
catalog; every integration test exercises the parquet ``_SUCCESS``
fallback. These tests close the logic-level gap WITHOUT the jar:

  1. A mocked SparkSession/DataFrame records exactly which catalog calls
     each TableIO method issues when ``use_iceberg`` is on — the whole
     Iceberg surface (writeTo createOrReplace/append, spark.table,
     catalog.tableExists, DROP TABLE) is pinned so a refactor can't
     silently reroute a method to the file path.
  2. A tiny in-memory FakeIcebergCatalog models the two snapshot-store
     properties the resume design depends on (SURVEY §1.5, generalizing
     the reference's committed-watermark at
     repositories/UploadRepository.java:52-53):
       - snapshot ids are strictly monotonic per table commit, and
       - createOrReplace re-commit is idempotent in CONTENT (the table
         reads back the latest committed snapshot; a replayed stage
         cannot interleave with its own earlier half-write).
"""

from __future__ import annotations

from unittest import mock

import pytest

from sneaky_data_matcher_spark.sources import io as tio


def _mock_tableio(fmt: str = "parquet"):
    """TableIO wired to a MagicMock SparkSession with the Iceberg branch
    forced ON (jar detection bypassed — that's the point)."""
    spark = mock.MagicMock(name="spark")
    with mock.patch.object(tio, "_iceberg_available", return_value=True):
        t = tio.TableIO(spark, base="/ignored", catalog="cat.db", fmt=fmt)
    assert t.use_iceberg
    return t, spark


def test_save_overwrite_routes_to_create_or_replace():
    t, _ = _mock_tableio()
    df = mock.MagicMock(name="df")
    t.save(df, "stage1", mode="overwrite")
    df.writeTo.assert_called_once_with("cat.db.stage1")
    df.writeTo.return_value.createOrReplace.assert_called_once_with()
    df.writeTo.return_value.append.assert_not_called()
    df.write.mode.assert_not_called()  # file path untouched


def test_save_append_and_append_route_to_append():
    t, _ = _mock_tableio()
    for call in (lambda df: t.save(df, "s", mode="append"),
                 lambda df: t.append(df, "s")):
        df = mock.MagicMock(name="df")
        call(df)
        df.writeTo.assert_called_once_with("cat.db.s")
        df.writeTo.return_value.append.assert_called_once_with()
        df.writeTo.return_value.createOrReplace.assert_not_called()


def test_load_exists_delete_use_catalog_namespace():
    t, spark = _mock_tableio()
    t.load("matches")
    spark.table.assert_called_once_with("cat.db.matches")
    spark.read.format.assert_not_called()

    t.exists("matches")
    spark.catalog.tableExists.assert_called_once_with("cat.db.matches")

    t.delete("matches")
    spark.sql.assert_called_once_with("DROP TABLE IF EXISTS cat.db.matches")


def test_no_catalog_or_no_jar_falls_back_to_files(tmp_path):
    spark = mock.MagicMock(name="spark")
    # catalog given but jar absent
    with mock.patch.object(tio, "_iceberg_available", return_value=False):
        t = tio.TableIO(spark, base=str(tmp_path), catalog="cat.db")
    assert not t.use_iceberg
    # no catalog at all (jar present is irrelevant)
    with mock.patch.object(tio, "_iceberg_available", return_value=True):
        t2 = tio.TableIO(spark, base=str(tmp_path), catalog=None)
    assert not t2.use_iceberg


# ---------------------------------------------------------------------------
# Snapshot-store semantics the resume path relies on
# ---------------------------------------------------------------------------


class FakeIcebergCatalog:
    """Minimal snapshot-committing table store: each commit atomically
    installs a new snapshot with a strictly-increasing id; readers always
    see the latest COMMITTED snapshot (never a half-write)."""

    def __init__(self) -> None:
        self._next_snapshot = 0
        self.tables: dict[str, list[tuple[int, tuple]]] = {}

    def commit(self, name: str, rows: tuple, replace: bool) -> int:
        self._next_snapshot += 1
        sid = self._next_snapshot
        history = self.tables.setdefault(name, [])
        if replace or not history:
            history.append((sid, rows))
        else:
            history.append((sid, history[-1][1] + rows))
        return sid

    def read(self, name: str) -> tuple:
        return self.tables[name][-1][1]

    def exists(self, name: str) -> bool:
        return name in self.tables

    def snapshot_ids(self, name: str) -> list[int]:
        return [sid for sid, _ in self.tables.get(name, [])]


def test_snapshot_ids_strictly_monotonic():
    cat = FakeIcebergCatalog()
    sids = [cat.commit("t", (i,), replace=False) for i in range(5)]
    assert sids == sorted(sids) and len(set(sids)) == 5
    assert cat.snapshot_ids("t") == sids


def test_recommit_is_idempotent_in_content():
    """Replaying a stage's createOrReplace (the resume story: the driver
    died after computing but we don't know if the commit landed) must
    leave the table reading back exactly one stage output — re-commit
    adds a snapshot but not duplicate rows."""
    cat = FakeIcebergCatalog()
    stage_out = (1, 2, 3)
    cat.commit("stage", stage_out, replace=True)
    first_read = cat.read("stage")
    cat.commit("stage", stage_out, replace=True)  # replay
    assert cat.read("stage") == first_read == stage_out
    # the replay is visible in history (audit), invisible in content
    assert len(cat.snapshot_ids("stage")) == 2


def test_append_accumulates_but_never_tears():
    cat = FakeIcebergCatalog()
    cat.commit("log", (1,), replace=False)
    cat.commit("log", (2,), replace=False)
    assert cat.read("log") == (1, 2)
    # a reader mid-sequence sees a committed prefix, never a partial batch
    assert all(
        cat.tables["log"][i][1] == tuple(range(1, i + 2))
        for i in range(len(cat.tables["log"]))
    )


def test_exists_means_committed_snapshot():
    """exists() must reflect a committed snapshot — the same contract the
    parquet fallback implements with the _SUCCESS marker."""
    cat = FakeIcebergCatalog()
    assert not cat.exists("pending")
    cat.commit("pending", (0,), replace=True)
    assert cat.exists("pending")


def test_format_validation_still_applies():
    spark = mock.MagicMock(name="spark")
    with pytest.raises(ValueError):
        tio.TableIO(spark, base="/x", catalog=None, fmt="avro")
