"""Quality checks: crafted violations, empty-table edge, single-scan plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import quality_checks as QC


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, 100),
            (2, "b", 20.0, 200),
            (2, None, -5.0, 999),  # dup id, null name, out of range, bad FK
            (4, "z", 30.0, 100),  # z not accepted
        ],
        "id long, name string, x double, fk long",
    )


def _ref(spark):
    return spark.createDataFrame([(100,), (200,)], "k long")


def test_metrics_and_passed(spark):
    out = QC.run_checks(
        _df(spark),
        [
            QC.completeness("name", threshold=1.0),
            QC.uniqueness("id", threshold=1.0),
            QC.in_range("x", 0, 100, threshold=0.9),
            QC.accepted_values("name", ["a", "b"], threshold=0.5),
            QC.references("fk", _ref(spark), "k", threshold=1.0),
        ],
    )
    got = {r["check"]: (r["metric"], r["passed"]) for r in out.collect()}
    assert got["completeness"] == (0.75, False)
    assert got["uniqueness"] == (0.75, False)
    assert got["in_range"] == (0.75, False)
    assert got["accepted_values"] == (0.5, True)
    assert got["references"] == (0.75, False)


def test_empty_table_vacuously_passes(spark):
    empty = _df(spark).where(F.lit(False))
    out = QC.run_checks(
        empty,
        [QC.completeness("name"), QC.uniqueness("id"),
         QC.references("fk", _ref(spark), "k")],
    )
    assert all(r["metric"] == 1.0 and r["passed"] for r in out.collect())


def test_row_local_checks_share_one_scan(spark, tmp_path):
    # all non-referential checks must fuse into a single FileScan
    p = str(tmp_path / "t")
    _df(spark).write.parquet(p)
    df = spark.read.parquet(p)
    out = QC.run_checks(
        df,
        [QC.completeness("name"), QC.in_range("x", 0, 100),
         QC.accepted_values("name", ["a"])],
    )
    plan = out._jdf.queryExecution().executedPlan().treeString()
    assert plan.count("FileScan parquet") == 1


def test_unknown_kind_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        QC.run_checks(_df(spark), [QC.Check("bogus", "id")])
