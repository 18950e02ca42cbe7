"""Batch-incremental ER vs committed golden records (operators/incremental_er)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators.incremental_er import incremental_match

SF_DIR = "/root/testdata/sf0.001"


def _frames(spark):
    golden = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta"),
            (20, "zulu yankee xray whiskey"),
            (30, "one two three four five six"),
        ],
        "cluster_id long, rep_text string",
    )
    newd = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta"),      # exact dup of entity 10
            (200, "alpha beta gamma deltaz"),     # near dup of entity 10
            (300, "totally unrelated fresh text"),  # new entity, no candidates
            (400, "zulu yankee foxtrot golf"),    # shares pfx key with 20, low score
        ],
        "doc_id long, doc_text string",
    )
    return newd, golden


def test_incremental_assignments(spark):
    newd, golden = _frames(spark)
    got = {r["doc_id"]: r for r in incremental_match(newd, golden).collect()}
    assert set(got) == {100, 200, 300, 400}
    assert got[100]["matched"] and got[100]["assigned_cluster"] == 10
    assert got[100]["best_score"] == 1.0
    assert got[200]["matched"] and got[200]["assigned_cluster"] == 10
    # no blocking candidate at all -> new entity, NULL score
    assert not got[300]["matched"]
    assert got[300]["assigned_cluster"] == 300 and got[300]["best_score"] is None
    # candidate found via the pfx/srt keys but below threshold -> new entity
    assert not got[400]["matched"] and got[400]["assigned_cluster"] == 400
    assert got[400]["best_score"] is not None


def test_incremental_never_rescans_base_text(spark):
    """The plan must read only the new batch and the golden table — the
    operator takes frames, so this is structural: no hidden corpus read."""
    newd, golden = _frames(spark)
    plan = incremental_match(newd, golden)._jdf.queryExecution().analyzed().toString()
    assert "parquet" not in plan.lower()


def test_incremental_batch_consistent_with_full_runs(spark):
    """Exact-duplicate batch docs of base docs land in the base doc's
    cluster (score 1.0 always clears the threshold)."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(30)
    from sneaky_data_matcher_spark.sources.flatdocs import canon_frame

    canon = canon_frame(base).where(F.col("doc_text") != "").select(
        "doc_id", "doc_text"
    )
    golden = canon.select(
        F.col("doc_id").alias("cluster_id"), F.col("doc_text").alias("rep_text")
    )
    newd = canon.select((F.col("doc_id") + 100000).alias("doc_id"), "doc_text")
    got = incremental_match(newd, golden).collect()
    assert got and all(r["matched"] for r in got)
    for r in got:
        # the duplicate's own source doc must be among the perfect scores;
        # ties resolve to the LOWEST cluster_id, so assigned <= source id
        assert r["best_score"] == 1.0
        assert r["assigned_cluster"] <= r["doc_id"] - 100000
