"""Structured Streaming: windowed aggregation equals its batch twin;
stream-static probe match; streaming canonicalization parity."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.plans.pipeline import canonicalize_docs
from sneaky_data_matcher_spark.sources.spans import derive_spans
from sneaky_data_matcher_spark.streaming import incremental as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark):
    d = tempfile.mkdtemp()
    spark.read.parquet(f"{SF_DIR}/events.parquet").write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_windowed_counts_match_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    got = S.run_stream_to_memory(
        spark, S.windowed_event_counts(stream), "win_test", output_mode="complete"
    )
    want = S.windowed_event_counts(batch.withColumn("ts", F.col("ts").cast("timestamp")))
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0


def test_stream_probe_match_finds_all(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    spans = derive_spans(docs)
    canon = canonicalize_docs(spans)
    d = tempfile.mkdtemp()
    try:
        spans.limit(40).write.mode("overwrite").parquet(d)
        pstream = S.stream_canonicalize(spark, d)
        out = S.run_stream_to_memory(
            spark, S.stream_probe_match(pstream, canon), "probe_test"
        )
        rows = out.collect()
        # every probe doc matches at least itself (identical canonical text)
        assert {r["probe_doc_id"] for r in rows} == {
            r["doc_id"] for r in spark.read.parquet(d).select("doc_id").collect()
        }
        by_self = {r["probe_doc_id"] == r["corpus_doc_id"] for r in rows}
        assert True in by_self
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_candidate_pairs_match_batch(spark):
    """applyInPandasWithState incremental pair generation over a 2-batch
    document stream must emit exactly the batch block-self-join pair set
    (after cross-pass dedup, which both paths do downstream)."""
    from sneaky_data_matcher_spark.operators import blocking

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    spans = derive_spans(docs)
    canon = canonicalize_docs(spans).localCheckpoint(eager=True)

    # batch reference: unsalted candidate pairs
    keys = blocking.blocking_keys(canon)
    salted = (
        keys.withColumn("salt", F.lit(0))
        .withColumn("n_salts", F.lit(1))
        .withColumn("block_size", F.lit(None).cast("long"))
    )
    want = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in blocking.candidate_pairs(salted, cache=False).collect()
    }

    d = tempfile.mkdtemp()
    try:
        # two files + maxFilesPerTrigger=1 -> two micro-batches, so pair
        # emission genuinely spans state updates
        spans.limit(30).write.mode("overwrite").parquet(f"{d}/b0")
        import pyspark.sql.functions as SF
        spans.join(spans.limit(30).select("doc_id"), "doc_id", "left_anti").write.mode(
            "overwrite"
        ).parquet(f"{d}/b1")
        schema = spark.read.parquet(f"{d}/b0").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{d}/*")
        )
        keyed = blocking.blocking_keys(
            canonicalize_docs(stream), payload_cols=["doc_text"]
        )
        pairs = S.streaming_candidate_pairs(keyed)
        got_df = S.run_stream_to_memory(spark, pairs, "stream_pairs_test")
        got = {(r["doc_id_a"], r["doc_id_b"]) for r in got_df.collect()}
        assert got == want and len(want) > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_incremental_cc_matches_batch(spark):
    """Folding edges in two micro-batch-sized increments through
    incremental_cc_update must equal batch connected components over the
    union of all edges."""
    from sneaky_data_matcher_spark.operators.clustering import connected_components
    from sneaky_data_matcher_spark.sources.io import TableIO

    edges = [
        ("a", "b"), ("c", "d"), ("e", "f"),           # batch 1: three clusters
        ("b", "c"), ("x", "y"), ("f", "g"),           # batch 2: merge + new
    ]
    df = spark.createDataFrame(edges, "doc_id_a string, doc_id_b string")
    base = tempfile.mkdtemp()
    try:
        io = TableIO(spark, base)
        S.incremental_cc_update(io, df.limit(3))
        S.incremental_cc_update(io, df.subtract(df.limit(3)))
        got = {
            (r["doc_id"], r["cluster_id"]) for r in io.load("clusters").collect()
        }
        want = {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components(df).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_incremental_cluster_stream_e2e(spark):
    """Full streaming path: edges arrive as a 2-file stream, foreachBatch
    maintains the clusters table; final table equals batch CC."""
    from sneaky_data_matcher_spark.operators.clustering import connected_components
    from sneaky_data_matcher_spark.sources.io import TableIO

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("p", "q"), ("q", "r"), ("c", "p")],
        "doc_id_a string, doc_id_b string",
    )
    d = tempfile.mkdtemp()
    try:
        df.limit(2).write.mode("overwrite").parquet(f"{d}/edges/b0")
        df.subtract(df.limit(2)).write.mode("overwrite").parquet(f"{d}/edges/b1")
        schema = spark.read.parquet(f"{d}/edges/b0").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{d}/edges/*")
        )
        io = TableIO(spark, f"{d}/state")
        q = S.incremental_cluster_stream(
            stream, io, checkpoint_dir=f"{d}/ckpt"
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {(r["doc_id"], r["cluster_id"]) for r in io.load("clusters").collect()}
        want = {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components(df).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_er_topology_matches_batch(spark):
    """Full streaming ER (canonicalize -> stateful pair gen -> scoring ->
    incremental CC) over a 2-batch document stream must produce exactly
    the batch pipeline's non-singleton clusters (salting off on both
    sides; the streaming path never salts)."""
    from sneaky_data_matcher_spark.plans import pipeline as P
    from sneaky_data_matcher_spark.sources.io import TableIO

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    spans = derive_spans(docs).localCheckpoint(eager=True)
    cfg = P.PipelineConfig(threshold=0.85, salting_enabled=False)
    batch = P.run(spans, cfg)
    sizes = batch["clusters"].groupBy("cluster_id").count()
    multi = (
        batch["clusters"]
        .join(sizes.where(F.col("count") > 1), "cluster_id")
        .select("doc_id", "cluster_id")
    )
    want = {(r["doc_id"], r["cluster_id"]) for r in multi.collect()}
    assert len(want) > 0  # corpus must actually contain duplicates

    d = tempfile.mkdtemp()
    try:
        half = F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0
        spans.where(half).write.mode("overwrite").parquet(f"{d}/in/b0")
        spans.where(~half).write.mode("overwrite").parquet(f"{d}/in/b1")
        schema = spark.read.parquet(f"{d}/in/b0").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{d}/in/*")
        )
        io = TableIO(spark, f"{d}/state")
        q = S.streaming_er_topology(stream, io, cfg, checkpoint_dir=f"{d}/ckpt")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {(r["doc_id"], r["cluster_id"]) for r in io.load("clusters").collect()}
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)
