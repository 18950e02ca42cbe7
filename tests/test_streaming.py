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
