"""Structured-Streaming variants: incremental ingest and probe matching.

The reference has no streaming operators — its resumability is offset-based
batch (SURVEY.md §2 X2: re-read source, skip `processed` rows). The Spark-
native generalization is a streaming ingest: new document files appear in a
directory (→ Kafka/Iceberg CDC in production), are canonicalized with the
SAME column expressions as batch, keyed, and either appended to the corpus
or matched against a static corpus snapshot (stream-static join — the
streaming twin of operators/search.probe_match).

Windowed event aggregation over the driver's `events` table demonstrates
watermark + tumbling-window state handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import canonicalize_docs
from ..sources.spans import SPAN_SCHEMA


def stream_canonicalize(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream over a spans-table directory -> canonical keys stream.
    Identical column expressions as the batch stage (one code path)."""
    schema = f"doc_id string, spans {SPAN_SCHEMA}"
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return canonicalize_docs(stream)


def stream_probe_match(
    probe_stream: DataFrame, corpus_keys: DataFrame, key_col: str = "doc_text"
) -> DataFrame:
    """Stream-static equi-join: each arriving probe doc matches corpus docs
    with equal canonical key. corpus_keys is a static snapshot (broadcast
    if small). The LIMIT-1-per-probe of the reference requires per-group
    top-k which streaming forbids without watermark aggregation — emit all
    equality matches; downstream dedups."""
    c = corpus_keys.select(
        F.col("doc_id").alias("corpus_doc_id"), F.col(key_col).alias("k")
    )
    p = probe_stream.select(
        F.col("doc_id").alias("probe_doc_id"), F.col(key_col).alias("k")
    )
    return p.join(c, "k").select("probe_doc_id", "corpus_doc_id")


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data watermark."""
    # Parquet timestamps surface as TIMESTAMP_NTZ; watermarks require the
    # session-TZ TIMESTAMP type (session is pinned UTC, so values are equal).
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(
    spark: SparkSession, stream_df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a bounded stream to completion synchronously (test/smoke
    harness): memory sink + processAllAvailable. Use output_mode='complete'
    for windowed aggregations (append would withhold open windows)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
