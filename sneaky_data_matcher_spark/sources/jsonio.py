"""JSON-lines corpus ingest with explicit schema + corrupt-record capture.

Web-scale training corpora arrive as JSONL shards (Common-Crawl-derived
sets, chat logs, synthetic corpora) with a long tail of malformed lines;
silently dropping them (Spark's default DROPMALFORMED temptation) makes
corpus counts unauditable. This reader mirrors the CSV dialect reader's
philosophy (csvio.py): explicit schema — NEVER inferSchema on 100 TB,
that is a full extra pass — PERMISSIVE mode, and the corrupt raw line
preserved in a side column so bad records can be counted, sampled, and
re-parsed instead of vanishing.

Scale notes: JSONL is line-splittable, so a 100 TB directory parallelizes
per-128MB-split with no coordination; the JSON parse is JVM-side
(Jackson) inside the scan — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read JSONL with ``schema``; rows that fail to parse come back with
    every schema field null and the raw line in ``corrupt_col``.

    Implemented as text scan + ``from_json`` rather than
    ``spark.read.json`` with ``columnNameOfCorruptRecord``: the native
    reader forbids plans that reference ONLY the corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the usual
    workaround is caching the whole frame, a non-starter at 100 TB).
    ``from_json`` is the same JVM-side Jackson parse, returns a NULL
    struct on malformed input, and composes with any downstream plan."""
    full = T.StructType(
        schema.fields + [T.StructField(corrupt_col, T.StringType(), True)]
    )
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("_r")
    )
    return parsed.select(
        *[F.col(f"_r.{f.name}").alias(f.name) for f in full.fields]
    )


def split_corrupt(df: DataFrame, corrupt_col: str = CORRUPT_COL):
    """(good_rows_without_side_column, bad_raw_lines). A row is bad iff
    the corrupt column is non-null — Spark leaves it null on clean
    parses."""
    good = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.where(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, bad


DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def docs_from_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """The documents table from a JSONL shard directory (good rows only —
    use :func:`read_jsonl` + :func:`split_corrupt` directly to audit)."""
    good, _ = split_corrupt(read_jsonl(spark, path, DOCS_SCHEMA))
    return good
