"""Adapter: driver testdata ``documents.parquet`` -> engine frames.

The driver's flat table (doc_id:int64, text, lang, source, n_chars) plays
the role of the reference's uploaded CSVs. This module derives:

  canon(doc_id, doc_text, lang, source)   -- TLC+NRM canonical text
  keys(doc_id, key_kind, value)           -- long keys frame for search ops
       key_kinds: 'text' (full canonical), 'tok0' (first token),
                  'lang', 'source'

and exposes matching DuckDB SQL (CTE text) so __spark_entry__.oracle_sql()
compares identical semantics. Keep the two in lock-step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.canonicalize import nrm, tlc, nrm_sql


def canon_frame(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        nrm(tlc(F.col("text"))).alias("doc_text"),
        "lang",
        "source",
    )


def keys_frame(docs: DataFrame) -> DataFrame:
    c = canon_frame(docs)
    nonblank = c.where(F.col("doc_text") != "")
    return (
        nonblank.select("doc_id", F.lit("text").alias("key_kind"), F.col("doc_text").alias("value"))
        .unionByName(
            nonblank.select(
                "doc_id",
                F.lit("tok0").alias("key_kind"),
                F.split(F.col("doc_text"), " ")[0].alias("value"),
            )
        )
        .unionByName(c.select("doc_id", F.lit("lang").alias("key_kind"), F.col("lang").alias("value")))
        .unionByName(c.select("doc_id", F.lit("source").alias("key_kind"), F.col("source").alias("value")))
    )


# --- DuckDB twins ---------------------------------------------------------

CANON_CTE = (
    "canon AS MATERIALIZED (SELECT doc_id, "
    + nrm_sql("lower(text)")
    + " AS doc_text, lang, source FROM documents)"
)

KEYS_CTE = (
    CANON_CTE
    + ", keys AS MATERIALIZED ("
    "SELECT doc_id, 'text' AS key_kind, doc_text AS value FROM canon WHERE doc_text <> ''"
    " UNION ALL SELECT doc_id, 'tok0', string_split(doc_text, ' ')[1] FROM canon WHERE doc_text <> ''"
    " UNION ALL SELECT doc_id, 'lang', lang FROM canon"
    " UNION ALL SELECT doc_id, 'source', source FROM canon)"
)
