"""Portable Soundex: three engines (Spark Column, DuckDB SQL, pure
Python) must agree byte-for-byte, since the code is a blocking key and a
one-bit disagreement silently drops candidate pairs."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.functions import phonetic as P

# Classic published examples (American Soundex with the H/W rule) plus
# crafted edge cases: letterless, single letter, H/W-only, vowel-first,
# punctuation, padding, leading/trailing whitespace.
CASES = [
    ("Robert", "R163"),
    ("Rupert", "R163"),
    ("Ashcraft", "A261"),
    ("Ashcroft", "A261"),
    ("Tymczak", "T522"),
    ("Pfister", "P236"),
    ("Honeyman", "H555"),
    ("Jackson", "J250"),
    ("Washington", "W252"),
    ("Lee", "L000"),
    ("Wu", "W000"),
    ("HW", "H000"),
    ("Aeiou", "A000"),
    ("a", "A000"),
    ("", ""),
    ("123", ""),
    ("O'Brien", "O165"),
    ("BOOTH-DAVIS", "B312"),
    ("  spaces  ", "S122"),
]


def test_soundex_py_golden():
    for raw, want in CASES:
        assert P.soundex_py(raw) == want, raw
    assert P.soundex_py(None) is None


def test_soundex_spark_matches_py(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)] + [(len(CASES), None)],
        "i long, raw string",
    )
    got = {
        r["i"]: r["code"]
        for r in df.select("i", P.soundex_col(F.col("raw")).alias("code")).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, CASES[i]
    assert got[len(CASES)] is None


def test_soundex_duckdb_matches_py():
    con = duckdb.connect()
    for raw, want in CASES:
        lit = "'" + raw.replace("'", "''") + "'"
        assert con.sql(f"SELECT {P.soundex_sql(lit)} AS c").fetchone()[0] == want, raw
    assert con.sql(f"SELECT {P.soundex_sql('NULL')} AS c").fetchone()[0] is None


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=24))
def test_soundex_py_vs_duckdb_property(s):
    # Full unicode alphabet: non-letters must be stripped identically.
    # Parameter-bound (not a literal) so NUL/quote bytes reach the engine.
    con = duckdb.connect()
    con.execute("CREATE OR REPLACE TABLE t AS SELECT ?::VARCHAR AS v", [s])
    got = con.sql(f"SELECT {P.soundex_sql('v')} AS c FROM t").fetchone()[0]
    assert got == P.soundex_py(s)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FF), max_size=16),
        min_size=1,
        max_size=40,
    )
)
def test_soundex_spark_vs_py_property(spark, vals):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", P.soundex_col(F.col("v")).alias("c")).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == P.soundex_py(v), repr(v)


def test_phonetic_pass_blocks_typos(spark):
    # Name-like doc_text variants with a typo land in the same sdx block.
    rows = [
        (1, "robert smith"),
        (2, "rupert smyth"),  # phonetically identical to 1
        (3, "gutierrez lee"),
    ]
    canon = spark.createDataFrame(rows, "doc_id long, doc_text string")
    keys = P.phonetic_pass(canon).collect()
    by_id = {r["doc_id"]: r["block_key"] for r in keys}
    assert by_id[1] == by_id[2] == "sdx:R163S530"
    assert by_id[3] == "sdx:G362L000"
    assert all(r["pass"] == "sdx" for r in keys)


def test_phonetic_pass_sql_twin_matches(spark):
    rows = [(i, t) for i, t in enumerate(
        ["robert smith", "rupert smyth", "a", "", "x 9"]
    )]
    canon = spark.createDataFrame(rows, "doc_id long, doc_text string")
    got = sorted(
        (r["doc_id"], r["pass"], r["block_key"])
        for r in P.phonetic_pass(canon).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE canon AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") t(doc_id, doc_text)"
    )
    want = sorted(tuple(r) for r in con.sql(P.phonetic_pass_sql()).fetchall())
    assert got == want
