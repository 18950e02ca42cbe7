"""PII detection/redaction (functions/pii.py) — counts, Luhn, redaction
order, and Spark/DuckDB/Python three-way agreement on the shared patterns."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.functions import pii

SAMPLES = [
    ("plain", "no personal data here, just tokens and 42 numbers"),
    ("email", "write to jane.doe+spam@mail.example.co.uk today"),
    ("two_emails", "a@b.io and c_d%e@f-g.org"),
    ("ipv4", "server at 192.168.0.7 and public 8.8.8.8"),
    # \b can't see past a dot (RE2 has no lookaround), so the first four
    # octets of a longer dotted run DO match — documented limitation;
    # 999.1.1.1 stays out (no boundary splits 999)
    ("dotted_runs", "version 1.2.3.4.5 and 999.1.1.1 are not addresses"),
    ("ssn", "ssn 123-45-6789 on file"),
    ("card_luhn_ok", "visa 4012 8888 8888 1881 charged"),
    ("card_luhn_bad", "fake 4012 8888 8888 1882 rejected"),
    ("card_amex", "amex 3782-822463-10005 ok"),
    ("phone", "call +1 415-555-0173 or +44 20 7946 0958"),
    ("mixed", "ceo@corp.com leaked 4111111111111111 from 10.0.0.1"),
    ("empty", ""),
]


@pytest.fixture(scope="module")
def scanned(spark):
    df = spark.createDataFrame(SAMPLES, "doc_id string, text string")
    rows = pii.pii_scan(df, "doc_id", "text").collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_counts(scanned):
    assert scanned["plain"]["n_email"] == 0
    assert scanned["email"]["n_email"] == 1
    assert scanned["two_emails"]["n_email"] == 2
    assert scanned["ipv4"]["n_ipv4"] == 2
    assert scanned["dotted_runs"]["n_ipv4"] == 1  # the 1.2.3.4 window
    assert scanned["ssn"]["n_ssn"] == 1
    assert scanned["card_luhn_ok"]["n_card"] == 1
    assert scanned["card_luhn_bad"]["n_card"] == 0
    assert scanned["card_amex"]["n_card"] == 1
    assert scanned["phone"]["n_phone"] == 2
    assert scanned["mixed"]["n_email"] == 1
    assert scanned["mixed"]["n_card"] == 1
    assert scanned["mixed"]["n_ipv4"] == 1
    assert scanned["empty"]["n_email"] == 0


def test_redaction(scanned):
    assert scanned["email"]["redacted"] == "write to <EMAIL> today"
    assert scanned["ipv4"]["redacted"] == "server at <IP> and public <IP>"
    assert scanned["ssn"]["redacted"] == "ssn <SSN> on file"
    assert scanned["card_luhn_ok"]["redacted"] == "visa <CARD> charged"
    # redaction is conservative: Luhn-invalid candidates still masked
    assert scanned["card_luhn_bad"]["redacted"] == "fake <CARD> rejected"
    assert "<PHONE>" in scanned["phone"]["redacted"]
    assert scanned["mixed"]["redacted"] == "<EMAIL> leaked <CARD> from <IP>"
    # no raw PII survives in any redacted text
    for r in scanned.values():
        assert not re.search(pii.EMAIL_PAT, r["redacted"])
        assert not re.search(pii.SSN_PAT, r["redacted"])
        assert not re.search(pii.CARD_CANDIDATE_PAT, r["redacted"])


def test_luhn_spark_matches_python(spark):
    def luhn_py(s: str) -> bool:
        ds = re.sub(r"[^0-9]", "", s)
        if not 13 <= len(ds) <= 19:
            return False
        total = 0
        for i, ch in enumerate(reversed(ds), start=1):
            d = int(ch)
            total += d if i % 2 == 1 else (d * 2 - 9 if d * 2 > 9 else d * 2)
        return total % 10 == 0

    vals = [
        "4012888888881881", "4012 8888 8888 1882", "378282246310005",
        "5555555555554444", "1234567890123", "12345678901234567890",
        "0000000000000", "", "no digits",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["ok"]
        for r in df.select("s", pii.luhn_valid(F.col("s")).alias("ok")).collect()
    }
    for v in vals:
        assert got[v] == luhn_py(v), v


def test_duckdb_twin_agrees(spark):
    """Counts + redaction agree byte-for-byte with the DuckDB twin."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", SAMPLES)
    card = pii.CARD_CANDIDATE_PAT.replace("'", "''")
    sql = f"""
        SELECT doc_id,
          len(regexp_extract_all(text, '{pii.EMAIL_PAT}')) AS n_email,
          len(regexp_extract_all(text, '{pii.IPV4_PAT}')) AS n_ipv4,
          len(regexp_extract_all(text, '{pii.SSN_PAT}')) AS n_ssn,
          len(list_filter(regexp_extract_all(text, '{card}'),
              c -> {pii.luhn_valid_sql('c')})) AS n_card,
          len(regexp_extract_all(text, '{pii.PHONE_PAT.replace("'", "''")}')) AS n_phone,
          {pii.redact_sql('text')} AS redacted
        FROM t
    """
    duck = {r[0]: r for r in con.execute(sql).fetchall()}
    df = spark.createDataFrame(SAMPLES, "doc_id string, text string")
    rows = pii.pii_scan(df, "doc_id", "text").collect()
    for r in rows:
        d = duck[r["doc_id"]]
        assert (
            r["n_email"], r["n_ipv4"], r["n_ssn"], r["n_card"], r["n_phone"],
            r["redacted"],
        ) == (d[1], d[2], d[3], d[4], d[5], d[6]), r["doc_id"]
