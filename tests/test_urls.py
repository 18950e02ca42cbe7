"""URL canonicalization: rule-by-rule crafted cases, Spark/DuckDB twin
agreement on a hostile corpus, and idempotence."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.functions import urls

CASES = [
    # fragment + case + default port + www + trailing slash + param sort
    ("HTTP://WWW.Example.COM:80/a/b/?b=2&a=1#frag",
     "http://example.com/a/b?a=1&b=2"),
    ("https://Site.com:443/x", "https://site.com/x"),
    # explicit non-default port kept
    ("http://site.com:8080/x", "http://site.com:8080/x"),
    # duplicate slashes collapse; empty path becomes /
    ("https://a.com//p//q", "https://a.com/p/q"),
    ("https://a.com", "https://a.com/"),
    ("https://a.com/", "https://a.com/"),
    # tracking params dropped, empties dropped, rest sorted
    ("https://a.com/p?utm_source=x&z=9&fbclid=1&&a=2",
     "https://a.com/p?a=2&z=9"),
    # all params dropped -> no ?
    ("https://a.com/p?utm_campaign=x&gclid=2", "https://a.com/p"),
    # utm-prefixed only (utmx is NOT tracking)
    ("https://a.com/p?utmx=1", "https://a.com/p?utmx=1"),
    # ref exact-match dropped; referrer kept
    ("https://a.com/p?ref=hn&referrer=x", "https://a.com/p?referrer=x"),
    # root with query, whitespace trim
    ("  https://a.com?b=1 ", "https://a.com/?b=1"),
]


@pytest.mark.parametrize("raw,expect", CASES)
def test_canonical_rules(spark, raw, expect):
    got = (
        spark.range(1)
        .select(urls.canonical_url(F.lit(raw)).alias("c"))
        .collect()[0]["c"]
    )
    assert got == expect, raw


def test_sql_twin_agrees(spark):
    raws = [r for r, _ in CASES] + [
        "https://b.com/%7Euser/page?A=1&a=0",  # case-sensitive keys sort bytewise
        "HTTPS://A.com:443//",
        "http://h.com:80?x=&y=1",
    ]
    sdf = spark.createDataFrame([(r,) for r in raws], "raw string")
    got_spark = [
        r["c"]
        for r in sdf.select(urls.canonical_url(F.col("raw")).alias("c"))
        .collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.sql(
            "SELECT " + urls.canonical_url_sql("raw")
            + " AS c FROM (SELECT ?::VARCHAR AS raw)",
            params=[r],
        ).fetchone()[0]
        for r in raws
    ]
    assert got_spark == got_duck


def test_idempotent(spark):
    sdf = spark.createDataFrame([(r,) for r, _ in CASES], "raw string")
    once = sdf.select(urls.canonical_url(F.col("raw")).alias("c"))
    twice = once.select(urls.canonical_url(F.col("c")).alias("c"))
    assert [r["c"] for r in once.collect()] == [r["c"] for r in twice.collect()]
