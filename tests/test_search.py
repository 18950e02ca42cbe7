"""Regression tests for the query surface (operators/search.py).

The multi-valued-key probe test pins the VERDICT r1 "what's wrong #3" bug:
in the reference's cell model a doc can carry several values under one
key_kind (SearchRepository.java:231-236), and an AND over mappings counted
with a raw count(*) lets two hits on ONE mapping fake a two-mapping match.
"""

from __future__ import annotations

from sneaky_data_matcher_spark.operators import search as S


def test_probe_match_multivalued_key_no_false_positive(spark):
    # doc d1 carries TWO values under 'email' — probe p1's email matches one
    # of them twice is impossible (equality), but duplicated (doc, kind,
    # value) rows from two sources reproduce the double-hit: d1 has
    # ('email','a@x.com') twice and NO phone. Old count(*) logic saw n=2 ==
    # len(mappings) and matched; countDistinct(mapping_id) must not.
    keys = spark.createDataFrame(
        [
            ("d1", "email", "a@x.com"),
            ("d1", "email", "a@x.com"),  # same cell ingested from 2 sources
            ("d2", "email", "a@x.com"),
            ("d2", "phone", "5551234"),
        ],
        "doc_id string, key_kind string, value string",
    )
    probe = spark.createDataFrame(
        [("p1", "a@x.com", "5551234")],
        "probe_id string, email string, phone string",
    )
    out = S.probe_match(
        probe, keys, {"email": "email", "phone": "phone"}, limit_per_probe=10
    ).collect()
    assert {(r["probe_id"], r["doc_id"]) for r in out} == {("p1", "d2")}


def test_probe_match_multivalued_key_true_positive(spark):
    # multiple distinct values under one kind: matching ANY of them
    # satisfies that mapping (reference evaluates predicates over the label
    # union) — d1 matches via its second email plus its phone.
    keys = spark.createDataFrame(
        [
            ("d1", "email", "other@y.com"),
            ("d1", "email", "a@x.com"),
            ("d1", "phone", "5551234"),
        ],
        "doc_id string, key_kind string, value string",
    )
    probe = spark.createDataFrame(
        [("p1", "a@x.com", "5551234")],
        "probe_id string, email string, phone string",
    )
    out = S.probe_match(probe, keys, {"email": "email", "phone": "phone"}).collect()
    assert {(r["probe_id"], r["doc_id"]) for r in out} == {("p1", "d1")}
