"""Gopher structural rules + HTML extraction (r3 continuation)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from sneaky_data_matcher_spark import entry_queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _run_on_docs(spark, name, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/documents.parquet")
        return {r["doc_id"]: r for r in Q.QUERIES[name](spark, td).collect()}


def test_gopher_rules_each_failure_mode(spark):
    base = "the quick brown fox jumps over a lazy dog and then rests " * 3
    rows = [
        (1, base, "en", "s", len(base)),                     # healthy -> passes
        (2, "short text", "en", "s", 10),                    # too few words
        (3, "#### " * 30 + base, "en", "s", 0),              # symbol ratio
        (4, "\n".join(["- bullet point here"] * 20), "en", "s", 0),  # bullets
        (5, "\n".join(["trailing off..."] * 20), "en", "s", 0),      # ellipsis lines
        (6, "12 34 " * 40 + "the a of", "en", "s", 0),       # alpha fraction
        (7, "zzz qqq " * 40, "en", "s", 0),                  # no stopwords
    ]
    got = _run_on_docs(spark, "gopher_rules", rows)
    assert got[1]["passes"] is True
    assert got[2]["passes"] is False and got[2]["n_words"] == 2
    assert got[3]["passes"] is False and got[3]["symbol_ratio"] > 0.1
    assert got[4]["passes"] is False and got[4]["frac_bullet"] == 1.0
    assert got[5]["passes"] is False and got[5]["frac_ellipsis"] == 1.0
    assert got[6]["passes"] is False and got[6]["frac_alpha"] < 0.8
    assert got[7]["passes"] is False and got[7]["stop_hits"] < 2
    # enrichment synthesizes the bullet/symbol paths from plain corpus text
    enriched = _run_on_docs(
        spark,
        "gopher_rules",
        [(8, "x agg y slow z hash w " * 10, "en", "s", 0)],
    )[8]
    assert enriched["frac_bullet"] > 0 and enriched["symbol_ratio"] > 0


def test_gopher_rules_sf_sanity(spark):
    rows = Q.QUERIES["gopher_rules"](spark, SF_DIR).collect()
    assert len(rows) == 500
    assert all(2 <= r["mean_word_len"] <= 10 for r in rows)
    assert any(r["passes"] for r in rows)


def test_html_extract_roundtrip_everywhere(spark):
    rows = Q.QUERIES["html_extract"](spark, SF_DIR).collect()
    assert len(rows) == 500
    assert all(r["roundtrip"] for r in rows)
    assert all(r["n_tags"] >= 8 for r in rows)  # html/body/h1/p at minimum


def test_html_extract_entities_and_tags(spark):
    got = _run_on_docs(
        spark, "html_extract", [(9, "alpha beta. gamma delta", "en", "src-1", 23)]
    )[9]
    assert got["clean_text"] == "Doc 9 & co alpha beta. gamma delta"
    # wrapping produced 2 <p> paragraphs: html,body,h1,/h1,p,/p,p,/p,/body,/html
    assert got["n_tags"] == 10
    assert got["roundtrip"] is True


def test_corpus_funnel_invariants(spark):
    """The funnel must be monotone non-increasing through stage 5 and the
    splits must partition the decontaminated survivors."""
    from sneaky_data_matcher_spark.entry_queries import corpus_funnel_q

    rows = {r["stage"]: r["n_docs"] for r in corpus_funnel_q(spark, SF_DIR).collect()}
    order = ["raw", "exact_dedup", "near_dedup", "quality", "decontam"]
    for a, b in zip(order, order[1:]):
        assert rows[a] >= rows[b], (a, b, rows)
    assert rows["train"] + rows["val"] + rows["test"] == rows["decontam"]
    assert rows["decontam"] > 0
