"""BM25 top-k vs a pure-Python reference implementation."""

from __future__ import annotations

import math

from sneaky_data_matcher_spark.functions import ranking as R

CORPUS = [
    (1, "spark table query spark spark"),
    (2, "table table table join agg"),
    (3, "query planner spark"),
    (4, "unrelated words only here"),
    (5, "spark spark spark spark spark spark spark spark"),
    (6, ""),
]


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in corpus}
    toks = {d: [x for x in t if x] for d, t in toks.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for d, t in toks.items():
        dl = len(t)
        s = 0.0
        for q in terms:
            tf = t.count(q)
            df = sum(1 for tt in toks.values() if q in tt)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        if s > 0:
            out[d] = s
    return out


def test_bm25_matches_reference_impl(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    terms = ["spark", "query"]
    got = {r["doc_id"]: (r["score"], r["rank"]) for r in R.bm25_topk(docs, terms, k=10).collect()}
    want = _py_bm25(CORPUS, terms)
    assert set(got) == set(want)
    for d, s in want.items():
        assert abs(got[d][0] - math.floor(s * 1e6) / 1e6) < 2e-6
    # ranks follow score desc, doc_id asc
    ranked = sorted(got.items(), key=lambda kv: kv[1][1])
    scores = [s for _, (s, _) in ranked]
    assert scores == sorted(scores, reverse=True)


def test_bm25_k_cut_and_zero_filter(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    out = R.bm25_topk(docs, ["spark"], k=2).collect()
    assert len(out) == 2
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]
    # doc 4 (no hits) and doc 6 (empty) never appear even with huge k
    allr = R.bm25_topk(docs, ["spark"], k=100).collect()
    assert {r["doc_id"] for r in allr}.isdisjoint({4, 6})


def test_bm25_sql_twin_agrees(spark):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", CORPUS)
    terms = ["spark", "table", "query"]
    oracle = {
        (r[0], r[2]): r[1]
        for r in con.sql(R.bm25_sql(terms, k=10)).fetchall()
    }
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rank"]): r["score"]
        for r in R.bm25_topk(docs, terms, k=10).collect()
    }
    assert got == oracle
