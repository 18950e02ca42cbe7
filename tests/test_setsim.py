"""PPJoin prefix-filtered set-similarity join: must equal the exhaustive
all-pairs Jaccard join EXACTLY (prefix filtering is lossless), while
probing far fewer candidate pairs."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import setsim
from sneaky_data_matcher_spark.sources.spans import spans_to_text


def _exhaustive(docs_rows, t):
    """Single-node oracle: all-pairs Jaccard over distinct token sets."""
    sets = {}
    for doc_id, text in docs_rows:
        toks = frozenset(x for x in text.split(" ") if x != "")
        if toks:
            sets[doc_id] = toks
    ids = sorted(sets)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= t:
                out.add((a, b))
    return out


def test_ppjoin_exact_vs_exhaustive(spark, synth_corpus):
    docs, _ = synth_corpus
    canon = spans_to_text(docs).select("doc_id", F.lower(F.col("doc_text")).alias("doc_text"))
    rows = [(r["doc_id"], r["doc_text"]) for r in canon.collect()]
    for t in (0.6, 0.7):  # synth corpus max pair jaccard is 0.75
        want = _exhaustive(rows, t)
        got = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in setsim.ppjoin_pairs(canon, threshold=t).collect()
        }
        assert got == want, f"t={t}: missing={want - got} extra={got - want}"
        assert len(want) > 0  # the synth corpus has real near-dups


def test_ppjoin_prunes_candidates(spark, synth_corpus):
    docs, _ = synth_corpus
    canon = spans_to_text(docs).select("doc_id", F.lower(F.col("doc_text")).alias("doc_text"))
    t = 0.7
    sets = setsim._rank_ordered(setsim.token_sets(canon))
    n_docs = sets.count()
    plen = (F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1).cast("int")
    pref = sets.select("doc_id", F.explode(F.slice("ordered", 1, plen)).alias("token"))
    a, b = pref.alias("a"), pref.alias("b")
    n_cand = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    all_pairs = n_docs * (n_docs - 1) // 2
    # rare-first prefix indexing must prune the quadratic space hard; the
    # 600-doc synth corpus has a deliberately small vocabulary (worst case
    # for prefix filtering) and still measures ~9% here WITHOUT the length
    # filter the real operator adds
    assert n_cand < all_pairs * 0.12, (n_cand, all_pairs)


def test_ppjoin_sql_twin_matches_spark(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma epsilon"),
        (3, "alpha beta gamma delta"),
        (4, "zeta eta theta iota"),
        (5, "zeta eta theta iota kappa"),
        (6, "unrelated words only here"),
        (7, ""),
        (8, "alpha"),
    ]
    canon = spark.createDataFrame(rows, "doc_id long, doc_text string")
    got = sorted(
        (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
        for r in setsim.ppjoin_pairs(canon, threshold=0.6).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE canon AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") t(doc_id, doc_text)"
    )
    want = sorted(tuple(r) for r in con.sql(setsim.ppjoin_sql(0.6)).fetchall())
    assert got == want
    assert (1, 3, 1.0) in got  # identical sets
    assert (4, 5, 0.8) in got  # 4/5 overlap


def _brute_tfidf_cosine(rows, threshold, max_df):
    """Independent Python oracle: idf-weighted set cosine with the same
    stopband + decimal quantization semantics."""
    import math
    from decimal import Decimal

    sets = {i: set(t.split()) - {""} for i, t in rows}
    sets = {i: s for i, s in sets.items() if s}
    n = len(sets)
    df = {}
    for s in sets.values():
        for t in s:
            df[t] = df.get(t, 0) + 1
    w2 = {
        t: Decimal(str(round(math.log(1.0 + n / d) ** 2, 6)))
        for t, d in df.items()
        if d <= max_df
    }
    out = []
    ids = sorted(sets)
    for ix, a in enumerate(ids):
        for b in ids[ix + 1 :]:
            sa = {t for t in sets[a] if t in w2}
            sb = {t for t in sets[b] if t in w2}
            shared = sa & sb
            if not shared:
                continue
            dot = float(sum(w2[t] for t in shared))
            na = math.sqrt(float(sum(w2[t] for t in sa)))
            nb = math.sqrt(float(sum(w2[t] for t in sb)))
            c = dot / (na * nb)
            if c >= threshold:
                out.append((a, b, round(c, 6)))
    return sorted(out)


def test_tfidf_cosine_vs_brute_force(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma epsilon"),
        (3, "alpha beta gamma delta"),
        (4, "zeta eta theta iota"),
        (5, "zeta eta theta iota kappa"),
        (6, "unrelated words only here"),
        (7, ""),
        (8, "alpha"),
    ]
    canon = spark.createDataFrame(rows, "doc_id long, doc_text string")
    got = sorted(
        (r["doc_id_a"], r["doc_id_b"], r["cosine"])
        for r in setsim.tfidf_cosine_pairs(canon, threshold=0.3, max_df=100).collect()
    )
    want = _brute_tfidf_cosine(rows, 0.3, 100)
    assert got == want
    assert (1, 3, 1.0) in got  # identical sets -> cosine exactly 1


def test_tfidf_cosine_stopband_drops_hot_tokens(spark):
    # 'common' appears in every doc; with max_df=2 it is excluded from the
    # vocabulary, so docs sharing ONLY 'common' never pair.
    rows = [
        (1, "common rare1"),
        (2, "common rare2"),
        (3, "common rare1"),
    ]
    canon = spark.createDataFrame(rows, "doc_id long, doc_text string")
    got = sorted(
        (r["doc_id_a"], r["doc_id_b"])
        for r in setsim.tfidf_cosine_pairs(canon, threshold=0.1, max_df=2).collect()
    )
    assert got == [(1, 3)]  # rare1-only overlap; 'common' stopbanded (df=3)
    # and the retained-vocab cosine of (1,3) is exactly 1.0
    full = setsim.tfidf_cosine_pairs(canon, threshold=0.1, max_df=2).collect()
    assert full[0]["cosine"] == 1.0


def test_tfidf_cosine_sql_twin_matches_spark(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma epsilon"),
        (3, "alpha beta gamma delta"),
        (4, "zeta eta theta iota"),
        (5, "zeta eta theta iota kappa"),
        (6, "unrelated words only here"),
        (7, ""),
        (8, "alpha"),
    ]
    canon = spark.createDataFrame(rows, "doc_id long, doc_text string")
    got = sorted(
        (r["doc_id_a"], r["doc_id_b"], r["cosine"])
        for r in setsim.tfidf_cosine_pairs(canon, threshold=0.3, max_df=100).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE canon AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") t(doc_id, doc_text)"
    )
    want = sorted(tuple(r) for r in con.sql(setsim.tfidf_cosine_sql(0.3, 100)).fetchall())
    assert got == want


def test_soft_tfidf_credits_typos(spark):
    """Soft TF-IDF scores near-1 for per-token typos where exact-token
    cosine scores 0; identical docs score ~1; disjoint docs score 0."""
    from sneaky_data_matcher_spark.operators.setsim import soft_tfidf_pairs

    canon = spark.createDataFrame(
        [
            (1, "jonathan smith acme"),
            (2, "jonathon smyth acme"),   # typos of 1's tokens
            (3, "jonathan smith acme"),   # identical to 1
            (4, "zzz qqq rrr"),           # disjoint
        ],
        "doc_id int, doc_text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "doc_id_a int, doc_id_b int"
    )
    # jw(smith, smyth) = 0.8933 — the 0.85 threshold admits all 3 tokens
    out = {
        (r.doc_id_a, r.doc_id_b): r.soft_tfidf
        for r in soft_tfidf_pairs(pairs, canon, jw_threshold=0.85).collect()
    }
    assert out[(1, 4)] == 0.0
    assert out[(1, 3)] > 0.999          # identical up to quantization
    assert 0.9 < out[(1, 2)] <= out[(1, 3)]  # typo'd tokens still credited
    # at a 0.9 bar the smyth token falls out but the pair still scores
    strict = {
        (r.doc_id_a, r.doc_id_b): r.soft_tfidf
        for r in soft_tfidf_pairs(pairs, canon, jw_threshold=0.9).collect()
    }
    assert 0.0 < strict[(1, 2)] < out[(1, 2)]


def test_soft_tfidf_matches_duckdb_twin(spark):
    import duckdb

    from sneaky_data_matcher_spark.operators.setsim import (
        soft_tfidf_pairs,
        soft_tfidf_sql_ctes,
    )

    docs = [
        (i, " ".join(f"tok{(i * 7 + j * 3) % 11}" for j in range(1 + i % 4)))
        for i in range(1, 21)
    ]
    prs = [(a, b) for a in range(1, 21) for b in range(a + 1, 21) if (a + b) % 3]
    canon = spark.createDataFrame(docs, "doc_id int, doc_text string")
    pairs = spark.createDataFrame(prs, "doc_id_a int, doc_id_b int")
    got = sorted(
        tuple(r) for r in soft_tfidf_pairs(pairs, canon, 0.9).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE c(doc_id INT, doc_text VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", docs)
    con.execute("CREATE TABLE p(doc_id_a INT, doc_id_b INT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", prs)
    exp = sorted(
        con.execute(
            "WITH "
            + soft_tfidf_sql_ctes("p", "c", 0.9)
            + " SELECT doc_id_a, doc_id_b, soft_tfidf FROM soft_out"
        ).fetchall()
    )
    assert got == [tuple(e) for e in exp]
