"""Exact set-similarity self-join with prefix filtering (PPJoin-family).

The reference's only similarity machinery is exact key equality
(services/SearchService.java:165) — near-match joins are the gap this
module fills, EXACTLY (unlike dedup.py's MinHash/SimHash paths, which
are probabilistic): every pair with token-set Jaccard >= t is returned,
no false negatives, at a fraction of the all-pairs cost.

Method (Chaudhuri et al. SSJoin / Xiao et al. PPJoin, public VLDB/ICDE
literature):
  1. order the vocabulary by ascending global document frequency
     (rarest first) — any total order works for correctness, rare-first
     minimizes candidate counts;
  2. sort each document's distinct-token set in that order;
  3. a pair with Jaccard >= t and sizes (na, nb) must share a token in
     each side's PREFIX of length n - ceil(t * n) + 1 (pigeonhole:
     Jaccard >= t implies overlap >= ceil(t * max(na, nb)) >
     n - prefix(n)), so an inverted index over prefix tokens only yields
     a complete candidate set;
  4. verify candidates with the exact Jaccard on the full sets, with the
     PPJoin length filter (nb >= ceil(t * na)) applied inside the
     candidate join before any payload moves.

Scale notes (100 TB): the vocabulary rank frame is (token, rank) — built
with one groupBy(token) agg and joined back on token (NOT broadcast: a
web-corpus vocabulary exceeds driver memory; the join shuffles bare
(doc_id, token) pairs). Per-doc re-sorting is one groupBy(doc_id) with
array_sort over (rank, token) structs. The candidate join explodes ONLY
prefix tokens (for t=0.7, ~30% of each set), and blocks on the rarest
tokens by construction, so block sizes stay small without a census; the
verify step joins the two full token arrays back by doc_id AFTER bare-id
pair dedup, mirroring dedup.py's r2 lesson (never carry payload through
the pair shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_sets(canon: DataFrame) -> DataFrame:
    """(doc_id, doc_text) -> (doc_id, toks array<string> distinct, n)."""
    toks = F.array_distinct(
        F.filter(F.split(F.col("doc_text"), " "), lambda x: x != "")
    )
    return canon.select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("n")
    ).filter(F.col("n") > 0)


def _rank_ordered(sets: DataFrame) -> DataFrame:
    """Re-sort each doc's toks by (global df ASC, token ASC); adds
    `ordered` array<string>. No numeric rank is materialized — the
    (df, token) struct IS the sort key, so there is no global window /
    zipWithIndex over the vocabulary, just one groupBy(token) agg and
    one groupBy(doc_id) re-collect."""
    long = sets.select("doc_id", F.explode("toks").alias("token"))
    df_counts = long.groupBy("token").agg(F.count("*").alias("df"))
    ranked = long.join(df_counts, "token").select("doc_id", "df", "token")
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "token"))).alias("rt"),
        )
        .select(
            "doc_id",
            F.col("rt.token").alias("ordered"),
            F.size("rt").alias("n"),
        )
    )


def ppjoin_pairs(canon: DataFrame, threshold: float = 0.7) -> DataFrame:
    """All pairs (doc_id_a < doc_id_b) with token-set Jaccard >=
    threshold -> (doc_id_a, doc_id_b, jaccard). Exact: prefix filtering
    is lossless for Jaccard."""
    t = float(threshold)
    sets = _rank_ordered(token_sets(canon))
    # prefix length n - ceil(t*n) + 1
    plen = (F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1).cast("int")
    pref = sets.select(
        "doc_id",
        "n",
        F.explode(F.slice("ordered", 1, plen)).alias("token"),
    )
    a = pref.alias("a")
    b = pref.alias("b")
    # length filter: t <= J(a,b) <= min(na,nb)/max(na,nb) => nb in
    # [ceil(t*na), floor(na/t)]; with doc_id_a < doc_id_b both orders of
    # each unordered pair are probed, so one-sided nb >= ceil(t*na) AND
    # na >= ceil(t*nb) is the symmetric form.
    cand = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.n") >= F.ceil(F.lit(t) * F.col("a.n")))
            & (F.col("a.n") >= F.ceil(F.lit(t) * F.col("b.n"))),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )
    # verify on full sets — attach payload only after the bare-id dedup
    sa = sets.select(
        F.col("doc_id").alias("doc_id_a"), F.col("ordered").alias("toks_a")
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_id_b"), F.col("ordered").alias("toks_b")
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        cand.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .filter(jac >= t)  # threshold on the UNROUNDED value, like the twin
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(jac, 6).alias("jaccard"),
        )
    )


def tfidf_cosine_pairs(
    canon: DataFrame, threshold: float = 0.6, max_df: int = 100
) -> DataFrame:
    """All pairs (doc_id_a < doc_id_b) with idf-weighted cosine >=
    threshold over token SETS -> (doc_id_a, doc_id_b, cosine).

    Weighted comparator semantics (Bayardo et al. WWW'07 family): with
    set-valued docs the per-doc weight of token t is the global
    w_t = ln(1 + N/df_t), so dot(a,b) = sum_{t in a∩b} w_t^2 and
    ||a|| = sqrt(sum_{t in a} w_t^2). Tokens with df > max_df are
    excluded from BOTH weighting and matching — a stopband, i.e. the
    score is DEFINED over the filtered vocabulary (standard IR stop-word
    removal), not an approximation of the unfiltered score.

    Exactness + determinism: w_t^2 is quantized to DECIMAL(18,6), so
    every sum here (per-pair dot via groupBy, per-doc norm^2) is exact
    integer arithmetic — order-independent, hence engine-independent; the
    only float ops are the final sqrt/divide on identical exact inputs.

    Scale notes (100 TB): the inverted-index join explodes only retained
    tokens, and `max_df` bounds the hottest posting list by construction
    (pair mass per token <= max_df^2) — no census needed. The pair
    shuffle carries (ids, one decimal); norms join on bare ids after the
    per-pair aggregation. One groupBy(token), one index self-join, one
    groupBy(pair), two bare-id joins.
    """
    t = float(threshold)
    sets = token_sets(canon)
    long = sets.select("doc_id", F.explode("toks").alias("token"))
    df_counts = long.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = sets.agg(F.count("*").alias("n_docs"))
    w = F.log(
        1.0 + F.col("n_docs").cast("double") / F.col("df").cast("double")
    )
    weighted = (
        long.join(df_counts.where(F.col("df") <= max_df), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(w * w, 6).cast("decimal(18,6)").alias("w2"),
        )
    )
    norms = weighted.groupBy("doc_id").agg(F.sum("w2").alias("norm2"))
    a = weighted.alias("a")
    b = weighted.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(F.sum(F.col("a.w2")).alias("dot"))
    )
    na = norms.select(
        F.col("doc_id").alias("doc_id_a"), F.col("norm2").alias("n2a")
    )
    nb = norms.select(
        F.col("doc_id").alias("doc_id_b"), F.col("norm2").alias("n2b")
    )
    cos = F.col("dot").cast("double") / F.sqrt(
        F.col("n2a").cast("double") * F.col("n2b").cast("double")
    )
    return (
        dots.join(na, "doc_id_a")
        .join(nb, "doc_id_b")
        .filter(cos >= t)
        .select("doc_id_a", "doc_id_b", F.round(cos, 6).alias("cosine"))
    )


def tfidf_cosine_sql(
    threshold: float = 0.6, max_df: int = 100, canon_rel: str = "canon"
) -> str:
    """DuckDB twin of `tfidf_cosine_pairs` — same definition, recomputed
    from scratch (df census, stopband, decimal-quantized w^2, exhaustive
    shared-token pair sum)."""
    t = float(threshold)
    return (
        "WITH ts AS MATERIALIZED (SELECT doc_id, "
        "list_distinct(list_filter(string_split(doc_text, ' '), x -> x <> '')) AS toks "
        f"FROM {canon_rel} "
        "WHERE len(list_filter(string_split(doc_text, ' '), x -> x <> '')) > 0), "
        "long AS MATERIALIZED (SELECT doc_id, unnest(toks) AS token FROM ts), "
        "dfc AS (SELECT token, count(*) AS df FROM long GROUP BY token), "
        "nd AS (SELECT count(*) AS n_docs FROM ts), "
        "weighted AS MATERIALIZED (SELECT doc_id, l.token, "
        "CAST(round(ln(1.0 + CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) "
        "* ln(1.0 + CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS DECIMAL(18,6)) AS w2 "
        f"FROM long l JOIN dfc USING (token) CROSS JOIN nd WHERE df <= {max_df}), "
        "norms AS (SELECT doc_id, sum(w2) AS norm2 FROM weighted GROUP BY doc_id), "
        "dots AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, sum(a.w2) AS dot "
        "FROM weighted a JOIN weighted b ON a.token = b.token AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2) "
        "SELECT doc_id_a, doc_id_b, "
        "round(CAST(dot AS DOUBLE) / sqrt(CAST(na.norm2 AS DOUBLE) * CAST(nb.norm2 AS DOUBLE)), 6) AS cosine "
        "FROM dots JOIN norms na ON dots.doc_id_a = na.doc_id "
        "JOIN norms nb ON dots.doc_id_b = nb.doc_id "
        "WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na.norm2 AS DOUBLE) * CAST(nb.norm2 AS DOUBLE)) "
        f">= {t}"
    )


def ppjoin_sql(threshold: float = 0.7, canon_rel: str = "canon") -> str:
    """DuckDB twin: EXHAUSTIVE all-pairs Jaccard (the oracle is the
    definition, not the algorithm — prefix filtering must return exactly
    this set)."""
    t = float(threshold)
    return (
        "WITH ts AS (SELECT doc_id, "
        "list_distinct(list_filter(string_split(doc_text, ' '), x -> x <> '')) AS toks "
        f"FROM {canon_rel} "
        "WHERE len(list_filter(string_split(doc_text, ' '), x -> x <> '')) > 0) "
        "SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, "
        "round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) "
        "/ CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE), 6) AS jaccard "
        "FROM ts a JOIN ts b ON a.doc_id < b.doc_id "
        "WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) "
        f"/ CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE) >= {t}"
    )


def soft_tfidf_pairs(
    pairs: DataFrame, canon: DataFrame, jw_threshold: float = 0.9
) -> DataFrame:
    """Soft TF-IDF (Cohen, Ravikumar & Fienberg, IIWeb 2003) over
    CANDIDATE pairs: TF-IDF cosine where tokens also match SOFTLY — a
    token a of doc A contributes V(a,A)·V(b*,B)·jw(a,b*) when its best
    Jaro-Winkler partner b* in B clears `jw_threshold`. The measure that
    made hybrid similarity standard in record linkage: tolerant to token
    reordering (like cosine) AND per-token typos (like JW), where plain
    tfidf_cosine_pairs credits only exact token equality.

    Weights follow this module's tfidf_cosine_pairs conventions exactly:
    w_t = ln(1 + N/df_t); per-doc norm uses the DECIMAL(18,6)-quantized
    w² sum (exact, order/engine-independent); V(t,S) = w_t / norm(S).
    Determinism of the float tail: the best partner per (pair, a-token)
    is row_number over (jw DESC, V_b DESC) — ties beyond that have equal
    terms — and each term V_a·V_b·jw is floor-quantized to 1e-9 and
    summed as exact BIGINTs, so the per-pair sum is order-independent.
    Pairs with NO soft-matching token score 0.0. Note the textbook
    measure is directional (it iterates A's tokens); this returns the
    A→B direction on (doc_id_a, doc_id_b) as given.

    Scale shape: per-pair token cross product — O(|A|·|B|) jw kernel
    calls per CANDIDATE pair (Arrow-batched DuckDB, no per-row Python),
    strictly a post-blocking verifier like monge_elkan. Joins key on the
    pair ids; the df census and n_docs reduce exactly as in
    tfidf_cosine_pairs.
    """
    from pyspark.sql import Window

    from ..functions.similarity import jaro_winkler

    sets = token_sets(canon)
    long = sets.select("doc_id", F.explode("toks").alias("token"))
    df_counts = long.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = sets.agg(F.count("*").alias("n_docs"))
    w = F.log(1.0 + F.col("n_docs").cast("double") / F.col("df").cast("double"))
    weighted = (
        long.join(df_counts, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            w.alias("w"),
            F.round(w * w, 6).cast("decimal(18,6)").alias("w2"),
        )
    )
    norms = weighted.groupBy("doc_id").agg(
        F.sqrt(F.sum("w2").cast("double")).alias("nrm")
    )
    v = weighted.join(norms, "doc_id").select(
        "doc_id", "token", (F.col("w") / F.col("nrm")).alias("v")
    )
    a = pairs.join(
        v.select(
            F.col("doc_id").alias("doc_id_a"),
            F.col("token").alias("tok_a"),
            F.col("v").alias("va"),
        ),
        "doc_id_a",
    )
    cross = a.join(
        v.select(
            F.col("doc_id").alias("doc_id_b"),
            F.col("token").alias("tok_b"),
            F.col("v").alias("vb"),
        ),
        "doc_id_b",
    )
    scored = cross.withColumn("jw", jaro_winkler(F.col("tok_a"), F.col("tok_b")))
    win = Window.partitionBy("doc_id_a", "doc_id_b", "tok_a").orderBy(
        F.col("jw").desc(), F.col("vb").desc()
    )
    # Threshold AFTER the rank, not before: equivalent (the rank-1 row
    # carries the per-(pair, a-token) MAX jw, so pre- and post-filtering
    # keep exactly the same rows) and it stops Catalyst inlining the
    # Arrow UDF into a below-window Filter, which would evaluate the
    # kernel TWICE (plan-audited: one ArrowEvalPython, PLANS.md).
    best = (
        scored.withColumn("rn", F.row_number().over(win))
        .where((F.col("rn") == 1) & (F.col("jw") > jw_threshold))
    )
    term = F.floor(F.col("va") * F.col("vb") * F.col("jw") * 1e9).cast("long")
    sums = best.groupBy("doc_id_a", "doc_id_b").agg(
        (F.sum(term).cast("double") / 1e9).alias("soft")
    )
    return pairs.join(sums, ["doc_id_a", "doc_id_b"], "left").select(
        "doc_id_a",
        "doc_id_b",
        F.round(F.coalesce("soft", F.lit(0.0)), 6).alias("soft_tfidf"),
    )


def soft_tfidf_sql_ctes(
    pairs_rel: str, canon_rel: str, jw_threshold: float = 0.9
) -> str:
    """DuckDB twin CTE chain for soft_tfidf_pairs; final relation
    `soft_out` has (doc_id_a, doc_id_b, soft_tfidf). `canon_rel` needs
    (doc_id, doc_text); `pairs_rel` needs (doc_id_a, doc_id_b)."""
    return (
        f"st_sets AS (SELECT doc_id, list_distinct(list_filter("
        f"string_split(doc_text, ' '), x -> x <> '')) AS toks FROM {canon_rel} "
        "WHERE len(list_filter(string_split(doc_text, ' '), x -> x <> '')) > 0), "
        "st_long AS (SELECT doc_id, unnest(toks) AS token FROM st_sets), "
        "st_df AS (SELECT token, count(*) AS df FROM st_long GROUP BY token), "
        "st_n AS (SELECT count(*) AS n_docs FROM st_sets), "
        "st_w AS (SELECT doc_id, l.token, "
        "  ln(1.0 + CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS w, "
        "  CAST(round(ln(1.0 + CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) "
        "    * ln(1.0 + CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) "
        "    AS DECIMAL(18,6)) AS w2 "
        "  FROM st_long l JOIN st_df USING (token) CROSS JOIN st_n), "
        "st_nrm AS (SELECT doc_id, sqrt(CAST(sum(w2) AS DOUBLE)) AS nrm "
        "  FROM st_w GROUP BY doc_id), "
        "st_v AS (SELECT w.doc_id, token, w / nrm AS v "
        "  FROM st_w w JOIN st_nrm USING (doc_id)), "
        f"st_cross AS (SELECT p.doc_id_a, p.doc_id_b, "
        "  va.token AS tok_a, va.v AS va, vb.token AS tok_b, vb.v AS vb, "
        "  jaro_winkler_similarity(va.token, vb.token) AS jw "
        f"  FROM {pairs_rel} p "
        "  JOIN st_v va ON va.doc_id = p.doc_id_a "
        "  JOIN st_v vb ON vb.doc_id = p.doc_id_b), "
        f"st_best AS (SELECT * FROM (SELECT *, row_number() OVER ("
        "    PARTITION BY doc_id_a, doc_id_b, tok_a "
        "    ORDER BY jw DESC, vb DESC) AS rn "
        f"  FROM st_cross WHERE jw > {jw_threshold!r}) WHERE rn = 1), "
        "st_sums AS (SELECT doc_id_a, doc_id_b, "
        "  CAST(sum(CAST(floor(va * vb * jw * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS soft "
        "  FROM st_best GROUP BY doc_id_a, doc_id_b), "
        f"soft_out AS (SELECT p.doc_id_a, p.doc_id_b, "
        "  round(coalesce(s.soft, 0.0), 6) AS soft_tfidf "
        f"  FROM {pairs_rel} p LEFT JOIN st_sums s USING (doc_id_a, doc_id_b))"
    )
