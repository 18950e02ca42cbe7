"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023): select raw-corpus documents that look like a small target corpus by
importance-weighting hashed-n-gram bag distributions, then resampling with
the Gumbel top-k trick.

The reference has nothing like this (it matches records, it never curates
corpora), but it is a core operation for the 100 TB training-data pipeline
this engine targets: given ~100 TB of raw crawl and a few GB of trusted
target text (e.g. curated encyclopedic prose), keep the raw documents whose
hashed-n-gram distribution is closest to the target in likelihood-ratio
terms.

Method (faithful to the paper, deterministic end to end):
  - features: unigrams + bigrams of the whitespace token stream, hashed
    into ``buckets`` bins with the portable per-character Horner hash
    (same family as simhash/winnowing — chosen over xxhash so a DuckDB
    oracle replays the exact arithmetic);
  - both corpora reduce to per-bucket counts; add-one smoothing gives
    p̂ (target) and q̂ (raw);
  - a document's log importance weight is Σ_b c_b · ln(p̂_b / q̂_b) over
    its own bucket counts c_b — assembled as a ratio of EXACT int64
    products, one ln() per (doc, bucket), each term rounded to 9 decimals
    and summed as DECIMAL (order-independent; lm.py's float discipline);
  - resampling: Gumbel top-k — key = log_weight + g where
    g = -ln(-ln(u)) and u is the document key's Lehmer unit shifted to
    the open interval (0,1); the top-k keys are a without-replacement
    sample ∝ softmax(log_weight), made rerun-stable by the deterministic
    per-key uniform (sampling.py's trick).

Scale shape (100 TB):
  - per-doc bucket counts are an explode + groupBy(doc_id, bucket) —
    map-side combinable, bounded by doc length;
  - each corpus model is groupBy(bucket) onto <= ``buckets`` rows (tiny);
    models and totals ride along as BROADCAST frames, so scoring the raw
    corpus is scan -> broadcast joins -> one partial-aggregated shuffle
    on doc_id. Nothing collects to the driver.
  - the exact int64 ratio products overflow past ~3e9 total feature
    occurrences per corpus (same envelope as lm.py) — widen the count
    columns to DECIMAL(38,0) beyond that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import portable_hash
from ..functions.textstats import tokens
from .sampling import LEHMER_A, LEHMER_M

DSIR_B = 257  # Horner base, shared family with simhash/winnowing
DSIR_M = (1 << 31) - 1


def _horner(t: Column) -> Column:
    """Portable per-character Horner hash of one (lambda-var) token."""
    return portable_hash.horner(t, DSIR_B, DSIR_M)


def doc_bucket_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """(doc_id, bucket, c) — per-document hashed-n-gram bucket counts.
    Map-side combinable; hot buckets are bounded by doc count."""
    toks = tokens(F.lower(F.col(text_col)))
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("__dsir_toks"))
    uni = F.transform(
        F.col("__dsir_toks"), lambda t: F.pmod(_horner(t), F.lit(buckets))
    )
    pairs = F.expr(
        "CASE WHEN size(__dsir_toks) >= 2 THEN transform(sequence(2, size(__dsir_toks)), "
        "i -> concat(__dsir_toks[i - 2], ' ', __dsir_toks[i - 1])) "
        "ELSE array() END"
    )
    bi = F.transform(pairs, lambda s: F.pmod(_horner(s), F.lit(buckets)))
    return (
        base.select("doc_id", F.explode(F.concat(uni, bi)).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("c"))
    )


def bucket_model(doc_counts: DataFrame) -> DataFrame:
    """(bucket, n) — corpus-level bucket counts from doc_bucket_counts."""
    return doc_counts.groupBy("bucket").agg(F.sum("c").alias("n"))


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """(doc_id, n_features, log_weight) for every raw document with at
    least one token. log_weight = Σ c · ln(p̂_target / q̂_raw) with add-one
    smoothing over ``buckets`` bins:

        p̂_b = (n_t[b] + 1) / (N_t + B),  q̂_b = (n_r[b] + 1) / (N_r + B)

    The ln argument is one exact int64 ratio
    (n_t+1)·(N_r+B) / ((n_r+1)·(N_t+B)), so both engines take ln() of
    identical doubles; per-bucket terms c·ln(·) round to 9 decimals and
    sum as DECIMAL (order-independent)."""
    # dc feeds both the raw model and the scoring join, and each model
    # feeds both its broadcast and the totals row — without checkpoints
    # Catalyst re-derives the raw-corpus explode 3x and each model twice
    # (plan-audited). Lazy localCheckpoints compute each once; dc is
    # shuffle-sized (one row per distinct doc-gram), the models <= B rows.
    dc = doc_bucket_counts(raw, id_col, text_col, buckets).localCheckpoint(
        eager=False
    )
    t_model = (
        bucket_model(doc_bucket_counts(target, id_col, text_col, buckets))
        .localCheckpoint(eager=False)
    )
    r_model = bucket_model(dc).localCheckpoint(eager=False)
    totals = F.broadcast(
        t_model.agg(F.sum("n").alias("tot_t"))
        .crossJoin(r_model.agg(F.sum("n").alias("tot_r")))
    )
    j = (
        dc.join(F.broadcast(t_model.withColumnRenamed("n", "n_t")), "bucket", "left")
        .join(F.broadcast(r_model.withColumnRenamed("n", "n_r")), "bucket", "left")
        .crossJoin(totals)
        .withColumn("n_t", F.coalesce(F.col("n_t"), F.lit(0)))
        .withColumn("n_r", F.coalesce(F.col("n_r"), F.lit(0)))
    )
    num = ((F.col("n_t") + 1) * (F.col("tot_r") + F.lit(buckets))).cast("double")
    den = ((F.col("n_r") + 1) * (F.col("tot_t") + F.lit(buckets))).cast("double")
    term = F.round(F.col("c") * F.log(num / den), 9).cast("decimal(28,9)")
    return (
        j.groupBy("doc_id")
        .agg(F.sum("c").alias("n_features"), F.sum(term).alias("s"))
        .select(
            "doc_id",
            "n_features",
            F.round(F.col("s").cast("double"), 6).alias("log_weight"),
        )
    )


def gumbel_topk(
    weights: DataFrame,
    k: int,
    key_col: str = "doc_id",
    weight_col: str = "log_weight",
    salt: int = 0,
) -> DataFrame:
    """Without-replacement sample of ``k`` rows ∝ softmax(log_weight): the
    Gumbel top-k trick with a DETERMINISTIC per-key uniform (two Lehmer
    steps, shifted by +0.5 so u ∈ (0,1) strictly — no ±inf corner).

    (doc_id, log_weight, gumbel_key), the k largest keys; ties broken by
    doc_id. Spark plans orderBy().limit(k) as a distributed TakeOrdered —
    per-partition top-k then a k-row merge, no global sort."""
    x = (F.col(key_col).cast("long") + F.lit(salt)) % LEHMER_M
    h = (x * LEHMER_A) % LEHMER_M
    h = (h * LEHMER_A) % LEHMER_M
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(LEHMER_M))
    g = -F.log(-F.log(u))
    key = F.round(F.col(weight_col) + g, 9)
    return (
        weights.select(key_col, weight_col, key.alias("gumbel_key"))
        .orderBy(F.col("gumbel_key").desc(), F.col(key_col).asc())
        .limit(k)
    )


def dsir_sql_ctes(
    raw_rel: str,
    target_rel: str,
    buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin CTE chain; final relation ``dsir_w`` mirrors
    dsir_log_weights' columns (doc_id, n_features, log_weight). Identical
    Horner arithmetic, exact int64 ratio, round-9 decimal sums."""
    toks = (
        f"list_filter(string_split_regex(lower({text_col}), '\\s+'), x -> x <> '')"
    )
    horner = portable_hash.horner_sql("g", DSIR_B, DSIR_M) + f" % {buckets}"

    def grams(rel: str, out: str) -> str:
        return (
            f"{out}_t AS (SELECT {id_col} AS doc_id, {toks} AS tk FROM {rel}), "
            f"{out} AS (SELECT doc_id, {horner} AS bucket FROM ("
            f"  SELECT doc_id, unnest(list_concat(tk, "
            f"    CASE WHEN len(tk) >= 2 THEN list_transform(range(2, len(tk) + 1), "
            f"      i -> tk[i - 1] || ' ' || tk[i]) ELSE [] END)) AS g "
            f"  FROM {out}_t))"
        )

    return (
        f"{grams(raw_rel, 'dsir_rg')}, {grams(target_rel, 'dsir_tg')}, "
        "dsir_dc AS (SELECT doc_id, bucket, count(*) AS c FROM dsir_rg GROUP BY 1, 2), "
        "dsir_rm AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS n_r FROM dsir_dc GROUP BY 1), "
        "dsir_tm AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_t FROM dsir_tg GROUP BY 1), "
        "dsir_tot AS (SELECT (SELECT CAST(sum(n_t) AS BIGINT) FROM dsir_tm) AS tot_t, "
        "  (SELECT CAST(sum(n_r) AS BIGINT) FROM dsir_rm) AS tot_r), "
        "dsir_j AS (SELECT d.doc_id, d.c, coalesce(t.n_t, 0) AS n_t, "
        "  coalesce(r.n_r, 0) AS n_r, x.tot_t, x.tot_r "
        "  FROM dsir_dc d LEFT JOIN dsir_tm t USING (bucket) "
        "  LEFT JOIN dsir_rm r USING (bucket) CROSS JOIN dsir_tot x), "
        "dsir_w AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_features, "
        "  round(CAST(sum(CAST(round(c * ln("
        f"    CAST((n_t + 1) * (tot_r + {buckets}) AS DOUBLE) "
        f"    / CAST((n_r + 1) * (tot_t + {buckets}) AS DOUBLE)), 9) "
        "    AS DECIMAL(28,9))) AS DOUBLE), 6) AS log_weight "
        "  FROM dsir_j GROUP BY doc_id)"
    )


def gumbel_topk_sql(
    weights_rel: str, k: int, salt: int = 0, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of gumbel_topk over a relation with (doc_id,
    log_weight); same Lehmer uniform, same round-9 key."""
    x = f"(CAST({id_col} AS BIGINT) + {salt}) % {LEHMER_M}"
    h1 = f"({x} * {LEHMER_A}) % {LEHMER_M}"
    h2 = f"(({h1}) * {LEHMER_A}) % {LEHMER_M}"
    u = f"(CAST({h2} AS DOUBLE) + 0.5) / {float(LEHMER_M)!r}"
    key = f"round(log_weight + (-ln(-ln({u}))), 9)"
    return (
        f"SELECT {id_col}, log_weight, {key} AS gumbel_key "
        f"FROM {weights_rel} ORDER BY gumbel_key DESC, {id_col} ASC LIMIT {k}"
    )
