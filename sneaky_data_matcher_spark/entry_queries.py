"""Driver-contract query registry: Spark callables + DuckDB oracle SQL.

Every SURVEY.md §2 operator that is SQL-expressible gets a (queries,
oracle_sql) pair here; the driver runs both at sf=0.01 and compares
row-count + schema + order-insensitive value-hash. Column names are aliased
identically on both sides; float-producing queries round to 6 decimals
after computing on identical double pipelines (Jaro-Winkler runs the SAME
DuckDB kernel on both sides — see functions/similarity.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import canonicalize as C
from .functions import textstats as TS
from .functions.similarity import (
    cosine_similarity,
    jaro_winkler,
    levenshtein_ratio,
    token_jaccard,
)
from .operators import clustering, search
from .sources import flatdocs

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _keys(spark, sf_dir):
    return flatdocs.keys_frame(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# P2/P3 — canonicalization chain (StringTransformer.java:11-45)
# ---------------------------------------------------------------------------

@_q(
    "canon_tlc_nrm",
    f"WITH {flatdocs.CANON_CTE} SELECT doc_id, doc_text FROM canon",
)
def canon_tlc_nrm(spark, sf_dir):
    return flatdocs.canon_frame(_docs(spark, sf_dir)).select("doc_id", "doc_text")


# P5 — phone rule (RecordValidationUtilService.java:24-31). Testdata has no
# phone column; construct deterministic raw phones (short ones hit the
# <5-digit reject branch) identically on both sides.
_PHONE_RAW_SQL = (
    "CASE WHEN c_custkey % 4 = 0 THEN '12.3' "
    "ELSE '+1 (' || CAST(c_custkey AS VARCHAR) || ') 555-0' "
    "|| CAST(c_custkey % 100 AS VARCHAR) END"
)


@_q(
    "phone_normalize",
    f"SELECT c_custkey, {C.phone_rule_sql('phone_raw')} AS phone_norm "
    f"FROM (SELECT c_custkey, {_PHONE_RAW_SQL} AS phone_raw FROM customer)",
)
def phone_normalize(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    raw = F.when(F.col("c_custkey") % 4 == 0, F.lit("12.3")).otherwise(
        F.concat(
            F.lit("+1 ("),
            F.col("c_custkey").cast("string"),
            F.lit(") 555-0"),
            (F.col("c_custkey") % 100).cast("string"),
        )
    )
    return cust.select("c_custkey", C.phone_rule(raw).alias("phone_norm"))


# P4 — email rule (RecordValidationUtilService.java:17-23)
_EMAIL_EXPR_SQL = (
    "CASE WHEN c_custkey % 5 = 0 THEN lower(replace(c_name, ' ', '.')) || '@@bad' "
    "WHEN c_custkey % 5 = 1 THEN lower(replace(c_name, ' ', '.')) || '@localhost' "
    "ELSE lower(replace(c_name, ' ', '.')) || '@example.com' END"
)


@_q(
    "email_validate",
    f"SELECT c_custkey, email, {C.email_is_valid_sql('email')} AS is_valid "
    f"FROM (SELECT c_custkey, {_EMAIL_EXPR_SQL} AS email FROM customer)",
)
def email_validate(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = F.concat(F.lower(F.regexp_replace("c_name", " ", ".")))
    email = (
        F.when(F.col("c_custkey") % 5 == 0, F.concat(base, F.lit("@@bad")))
        .when(F.col("c_custkey") % 5 == 1, F.concat(base, F.lit("@localhost")))
        .otherwise(F.concat(base, F.lit("@example.com")))
    )
    df = cust.select("c_custkey", email.alias("email"))
    return df.select("c_custkey", "email", C.email_is_valid(F.col("email")).alias("is_valid"))


# ---------------------------------------------------------------------------
# F1-F9 + L1 — the query mini-language over the long keys frame
# ---------------------------------------------------------------------------

@_q(
    "search_contains",
    f"WITH {flatdocs.KEYS_CTE} SELECT DISTINCT doc_id FROM keys "
    "WHERE key_kind = 'text' AND contains(value, 'spark')",
)
def search_contains(spark, sf_dir):
    return search.search_seeds(_keys(spark, sf_dir), ["text:>spark<"])


@_q(
    "search_and",
    f"WITH {flatdocs.KEYS_CTE} "
    "SELECT doc_id FROM keys WHERE key_kind='tok0' AND value LIKE 'b%' "
    "INTERSECT SELECT doc_id FROM keys WHERE key_kind='lang' AND value='en'",
)
def search_and(spark, sf_dir):
    return search.search_seeds(_keys(spark, sf_dir), ["tok0:b<", "lang:en"], "AND")


@_q(
    "search_or",
    f"WITH {flatdocs.KEYS_CTE} "
    "SELECT doc_id FROM keys WHERE key_kind='tok0' AND value='spark' "
    "UNION SELECT doc_id FROM keys WHERE key_kind='text' AND value LIKE '%window'",
)
def search_or(spark, sf_dir):
    return search.search_seeds(_keys(spark, sf_dir), ["tok0:spark", "text:>window"], "OR")


@_q(
    "search_pagination",
    f"WITH {flatdocs.KEYS_CTE} "
    "SELECT doc_id FROM (SELECT DISTINCT doc_id FROM keys "
    "WHERE key_kind='text' AND contains(value, 'data')) "
    "ORDER BY doc_id OFFSET 10 LIMIT 10",
)
def search_pagination(spark, sf_dir):
    seeds = search.search_seeds(_keys(spark, sf_dir), ["text:>data<"])
    return search.paginate(seeds, skip=10, limit=10)


@_q(
    "search_provenance",
    f"WITH {flatdocs.KEYS_CTE} "
    "SELECT doc_id FROM keys WHERE key_kind='lang' AND value='en' "
    "INTERSECT SELECT doc_id FROM keys WHERE key_kind='source' AND value IN ('src1','src3')",
)
def search_provenance(spark, sf_dir):
    return search.search_seeds(
        _keys(spark, sf_dir), ["lang:en"], "AND", limit_by_sources=["src1", "src3"]
    )


# J1 — row reassembly with multi-valued cells (SearchRepository.java:213-247)
@_q(
    "reassemble_rows",
    f"WITH {flatdocs.KEYS_CTE}, seeds AS ("
    "SELECT DISTINCT doc_id FROM keys WHERE key_kind='tok0' AND value='spark') "
    "SELECT k.doc_id, k.key_kind, "
    "array_to_string(list_sort(list_distinct(list(k.value))), '|') AS cell "
    "FROM keys k JOIN seeds s ON k.doc_id = s.doc_id "
    "GROUP BY k.doc_id, k.key_kind",
)
def reassemble_rows(spark, sf_dir):
    keys = _keys(spark, sf_dir)
    seeds = search.search_seeds(keys, ["tok0:spark"])
    rows = search.reassemble_rows(seeds, keys)
    return rows.select(
        "doc_id", "key_kind", F.array_join("values", "|").alias("cell")
    )


# J2 — join-by-shared-value enrichment, capped (SearchRepository.java:249-297)
@_q(
    "join_enrichment",
    f"WITH {flatdocs.KEYS_CTE}, "
    "seeds AS (SELECT DISTINCT doc_id FROM keys WHERE key_kind='tok0' AND value='spark'), "
    "jk AS (SELECT doc_id, key_kind AS join_col, value AS join_value FROM keys "
    "       WHERE key_kind = 'tok0'), "
    "hits AS (SELECT s.doc_id, o.doc_id AS other_doc_id, j.join_col, j.join_value, "
    "  ROW_NUMBER() OVER (PARTITION BY s.doc_id "
    "                     ORDER BY o.doc_id, j.join_col, j.join_value) AS rn "
    "  FROM seeds s JOIN jk j ON s.doc_id = j.doc_id "
    "  JOIN jk o ON j.join_col = o.join_col AND j.join_value = o.join_value "
    "  WHERE o.doc_id <> s.doc_id) "
    "SELECT doc_id, other_doc_id, join_col, join_value FROM hits WHERE rn <= 3",
)
def join_enrichment(spark, sf_dir):
    keys = _keys(spark, sf_dir)
    seeds = search.search_seeds(keys, ["tok0:spark"])
    return search.join_enrichment(seeds, keys, ["tok0"], max_join_depth=2)


# J3 — probe match: canonicalize probe, EQUALS join, top-1 per probe
# (services/SearchService.java:104-199). Probe values are perturbed
# (uppercased + wrapped in quotes) then recovered by the TLC+NRM chain.
_PROBE_SQL = (
    f"WITH {flatdocs.KEYS_CTE}, "
    "probe AS (SELECT doc_id AS probe_id, "
    + C.nrm_sql("lower('\"' || upper(string_split(doc_text, ' ')[1]) || '\"')")
    + " AS tok0, lang FROM canon WHERE doc_id % 7 = 0 AND doc_text <> ''), "
    "k1 AS (SELECT doc_id, value FROM keys WHERE key_kind='tok0'), "
    "k2 AS (SELECT doc_id, value FROM keys WHERE key_kind='lang'), "
    "m AS (SELECT p.probe_id, k1.doc_id FROM probe p JOIN k1 ON p.tok0 = k1.value "
    "      INTERSECT SELECT p.probe_id, k2.doc_id FROM probe p JOIN k2 ON p.lang = k2.value), "
    "r AS (SELECT probe_id, doc_id, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY doc_id) rn FROM m) "
    "SELECT probe_id, doc_id FROM r WHERE rn = 1"
)


@_q("probe_match", _PROBE_SQL)
def probe_match(spark, sf_dir):
    keys = _keys(spark, sf_dir)
    canon = flatdocs.canon_frame(_docs(spark, sf_dir))
    perturbed = F.concat(F.lit('"'), F.upper(F.split("doc_text", " ")[0]), F.lit('"'))
    probe = canon.where((F.col("doc_id") % 7 == 0) & (F.col("doc_text") != "")).select(
        F.col("doc_id").alias("probe_id"),
        C.transform_chain(perturbed, ["TLC", "NRM"]).alias("tok0"),
        "lang",
    )
    return search.probe_match(probe, keys, {"tok0": "tok0", "lang": "lang"})


# A3 — distinct dynamic 'column' set (ColumnsRepository.java:21-32)
@_q(
    "distinct_key_kinds",
    f"WITH {flatdocs.KEYS_CTE} SELECT DISTINCT key_kind FROM keys",
)
def distinct_key_kinds(spark, sf_dir):
    return search.distinct_key_kinds(_keys(spark, sf_dir))


# ---------------------------------------------------------------------------
# Generic OLAP (SURVEY.md §2 aggregations/joins/windows — 'what Catalyst
# gives free', exercised to prove the engine surface)
# ---------------------------------------------------------------------------

@_q(
    "pricing_summary",
    "SELECT l_returnflag, l_linestatus, "
    "CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty, "
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price, "
    "count(*) AS count_order "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
    "GROUP BY l_returnflag, l_linestatus",
)
def pricing_summary(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("sum_base_price"),
            F.count("*").alias("count_order"),
        )
    )


@_q(
    "join_agg_segments",
    "SELECT c_mktsegment, count(*) AS n_orders, "
    "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue "
    "FROM orders JOIN customer ON o_custkey = c_custkey "
    "GROUP BY c_mktsegment",
)
def join_agg_segments(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
    )


@_q(
    "topk_orders_per_segment",
    "WITH j AS (SELECT c_mktsegment, o_orderkey, o_totalprice, "
    "ROW_NUMBER() OVER (PARTITION BY c_mktsegment "
    "ORDER BY o_totalprice DESC, o_orderkey) AS rn "
    "FROM orders JOIN customer ON o_custkey = c_custkey) "
    "SELECT c_mktsegment, o_orderkey, o_totalprice FROM j WHERE rn <= 3",
)
def topk_orders_per_segment(spark, sf_dir):
    from pyspark.sql import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Training-data ops: dedup / text analysis / ANN
# ---------------------------------------------------------------------------

_FPRINT_SQL = (
    "sha256(array_to_string(list_sort(list_distinct("
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''))), ' '))"
)


@_q(
    "dedup_exact",
    f"WITH fp AS (SELECT doc_id, {_FPRINT_SQL} AS fingerprint FROM documents) "
    "SELECT fingerprint, count(*) AS n_docs, min(doc_id) AS representative "
    "FROM fp GROUP BY fingerprint HAVING count(*) > 1",
)
def dedup_exact(spark, sf_dir):
    d = _docs(spark, sf_dir)
    fp = d.select("doc_id", TS.fingerprint(F.col("text")).alias("fingerprint"))
    return (
        fp.groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("representative"))
        .where(F.col("n_docs") > 1)
    )


@_q(
    "token_stats",
    "WITH t AS (SELECT doc_id, "
    "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks FROM documents) "
    "SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct_tokens, "
    "CASE WHEN len(toks) = 0 THEN 0.0 ELSE "
    "CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) END "
    "AS mean_word_len FROM t",
)
def token_stats(spark, sf_dir):
    d = _docs(spark, sf_dir)
    toks = TS.tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        TS.mean_word_length(F.col("text")).alias("mean_word_len"),
    )


def _export(name: str):
    """Expose registry to __spark_entry__."""
    return QUERIES if name == "queries" else ORACLE_SQL
