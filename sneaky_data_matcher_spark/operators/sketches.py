"""Count-min sketch over token streams — engine-portable by construction.

The classic fixed-memory frequency sketch (Cormode & Muthukrishnan '05):
d hash rows × w counters; increment cell (r, h_r(x)) per occurrence;
estimate(x) = min_r cell(r, h_r(x)) — always >= the true count, with the
overestimate bounded by (n / w) per row whp. The point at 100 TB: token
frequency queries from O(d*w) integers instead of a full census shuffle,
and sketches MERGE by cell-wise addition (partial-aggregate friendly,
streaming-friendly).

Hashes are the repo's portable dual Horner polynomials (dedup.py
SIMHASH_B1/B2 — the winnowing trick), double-hashed into d rows as
h_r = (h1 + r*h2 + r*r) mod w, so a DuckDB twin rebuilds the ENTIRE
sketch cell-for-cell and the driver oracle certifies build + estimate
end-to-end (no "approximately equal" hand-waving: the sketch itself is
deterministic; only its relation to true counts is approximate).

Scale notes:
  - build = one explode + one groupBy((r, col)) with map-side combine;
    the sketch is d*w rows regardless of corpus size.
  - estimates join the (tiny, broadcast) sketch — no corpus rescan.
  - hot tokens are the groupBy's hot cells, bounded by d*w keys total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import portable_hash
from .dedup import SIMHASH_B1, SIMHASH_B2, SIMHASH_M, _horner_hash

CMS_W = 1024
CMS_D = 4


def _cols_for(t: Column) -> Column:
    """Array of CMS_D (row, col) structs for one token expression."""
    h1 = _horner_hash(t, SIMHASH_B1)
    h2 = _horner_hash(t, SIMHASH_B2)
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                ((h1 + r * h2 + r * r) % CMS_W).cast("int").alias("col"),
            )
            for r in range(CMS_D)
        ]
    )


def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != "")


def count_min_build(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """-> sketch(r, col, cnt): one row per non-empty cell."""
    tok = docs.select(F.explode(_tokens(F.col(text_col))).alias("t"))
    cell = tok.select(F.explode(_cols_for(F.col("t"))).alias("c"))
    return cell.groupBy(F.col("c.r").alias("r"), F.col("c.col").alias("col")).agg(
        F.count("*").alias("cnt")
    )


def count_min_estimate(sketch: DataFrame, probes: DataFrame) -> DataFrame:
    """probes(token) -> (token, est). Missing cells count 0 (an unseen
    token estimates 0 unless every one of its d cells collides)."""
    pe = probes.select(
        "token", F.explode(_cols_for(F.col("token"))).alias("c")
    ).select("token", F.col("c.r").alias("r"), F.col("c.col").alias("col"))
    hit = pe.join(F.broadcast(sketch), ["r", "col"], "left").select(
        "token", F.coalesce("cnt", F.lit(0)).alias("cell")
    )
    return hit.groupBy("token").agg(F.min("cell").alias("est"))


# --- DuckDB twin builders -------------------------------------------------

def _horner_sql(var: str, base: int) -> str:
    return portable_hash.horner_sql(var, base, SIMHASH_M)


def cms_sql(probe_tokens: list[str], docs_rel: str = "documents") -> str:
    """CTE chain ending in ``cms_out(token, est, true_cnt)``."""
    probes = ", ".join(f"'{t}'" for t in probe_tokens)
    h1 = _horner_sql("t", SIMHASH_B1)
    h2 = _horner_sql("t", SIMHASH_B2)
    return (
        f"ctok AS (SELECT unnest(list_filter(string_split_regex(lower(text), "
        f"'\\s+'), x -> x <> '')) AS t FROM {docs_rel}), "
        f"cth AS (SELECT t, {h1} AS h1, {h2} AS h2 FROM ctok), "
        f"csk AS MATERIALIZED (SELECT r, CAST((h1 + r * h2 + r * r) % {CMS_W} AS INT) AS col, "
        "  count(*) AS cnt FROM cth, (SELECT unnest(range(0, "
        f"{CMS_D})) AS r) GROUP BY 1, 2), "
        f"cpr AS (SELECT unnest([{probes}]) AS token), "
        f"cph AS (SELECT token, {_horner_sql('token', SIMHASH_B1)} AS h1, "
        f"  {_horner_sql('token', SIMHASH_B2)} AS h2 FROM cpr), "
        f"cpe AS (SELECT token, r, CAST((h1 + r * h2 + r * r) % {CMS_W} AS INT) AS col "
        f"  FROM cph, (SELECT unnest(range(0, {CMS_D})) AS r)), "
        "cest AS (SELECT token, min(coalesce(cnt, 0)) AS est FROM cpe "
        "  LEFT JOIN csk USING (r, col) GROUP BY token), "
        "ctru AS (SELECT t AS token, count(*) AS true_cnt FROM ctok GROUP BY t), "
        "cms_out AS (SELECT e.token, CAST(e.est AS BIGINT) AS est, "
        "  coalesce(u.true_cnt, 0) AS true_cnt FROM cest e "
        "  LEFT JOIN ctru u USING (token))"
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. '07), m=64 registers — DETERMINISTIC like
# the CMS above: bucket/rank come from the portable Horner hash, the rank
# uses length(bin(w)) (identical string builtin on both engines), so the
# DuckDB twin reproduces every register and the estimate bit-for-bit.
# Scale: ONE groupBy(bucket) max-agg (64 output rows), registers merge by
# cell-wise max — the canonical distributed distinct-count sketch.
# ---------------------------------------------------------------------------

HLL_M = 64  # 6-bit bucket index; the mixed hash has 31 - 6 = 25 rank bits
HLL_ALPHA = 0.709  # alpha_64 (standard constant for m = 64)
_HLL_WBITS = 25


def _hll_mix(h1: Column, h2: Column) -> Column:
    z = (h1 * 48271 + h2) % SIMHASH_M
    z = z.bitwiseXOR(F.shiftright(z, 16))
    z = (z * 69621) % SIMHASH_M
    z = z.bitwiseXOR(F.shiftright(z, 13))
    return (z * 40503) % SIMHASH_M


def hll_registers(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """-> (bucket, reg): max leading-zero rank per bucket (only non-empty
    buckets are emitted; absent bucket = register 0).

    The raw packed Horner hash is NOT MSB-uniform for short tokens (a
    3-char token only fills ~22 of h1's 31 bits, so its leading zeros
    are structural, not random — measured: a 400-token corpus estimated
    27k), and a single Lehmer step is LINEAR, so sequential token
    families stay on a lattice (measured: rank histogram with holes,
    estimate 145 for 400). HLL needs uniform high bits, so the mix is a
    xorshift-multiply chain — multiplies mod 2^31-1 (no int64 overflow
    on either engine), xor-shifts to break linearity; measured error
    ~4% on the adversarial sequential-token family. The rank domain is
    the mixed value's 25 post-bucket bits."""
    tok = docs.select(F.explode(_tokens(F.col(text_col))).alias("t")).select(
        _hll_mix(
            _horner_hash(F.col("t"), SIMHASH_B1),
            _horner_hash(F.col("t"), SIMHASH_B2),
        ).alias("h")
    )
    w = F.expr(f"h div {HLL_M}")
    rank = F.when(w == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        _HLL_WBITS - F.length(F.bin(w)) + 1
    )
    return (
        tok.select((F.col("h") % HLL_M).cast("int").alias("bucket"), rank.alias("rk"))
        .groupBy("bucket")
        .agg(F.max("rk").alias("reg"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """-> one row (m, nonzero_regs, est): the HLL estimator with the
    standard small-range (linear-counting) correction."""
    full = registers.agg(
        F.count("*").alias("nonzero"),
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s_nz"),
    )
    return full.select(
        F.lit(HLL_M).alias("m"),
        F.col("nonzero").cast("long").alias("nonzero_regs"),
        F.round(
            F.when(
                # raw estimate in small range & empty buckets -> linear count
                (
                    HLL_ALPHA
                    * HLL_M
                    * HLL_M
                    / (F.col("s_nz") + (HLL_M - F.col("nonzero")))
                    <= 2.5 * HLL_M
                )
                & (F.col("nonzero") < HLL_M),
                HLL_M * F.log(F.lit(HLL_M) / (HLL_M - F.col("nonzero"))),
            ).otherwise(
                HLL_ALPHA * HLL_M * HLL_M / (F.col("s_nz") + (HLL_M - F.col("nonzero")))
            ),
            6,
        ).alias("est"),
    )


def hll_sql(docs_rel: str = "documents") -> str:
    """CTE chain ending in ``hll_out(m, nonzero_regs, est, true_distinct)``."""
    h1 = _horner_sql("t", SIMHASH_B1)
    h2 = _horner_sql("t", SIMHASH_B2)
    raw = f"({HLL_ALPHA} * {HLL_M} * {HLL_M} / (s_nz + ({HLL_M} - nonzero)))"
    return (
        f"htok AS (SELECT unnest(list_filter(string_split_regex(lower(text), "
        f"'\\s+'), x -> x <> '')) AS t FROM {docs_rel}), "
        f"hz0 AS (SELECT (({h1} * 48271 + {h2}) % {SIMHASH_M}) AS z FROM htok), "
        f"hz1 AS (SELECT (xor(z, z >> 16) * 69621) % {SIMHASH_M} AS z FROM hz0), "
        f"hh AS (SELECT (xor(z, z >> 13) * 40503) % {SIMHASH_M} AS h FROM hz1), "
        f"hr AS (SELECT CAST(h % {HLL_M} AS INT) AS bucket, "
        f"  CASE WHEN h // {HLL_M} = 0 THEN {_HLL_WBITS + 1} "
        f"  ELSE {_HLL_WBITS} - length(bin(h // {HLL_M})) + 1 END AS rk FROM hh), "
        "hreg AS (SELECT bucket, max(rk) AS reg FROM hr GROUP BY bucket), "
        "hagg AS (SELECT count(*) AS nonzero, sum(power(2.0, -reg)) AS s_nz FROM hreg), "
        f"hest AS (SELECT CAST({HLL_M} AS INT) AS m, CAST(nonzero AS BIGINT) AS nonzero_regs, "
        f"  round(CASE WHEN {raw} <= 2.5 * {HLL_M} AND nonzero < {HLL_M} "
        f"  THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - nonzero)) "
        f"  ELSE {raw} END, 6) AS est FROM hagg), "
        "htru AS (SELECT count(DISTINCT t) AS true_distinct FROM htok), "
        "hll_out AS (SELECT m, nonzero_regs, est, true_distinct FROM hest, htru)"
    )


# ---------------------------------------------------------------------------
# Grouped HLL + register merge (r3 continuation): the property that makes
# HLL the distributed distinct-count sketch is MERGEABILITY — registers
# of two partitions/groups combine by cell-wise max, and the merged
# sketch is IDENTICAL to the sketch of the union (not merely close). The
# grouped builder is one groupBy((group, bucket)); a merge is a groupBy
# (bucket) max over the chosen groups. Both are partial-aggregate
# friendly: at 100 TB per-partition registers combine map-side and only
# m rows per group ever shuffle.
# ---------------------------------------------------------------------------


def hll_registers_by(
    docs: DataFrame, group_col: str, text_col: str = "text"
) -> DataFrame:
    """-> (group, bucket, reg): per-group HLL registers."""
    tok = docs.select(
        F.col(group_col).alias("group"),
        F.explode(_tokens(F.col(text_col))).alias("t"),
    ).select(
        "group",
        _hll_mix(
            _horner_hash(F.col("t"), SIMHASH_B1),
            _horner_hash(F.col("t"), SIMHASH_B2),
        ).alias("h"),
    )
    w = F.expr(f"h div {HLL_M}")
    rank = F.when(w == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        _HLL_WBITS - F.length(F.bin(w)) + 1
    )
    return (
        tok.select(
            "group", (F.col("h") % HLL_M).cast("int").alias("bucket"), rank.alias("rk")
        )
        .groupBy("group", "bucket")
        .agg(F.max("rk").alias("reg"))
    )


def hll_merge(registers_by: DataFrame, groups: list[str]) -> DataFrame:
    """Cell-wise max of the chosen groups' registers -> (bucket, reg),
    the exact register set of the groups' UNION."""
    return (
        registers_by.where(F.col("group").isin(groups))
        .groupBy("bucket")
        .agg(F.max("reg").alias("reg"))
    )


def hll_estimate_grouped(registers_by: DataFrame) -> DataFrame:
    """Per-group HLL estimate -> (group, nonzero_regs, est)."""
    agg = registers_by.groupBy("group").agg(
        F.count("*").alias("nonzero"),
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s_nz"),
    )
    raw = HLL_ALPHA * HLL_M * HLL_M / (F.col("s_nz") + (HLL_M - F.col("nonzero")))
    est = F.round(
        F.when(
            (raw <= 2.5 * HLL_M) & (F.col("nonzero") < HLL_M),
            HLL_M * F.log(F.lit(HLL_M) / (HLL_M - F.col("nonzero"))),
        ).otherwise(raw),
        6,
    )
    return agg.select(
        "group",
        F.col("nonzero").cast("long").alias("nonzero_regs"),
        est.alias("est"),
    )


def hll_grouped_sql(group_col: str = "lang", docs_rel: str = "documents") -> str:
    """CTE chain ending in ``hllg(group, bucket, reg)`` — the per-group
    register twin of :func:`hll_registers_by`."""
    h1 = _horner_sql("t", SIMHASH_B1)
    h2 = _horner_sql("t", SIMHASH_B2)
    return (
        f"gtok AS (SELECT {group_col} AS grp, unnest(list_filter("
        f"string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS t FROM {docs_rel}), "
        f"gz0 AS (SELECT grp, (({h1} * 48271 + {h2}) % {SIMHASH_M}) AS z FROM gtok), "
        f"gz1 AS (SELECT grp, (xor(z, z >> 16) * 69621) % {SIMHASH_M} AS z FROM gz0), "
        f"ghh AS (SELECT grp, (xor(z, z >> 13) * 40503) % {SIMHASH_M} AS h FROM gz1), "
        f"ghr AS (SELECT grp, CAST(h % {HLL_M} AS INT) AS bucket, "
        f"  CASE WHEN h // {HLL_M} = 0 THEN {_HLL_WBITS + 1} "
        f"  ELSE {_HLL_WBITS} - length(bin(h // {HLL_M})) + 1 END AS rk FROM ghh), "
        "hllg AS MATERIALIZED (SELECT grp AS \"group\", bucket, max(rk) AS reg "
        "FROM ghr GROUP BY grp, bucket)"
    )


HLL_EST_SQL = (
    # estimator over a (label, bucket, reg) relation named `regs`
    "SELECT label, CAST(count(*) AS BIGINT) AS nonzero_regs, "
    f"round(CASE WHEN ({HLL_ALPHA} * {HLL_M} * {HLL_M} / "
    f"(sum(power(2.0, -reg)) + ({HLL_M} - count(*)))) <= 2.5 * {HLL_M} "
    f"AND count(*) < {HLL_M} "
    f"THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - count(*))) "
    f"ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M} / "
    f"(sum(power(2.0, -reg)) + ({HLL_M} - count(*)))) END, 6) AS est "
    "FROM regs GROUP BY label"
)


# ---------------------------------------------------------------------------
# CMS inner product = join-cardinality estimate (r3 continuation):
# |A ⋈_k B| = Σ_x f_A(x)·f_B(x), and the count-min row inner product
# Σ_col A_r[col]·B_r[col] upper-bounds it (collisions only ADD), so
# min over rows is the classic sketch estimate (Cormode & Muthukrishnan
# §4.2) — what a query planner uses to size a join without scanning
# either side. Deterministic here (portable Horner hashes), so the DuckDB
# twin reproduces the estimate EXACTLY, while its relation to the true
# cardinality stays the documented ±ΣfA·ΣfB/w bound.
# ---------------------------------------------------------------------------


def cms_build_keys(df: DataFrame, key_col) -> DataFrame:
    """CMS over an arbitrary key expression (cast to string, hashed with
    the shared portable Horner pair) -> (r, col, cnt)."""
    k = F.col(key_col).cast("string") if isinstance(key_col, str) else key_col
    cell = df.select(F.explode(_cols_for(k)).alias("c"))
    return cell.groupBy(F.col("c.r").alias("r"), F.col("c.col").alias("col")).agg(
        F.count("*").alias("cnt")
    )


def cms_join_estimate(sk_a: DataFrame, sk_b: DataFrame) -> DataFrame:
    """min over rows of the per-row sketch inner product -> one row
    (d, w, est). Joins two d×w sketches — O(d·w) work, never the data."""
    j = sk_a.join(
        sk_b.withColumnRenamed("cnt", "cnt_b"), ["r", "col"]
    ).groupBy("r").agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("ip"))
    return j.agg(
        F.lit(CMS_D).alias("d"),
        F.lit(CMS_W).alias("w"),
        F.min("ip").alias("est"),
    )


def cms_keys_sql(rel: str, key: str, out: str) -> str:
    """CTE: CMS of ``CAST(key AS VARCHAR)`` over relation ``rel``."""
    h1 = _horner_sql("t", SIMHASH_B1)
    h2 = _horner_sql("t", SIMHASH_B2)
    return (
        f"{out}_t AS (SELECT CAST({key} AS VARCHAR) AS t FROM {rel}), "
        f"{out}_h AS (SELECT {h1} AS h1, {h2} AS h2 FROM {out}_t), "
        f"{out} AS MATERIALIZED (SELECT r, CAST((h1 + r * h2 + r * r) % {CMS_W} AS INT) AS col, "
        f"count(*) AS cnt FROM {out}_h, (SELECT unnest(range(0, {CMS_D})) AS r) "
        "GROUP BY 1, 2)"
    )
