"""Truth discovery / data fusion: source-reliability-weighted conflict
resolution (Dong & Srivastava's data-fusion family, TruthFinder-lite).

Survivorship (clustering.golden_fields) resolves conflicts with static
rules (longest, modal, priority). Truth discovery instead LEARNS source
reliability from agreement: a source that often asserts the consensus
value earns trust, and trusted sources' votes weigh more — iterated to a
fixpoint. The deterministic fixed-round variant here:

  trust_s^0 = 0.5 for every source
  repeat R times (synchronous):
    conf(e, a, v)   = sum of trust_s over sources asserting (e, a, v)
    confn(e, a, v)  = conf / sum over values of conf   (per entity-attr)
    trust_s         = mean of confn over s's claims
  elect per (e, a): argmax confn, ties -> smallest value string

Engine-exactness: the ENTIRE iteration runs in integer nano-units
(trust/confidence x 10^9 as BIGINT) — sums are exact, and both divisions
are integer floor-divisions (`DIV` / `//`), so every intermediate is an
identical exact integer on Spark and DuckDB; doubles appear only in the
final display columns. (A double/DECIMAL pipeline was rejected: double ->
DECIMAL casts round differently at representation boundaries across
engines.) Headroom: conf*10^9 overflows int64 only past ~9.2e9 total
trust mass per (entity, attr) — i.e. ~9 billion sources asserting one
value; widen to DECIMAL(38,0) on both engines before that.

Scale shape: per round, one groupBy(entity, attr, value) with map-side
combine, one groupBy(entity, attr), one groupBy(source) — all bounded by
the claims table; R is a small constant. The trust table is one row per
SOURCE (tiny) and broadcast-joins back onto claims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NANO = 10 ** 9


def truth_discovery(
    claims: DataFrame, rounds: int = 2
) -> tuple[DataFrame, DataFrame]:
    """claims: (source_id, entity_id, attr, value). Returns
    (elected, trust): elected = (entity_id, attr, value, confidence) —
    the winning value per entity-attribute; trust = (source_id, trust)
    after the final round. confidence/trust are doubles derived from the
    exact nano-unit integers."""
    srcs = claims.select("source_id").distinct()
    trust = srcs.select(
        "source_id", F.lit(_NANO // 2).cast("long").alias("trust_n")
    )
    confn = None
    for _ in range(rounds):
        t = claims.join(F.broadcast(trust), "source_id")
        conf = t.groupBy("entity_id", "attr", "value").agg(
            F.sum("trust_n").alias("conf_n")
        )
        tot = conf.groupBy("entity_id", "attr").agg(F.sum("conf_n").alias("tot_n"))
        confn = conf.join(tot, ["entity_id", "attr"]).select(
            "entity_id",
            "attr",
            "value",
            F.expr(f"(conf_n * {_NANO}) DIV tot_n").alias("confn_n"),
        )
        per_claim = claims.join(confn, ["entity_id", "attr", "value"])
        new_trust = per_claim.groupBy("source_id").agg(
            F.expr("sum(confn_n) DIV count(*)").alias("trust_n")
        )
        trust = srcs.join(new_trust, "source_id", "left").select(
            "source_id",
            F.coalesce("trust_n", F.lit(_NANO // 2).cast("long")).alias("trust_n"),
        )
    w = Window.partitionBy("entity_id", "attr").orderBy(
        F.col("confn_n").desc(), F.col("value").asc()
    )
    elected = (
        confn.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "entity_id",
            "attr",
            "value",
            (F.col("confn_n").cast("double") / _NANO).alias("confidence"),
        )
    )
    return elected, trust.select(
        "source_id", (F.col("trust_n").cast("double") / _NANO).alias("trust")
    )


def truth_discovery_sql_ctes(claims_rel: str, rounds: int = 2) -> str:
    """DuckDB twin: the same synchronous rounds unrolled; final relations
    `td_elected` (entity_id, attr, value, confidence) and `td_trust`
    (source_id, trust). `//` is DuckDB's integer floor division — equal
    to Spark's DIV on the non-negative integers used here."""
    parts = [
        f"td_srcs AS (SELECT DISTINCT source_id FROM {claims_rel}), "
        f"td_t0 AS (SELECT source_id, CAST({_NANO // 2} AS BIGINT) AS trust_n FROM td_srcs)"
    ]
    prev = "td_t0"
    confn = None
    for r in range(1, rounds + 1):
        confn = f"td_cn{r}"
        parts.append(
            f"td_c{r} AS (SELECT c.entity_id, c.attr, c.value, "
            f"CAST(sum(t.trust_n) AS BIGINT) AS conf_n "
            f"FROM {claims_rel} c JOIN {prev} t USING (source_id) GROUP BY 1, 2, 3), "
            f"td_tot{r} AS (SELECT entity_id, attr, CAST(sum(conf_n) AS BIGINT) AS tot_n "
            f"FROM td_c{r} GROUP BY 1, 2), "
            f"{confn} AS (SELECT c.entity_id, c.attr, c.value, "
            f"(c.conf_n * {_NANO}) // t.tot_n AS confn_n "
            f"FROM td_c{r} c JOIN td_tot{r} t USING (entity_id, attr)), "
            f"td_tr{r} AS (SELECT c.source_id, "
            f"CAST(sum(n.confn_n) AS BIGINT) // count(*) AS trust_n "
            f"FROM {claims_rel} c JOIN {confn} n USING (entity_id, attr, value) GROUP BY 1), "
            f"td_t{r} AS (SELECT s.source_id, coalesce(t.trust_n, CAST({_NANO // 2} AS BIGINT)) AS trust_n "
            f"FROM td_srcs s LEFT JOIN td_tr{r} t USING (source_id))"
        )
        prev = f"td_t{r}"
    parts.append(
        "td_elected AS (SELECT entity_id, attr, value, "
        f"CAST(confn_n AS DOUBLE) / {_NANO} AS confidence "
        f"FROM (SELECT *, row_number() OVER (PARTITION BY entity_id, attr "
        f"ORDER BY confn_n DESC, value ASC) AS rn FROM {confn}) WHERE rn = 1), "
        f"td_trust AS (SELECT source_id, CAST(trust_n AS DOUBLE) / {_NANO} AS trust FROM {prev})"
    )
    return ", ".join(parts)
