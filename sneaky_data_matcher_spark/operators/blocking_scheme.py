"""Adaptive blocking-scheme selection: budgeted greedy set cover.

Given a UNIVERSE of candidate blocking passes (key functions) and a
labeled/oracle truth relation, pick the passes to ship: greedily take the
affordable pass with the largest marginal truth coverage until the
comparison budget is spent or nothing improves — the greedy core of
adaptive blocking (Bilenko et al., ICDM 2006; Michelson & Knoblock,
AAAI 2006) without the learned predicates.

Cost model: a pass costs its candidate-pair MASS sum_blocks C(s, 2) — the
number of comparisons it makes the scorer run (computed from the block
census; no pair materialization). Benefit: DISTINCT truth pairs newly
co-blocked. Both exact longs.

Scale notes (100 TB): per-pass truth-hit sets are bounded by |truth|
(the labeled set — small by definition), computed once with one semi-join
per universe; the greedy loop then touches only those hit sets and a
#passes-row cost census. The expensive corpus-side work (key derivation +
census) is one pass over the keys frame. Driver-side loop rounds =
#passes, each a tiny aggregation — the same driver-argmax shape as BPE
training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pass_costs(keys: DataFrame) -> DataFrame:
    """(pass, pair_cost): comparisons each pass generates, from the block
    census — sum over blocks of C(size, 2)."""
    census = keys.groupBy("pass", "block_key").agg(F.count("*").alias("s"))
    # integer DIV keeps the workload count exact (s*(s-1) is always even);
    # float division would round at petascale sums
    return census.groupBy("pass").agg(
        F.expr("CAST(sum(s * (s - 1) DIV 2) AS BIGINT)").alias("pair_cost")
    )


def pass_truth_hits(keys: DataFrame, truth: DataFrame) -> DataFrame:
    """(pass, doc_id_a, doc_id_b): distinct truth pairs each pass
    co-blocks. Bounded by #passes * |truth|."""
    k = keys.select("doc_id", "pass", "block_key")
    a = k.select("pass", "block_key", F.col("doc_id").alias("doc_id_a"))
    b = k.select("pass", "block_key", F.col("doc_id").alias("doc_id_b"))
    cand = (
        a.join(b, ["pass", "block_key"])
        .where(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("pass", "doc_id_a", "doc_id_b")
    )
    t = truth.select(
        F.least("doc_id_a", "doc_id_b").alias("doc_id_a"),
        F.greatest("doc_id_a", "doc_id_b").alias("doc_id_b"),
    ).distinct()
    return cand.join(t, ["doc_id_a", "doc_id_b"], "left_semi").distinct()


def scheme_select(
    keys: DataFrame, truth: DataFrame, budget_pairs: int
) -> DataFrame:
    """Greedy budgeted selection. Each round picks, among not-yet-picked
    passes that still FIT the remaining budget AND cover at least one new
    truth pair, the one with the largest marginal coverage (ties → pass
    name asc). Returns the pick table:

      (pick_order, pass, pair_cost, marginal_truth, cum_truth, cum_cost,
       truth_coverage)

    truth_coverage = cum_truth / |truth| (single division of exact longs).
    Deterministic; the DuckDB twin unrolls the same rounds."""
    spark = keys.sparkSession
    costs = {r["pass"]: r["pair_cost"] for r in pass_costs(keys).collect()}
    hits = pass_truth_hits(keys, truth).localCheckpoint(eager=True)
    n_truth = (
        truth.select(
            F.least("doc_id_a", "doc_id_b").alias("a"),
            F.greatest("doc_id_a", "doc_id_b").alias("b"),
        )
        .distinct()
        .count()
    )
    picked: list[tuple[int, str, int, int, int, int]] = []
    covered = None  # DataFrame of (doc_id_a, doc_id_b) covered so far
    cum_cost = 0
    cum_truth = 0
    for order in range(1, len(costs) + 1):
        remaining = hits.where(
            ~F.col("pass").isin([p for _, p, *_ in picked])
            if picked
            else F.lit(True)
        )
        if covered is not None:
            remaining = remaining.join(
                covered, ["doc_id_a", "doc_id_b"], "left_anti"
            )
        marg = {
            r["pass"]: r["m"]
            for r in remaining.groupBy("pass").agg(F.count("*").alias("m")).collect()
        }
        eligible = [
            (m, p)
            for p, m in marg.items()
            if m > 0 and cum_cost + costs[p] <= budget_pairs
        ]
        if not eligible:
            break
        m, p = min(eligible, key=lambda t: (-t[0], t[1]))
        cum_cost += costs[p]
        cum_truth += m
        picked.append((order, p, costs[p], m, cum_truth, cum_cost))
        new_cov = hits.where(F.col("pass") == p).select("doc_id_a", "doc_id_b")
        covered = (
            new_cov
            if covered is None
            else covered.unionByName(new_cov).distinct()
        ).localCheckpoint(eager=True)
    out = spark.createDataFrame(
        picked,
        "pick_order int, pass string, pair_cost long, marginal_truth long, "
        "cum_truth long, cum_cost long",
    )
    return out.withColumn(
        "truth_coverage",
        F.round(F.col("cum_truth").cast("double") / F.lit(float(max(n_truth, 1))), 6),
    )


def scheme_select_sql(
    keys_cte: str,
    truth_cte: str,
    budget_pairs: int,
    n_rounds: int,
    keys_rel: str = "u_keys",
    truth_rel: str = "truth",
) -> str:
    """DuckDB twin: unrolled greedy rounds over the same cost census and
    hit sets. ``keys_cte``/``truth_cte`` must define relations
    ``keys_rel(doc_id, pass, block_key)`` and
    ``truth_rel(doc_id_a, doc_id_b)`` (already canonicalized a < b)."""
    ctes = [
        keys_cte,
        truth_cte,
        "tno AS (SELECT least(doc_id_a, doc_id_b) AS doc_id_a, "
        f"greatest(doc_id_a, doc_id_b) AS doc_id_b FROM {truth_rel} GROUP BY 1, 2), "
        "ntr AS (SELECT count(*) AS n FROM tno)",
        "pcost AS MATERIALIZED (SELECT pass, CAST(sum(s * (s - 1) // 2) AS BIGINT) AS pair_cost "
        f"FROM (SELECT pass, block_key, count(*) AS s FROM {keys_rel} GROUP BY pass, block_key) GROUP BY pass)",
        "ph AS MATERIALIZED (SELECT DISTINCT a.pass, a.doc_id AS doc_id_a, b.doc_id AS doc_id_b "
        f"FROM {keys_rel} a JOIN {keys_rel} b ON a.pass = b.pass AND a.block_key = b.block_key "
        "WHERE a.doc_id < b.doc_id) ",
        "hits AS MATERIALIZED (SELECT ph.pass, ph.doc_id_a, ph.doc_id_b FROM ph "
        "JOIN tno USING (doc_id_a, doc_id_b))",
        "cov0 AS (SELECT CAST(NULL AS BIGINT) AS doc_id_a, CAST(NULL AS BIGINT) AS doc_id_b WHERE 1 = 0)",
        "pk0 AS (SELECT CAST(NULL AS VARCHAR) AS pass, 0 AS pair_cost, 0 AS m WHERE 1 = 0)",
    ]
    for i in range(1, n_rounds + 1):
        prev_picks = " UNION ALL ".join(
            f"SELECT pass, pair_cost FROM pk{j}" for j in range(i)
        )
        ctes.append(
            f"m{i} AS (SELECT h.pass, count(*) AS m FROM hits h "
            f"LEFT JOIN cov{i-1} c ON h.doc_id_a = c.doc_id_a AND h.doc_id_b = c.doc_id_b "
            f"WHERE c.doc_id_a IS NULL AND h.pass NOT IN (SELECT pass FROM ({prev_picks})) "
            "GROUP BY h.pass)"
        )
        ctes.append(
            f"pk{i} AS MATERIALIZED (SELECT m{i}.pass, pcost.pair_cost, m{i}.m FROM m{i} "
            "JOIN pcost USING (pass) "
            f"WHERE m{i}.m > 0 AND coalesce((SELECT sum(pair_cost) FROM ({prev_picks})), 0) + pcost.pair_cost <= {budget_pairs} "
            "ORDER BY m DESC, pass LIMIT 1)"
        )
        ctes.append(
            f"cov{i} AS MATERIALIZED (SELECT doc_id_a, doc_id_b FROM cov{i-1} "
            f"UNION SELECT h.doc_id_a, h.doc_id_b FROM hits h JOIN pk{i} USING (pass))"
        )
    rows = " UNION ALL ".join(
        f"SELECT {i} AS pick_order, pass, pair_cost, m FROM pk{i}"
        for i in range(1, n_rounds + 1)
    )
    return (
        "WITH " + ", ".join(ctes) + ", "
        f"picks AS ({rows}) "
        "SELECT pick_order, pass, pair_cost, CAST(m AS BIGINT) AS marginal_truth, "
        "CAST(sum(m) OVER (ORDER BY pick_order) AS BIGINT) AS cum_truth, "
        "CAST(sum(pair_cost) OVER (ORDER BY pick_order) AS BIGINT) AS cum_cost, "
        "round(CAST(sum(m) OVER (ORDER BY pick_order) AS DOUBLE) "
        "  / CAST(greatest((SELECT n FROM ntr), 1) AS DOUBLE), 6) AS truth_coverage "
        "FROM picks"
    )
