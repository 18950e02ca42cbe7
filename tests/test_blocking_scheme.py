from __future__ import annotations

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import blocking_scheme as BS


def _keys(spark):
    # pass A: block {1,2,3}            cost 3, hits {12, 13}
    # pass B: blocks {1,2} {4,5}       cost 2, hits {12, 45}
    # pass C: block {1..6}             cost 15, hits {12, 13, 45}
    # pass D: block {6, 7}             cost 1, hits {}
    rows = (
        [(i, "A", "a1") for i in (1, 2, 3)]
        + [(1, "B", "b1"), (2, "B", "b1"), (4, "B", "b2"), (5, "B", "b2")]
        + [(i, "C", "c1") for i in range(1, 7)]
        + [(6, "D", "d1"), (7, "D", "d1")]
    )
    return spark.createDataFrame(rows, "doc_id long, pass string, block_key string")


def _truth(spark):
    return spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5), (8, 9)], "doc_id_a long, doc_id_b long"
    )


def test_pass_costs_and_hits(spark):
    costs = {r["pass"]: r["pair_cost"] for r in BS.pass_costs(_keys(spark)).collect()}
    assert costs == {"A": 3, "B": 2, "C": 15, "D": 1}
    hits = BS.pass_truth_hits(_keys(spark), _truth(spark))
    got = {(r["pass"], r["doc_id_a"], r["doc_id_b"]) for r in hits.collect()}
    assert got == {
        ("A", 1, 2), ("A", 1, 3),
        ("B", 1, 2), ("B", 4, 5),
        ("C", 1, 2), ("C", 1, 3), ("C", 4, 5),
    }


def test_scheme_select_greedy_budgeted(spark):
    # budget 6: C (cost 15) never fits; greedy: A (2 new) then B (1 new:
    # 45); D never eligible (0 marginal). (8,9) unreachable by any pass.
    out = BS.scheme_select(_keys(spark), _truth(spark), budget_pairs=6).collect()
    picks = [(r["pick_order"], r["pass"], r["marginal_truth"]) for r in out]
    assert picks == [(1, "A", 2), (2, "B", 1)]
    last = out[-1]
    assert last["cum_truth"] == 3 and last["cum_cost"] == 5
    assert abs(last["truth_coverage"] - 0.75) < 1e-9
    # big budget: C wins round 1 outright (3 new), then nothing improves
    out2 = BS.scheme_select(_keys(spark), _truth(spark), budget_pairs=100).collect()
    assert [(r["pick_order"], r["pass"]) for r in out2] == [(1, "C")]
    # tie-break: budget 3 -> only A (cost 3) and B (cost 2) and D fit;
    # A has 2 marginal, picked; then remaining budget 0 -> stop
    out3 = BS.scheme_select(_keys(spark), _truth(spark), budget_pairs=3).collect()
    assert [(r["pass"],) for r in out3] == [("A",)]


def test_scheme_select_sql_twin(spark):
    import duckdb

    keys_rows = ", ".join(
        f"({d}, '{p}', '{b}')"
        for d, p, b in [
            (1, "A", "a1"), (2, "A", "a1"), (3, "A", "a1"),
            (1, "B", "b1"), (2, "B", "b1"), (4, "B", "b2"), (5, "B", "b2"),
            *[(i, "C", "c1") for i in range(1, 7)],
            (6, "D", "d1"), (7, "D", "d1"),
        ]
    )
    truth_rows = "(1, 2), (1, 3), (4, 5), (8, 9)"
    keys_cte = (
        f"u_keys AS (SELECT * FROM (VALUES {keys_rows}) "
        "AS t(doc_id, pass, block_key))"
    )
    truth_cte = (
        f"truth AS (SELECT * FROM (VALUES {truth_rows}) AS t(doc_id_a, doc_id_b))"
    )
    con = duckdb.connect()
    for budget in (6, 100, 3):
        sql = BS.scheme_select_sql(keys_cte, truth_cte, budget, n_rounds=4)
        exp = sorted(tuple(r) for r in con.execute(sql).fetchall())
        got = sorted(
            tuple(r)
            for r in BS.scheme_select(
                _keys(spark), _truth(spark), budget_pairs=budget
            ).collect()
        )
        assert got == exp, budget
