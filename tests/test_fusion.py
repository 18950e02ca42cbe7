"""Truth discovery (operators/fusion.py): reliability learning, value
election, and SQL-twin exactness (all-integer nano-unit pipeline)."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F  # noqa: F401

from sneaky_data_matcher_spark.operators.fusion import (
    truth_discovery,
    truth_discovery_sql_ctes,
)


def _claims(n_entities=60, err={0: 99, 1: 5, 2: 3, 3: 2}):
    """4 sources claim a value per entity; source s is wrong on entities
    divisible by its error modulus (source 0 never wrong)."""
    rows = []
    for e in range(n_entities):
        true = f"V{e % 7}"
        for s in range(4):
            wrong = s > 0 and e % err[s] == 0
            rows.append((s, e, "attr", f"W{s}" if wrong else true))
    return rows


def test_truth_discovery_learns_reliability(spark):
    rows = _claims()
    claims = spark.createDataFrame(
        rows, "source_id int, entity_id int, attr string, value string"
    )
    elected, trust = truth_discovery(claims, rounds=2)
    t = {r.source_id: r.trust for r in trust.collect()}
    # trust strictly ordered by planted error rate
    assert t[0] > t[1] > t[2] > t[3]
    # the honest majority recovers every true value
    e = {r.entity_id: r.value for r in elected.collect()}
    assert all(e[i] == f"V{i % 7}" for i in range(60))


def test_truth_discovery_matches_sql_twin(spark):
    rng = random.Random(3)
    rows = [
        (s, e, "a", f"V{rng.randint(0, 2)}")
        for e in range(25)
        for s in range(5)
        if rng.random() < 0.8
    ]
    claims = spark.createDataFrame(
        rows, "source_id int, entity_id int, attr string, value string"
    )
    elected, trust = truth_discovery(claims, rounds=3)
    got_e = sorted(tuple(r) for r in elected.collect())
    got_t = sorted(tuple(r) for r in trust.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE cl(source_id INT, entity_id INT, attr VARCHAR, value VARCHAR)"
    )
    con.executemany("INSERT INTO cl VALUES (?,?,?,?)", rows)
    ctes = truth_discovery_sql_ctes("cl", rounds=3)
    exp_e = sorted(
        con.execute(
            f"WITH {ctes} SELECT entity_id, attr, value, confidence FROM td_elected"
        ).fetchall()
    )
    exp_t = sorted(
        con.execute(
            f"WITH {ctes} SELECT source_id, trust FROM td_trust"
        ).fetchall()
    )
    assert got_e == [tuple(x) for x in exp_e]
    assert got_t == [tuple(x) for x in exp_t]
