"""Tests for the r3 linkage comparators & post-processing: address
standardization, graded date matching, geo grid-distance join,
Monge-Elkan similarity, mutual-best 1:1 assignment, and the
DuckDB-exact Jaro-Winkler fallback."""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.functions import addresses as A
from sneaky_data_matcher_spark.functions import dates as D
from sneaky_data_matcher_spark.functions.similarity import (
    _jaro_winkler_py,
    _me_directed_py,
    monge_elkan,
    monge_elkan_sql,
)
from sneaky_data_matcher_spark.operators.assignment import mutual_best_match
from sneaky_data_matcher_spark.operators.geo import (
    grid_distance_join,
    grid_distance_join_sql,
)


# ---------------------------------------------------------------------------
# Jaro-Winkler fallback == DuckDB kernel (the fallback is the documented
# test oracle; rapidfuzz semantics: empty->0, integer-halved transpositions,
# boost only above 0.7)
# ---------------------------------------------------------------------------

def test_jw_fallback_matches_duckdb_fuzz():
    con = duckdb.connect()
    rng = random.Random(1234)
    cases = [("", ""), ("", "a"), ("a", ""), ("jon", "jr"), ("jon", "john")]
    for _ in range(4000):
        a = "".join(rng.choices("abcdef é中", k=rng.randint(0, 10)))
        b = "".join(rng.choices("abcdef é中", k=rng.randint(0, 10)))
        cases.append((a, b))
    for a, b in cases:
        d = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(d - _jaro_winkler_py(a, b)) < 1e-12, (a, b)


def test_jw_boost_threshold_gates_prefix():
    # jaro('jon','jr') = 0.6111 <= 0.7 -> no Winkler boost
    assert _jaro_winkler_py("jon", "jr") == pytest.approx(0.611111111111111)
    # above the threshold the shared prefix boosts
    assert _jaro_winkler_py("jon", "john") == pytest.approx(0.9333333333333333)


# ---------------------------------------------------------------------------
# Monge-Elkan
# ---------------------------------------------------------------------------

def test_monge_elkan_python_properties():
    assert _me_directed_py([], []) == 1.0
    assert _me_directed_py([], ["a"]) == 0.0
    assert _me_directed_py(["a"], []) == 0.0
    # identical token sets in any order score 1.0
    assert _me_directed_py(["b", "a"], ["a", "b"]) == 1.0
    # per-token typo keeps credit where jaccard gives none
    me = _me_directed_py(["jon", "smith"], ["john", "smyth"])
    assert 0.8 < me < 1.0


def test_monge_elkan_udf_matches_duckdb(spark):
    rows = [
        (["jon", "smith"], ["john", "smyth", "jr"]),
        ([], ["a"]),
        ([], []),
        (["acme", "corp"], ["acme", "corporation"]),
        (["x"], ["x"]),
    ]
    df = spark.createDataFrame(rows, "ta array<string>, tb array<string>")
    got = [
        r[0] for r in df.select(monge_elkan(F.col("ta"), F.col("tb"))).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE me(ta VARCHAR[], tb VARCHAR[])")
    con.executemany("INSERT INTO me VALUES (?, ?)", rows)
    exp = [
        r[0]
        for r in con.execute(
            f"SELECT {monge_elkan_sql('ta', 'tb')} FROM me"
        ).fetchall()
    ]
    assert all(abs(g - e) < 1e-12 for g, e in zip(got, exp))
    # symmetric by construction
    sym = [
        r[0] for r in df.select(monge_elkan(F.col("tb"), F.col("ta"))).collect()
    ]
    assert got == sym


# ---------------------------------------------------------------------------
# Mutual-best 1:1 assignment
# ---------------------------------------------------------------------------

def test_mutual_best_match_semantics(spark):
    pairs = [
        (1, 2, 0.9),  # mutual best
        (1, 3, 0.8),
        (2, 3, 0.85),  # 3's best is 2, but 2's best is 1 -> dropped
        (4, 5, 0.7),
        (5, 6, 0.7),  # 5 ties 4 vs 6 -> smaller id 4 wins -> (4,5) mutual
        (7, 8, 0.6),
        (7, 9, 0.6),  # 7 ties -> 8 wins; 8's best is 7 -> (7,8)
    ]
    df = spark.createDataFrame(pairs, "doc_id_a int, doc_id_b int, score double")
    got = sorted(tuple(r) for r in mutual_best_match(df).collect())
    assert got == [(1, 2, 0.9), (4, 5, 0.7), (7, 8, 0.6)]


def test_mutual_best_match_is_one_to_one(spark):
    rng = random.Random(7)
    pairs = set()
    while len(pairs) < 300:
        a, b = rng.randint(1, 60), rng.randint(1, 60)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    rows = [(a, b, round(rng.random(), 6)) for a, b in pairs]
    df = spark.createDataFrame(rows, "doc_id_a int, doc_id_b int, score double")
    out = [tuple(r) for r in mutual_best_match(df).collect()]
    seen: set[int] = set()
    for a, b, _ in out:
        assert a < b
        assert a not in seen and b not in seen  # each node matched once
        seen.add(a)
        seen.add(b)
    assert out  # non-degenerate


# ---------------------------------------------------------------------------
# Geo grid-distance join
# ---------------------------------------------------------------------------

def test_grid_distance_join_matches_bruteforce(spark):
    pts = [
        (
            i,
            ((i * 7919) % 120000) / 1000.0 - 60.0,
            ((i * 104729) % 340000) / 1000.0 - 170.0,
        )
        for i in range(1, 801)
    ]
    df = spark.createDataFrame(pts, "id bigint, lat double, lon double")
    got = sorted(
        tuple(r)
        for r in grid_distance_join(df, 250.0)
        .select("id_a", "id_b", F.round("dist_km", 3).alias("d"))
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(id BIGINT, lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?, ?)", pts)
    hav = (
        "2*6371*asin(sqrt(pow(sin(radians(b.lat-a.lat)/2),2)"
        "+cos(radians(a.lat))*cos(radians(b.lat))"
        "*pow(sin(radians(b.lon-a.lon)/2),2)))"
    )
    brute = sorted(
        con.execute(
            f"SELECT a.id, b.id, round({hav}, 3) FROM pts a JOIN pts b "
            f"ON a.id < b.id WHERE {hav} <= 250"
        ).fetchall()
    )
    assert got == brute
    # and the SQL twin is the same plan, same answer
    twin = sorted(
        con.execute(
            "SELECT id_a, id_b, round(dist_km, 3) FROM ("
            + grid_distance_join_sql("pts", 250.0)
            + ")"
        ).fetchall()
    )
    assert twin == brute


def test_grid_join_clustered_points_no_duplicates(spark):
    # a tight cluster straddling cell borders: every pair within radius,
    # each emitted exactly once
    base = [(i, 45.0 + i * 0.001, 10.0 + i * 0.001) for i in range(1, 21)]
    df = spark.createDataFrame(base, "id bigint, lat double, lon double")
    out = grid_distance_join(df, 50.0).collect()
    keys = [(r.id_a, r.id_b) for r in out]
    assert len(keys) == len(set(keys)) == 20 * 19 // 2


# ---------------------------------------------------------------------------
# Dates
# ---------------------------------------------------------------------------

def test_date_match_levels(spark):
    rows = [
        (dt.date(1980, 3, 7), dt.date(1980, 3, 7), 3),   # exact
        (dt.date(1980, 3, 7), dt.date(1980, 7, 3), 2),   # d/m swap
        (dt.date(1980, 3, 7), dt.date(1980, 3, 8), 2),   # +- 1 day
        (dt.date(1980, 1, 1), dt.date(1979, 12, 31), 2), # +- 1 day, year edge
        (dt.date(1980, 3, 7), dt.date(1980, 3, 20), 1),  # same y+m
        (dt.date(1980, 3, 7), dt.date(1981, 3, 7), 0),
        (dt.date(1980, 5, 5), dt.date(1980, 5, 5), 3),   # trivial swap = exact
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in rows], "a date, b date"
    )
    got = [
        r[0]
        for r in df.select(D.date_match_level(F.col("a"), F.col("b"))).collect()
    ]
    assert got == [lvl for _, _, lvl in rows]
    con = duckdb.connect()
    con.execute("CREATE TABLE d(a DATE, b DATE)")
    con.executemany("INSERT INTO d VALUES (?, ?)", [(a, b) for a, b, _ in rows])
    exp = [
        r[0]
        for r in con.execute(
            f"SELECT {D.date_match_sql('a', 'b')} FROM d"
        ).fetchall()
    ]
    assert got == exp


# ---------------------------------------------------------------------------
# Addresses
# ---------------------------------------------------------------------------

ADDRS = [
    "123 North Main Street, Apt. 4B",
    "123 N MAIN ST UNIT 4B",
    "9 West Elm Avenue Suite 200, floor 3",
    "  PO BOX 77 ",
    "APT 5",
    "",
    "42 Lake Shore Drive",
    "7 south PARKWAY apartment 12",
]


def test_address_normalize_cases(spark):
    df = spark.createDataFrame([(a,) for a in ADDRS], "a string")
    out = {
        r.a: (r.n, r.u)
        for r in df.select(
            "a",
            A.normalize_address(F.col("a")).alias("n"),
            A.address_unit(F.col("a")).alias("u"),
        ).collect()
    }
    # the two spellings of the same address canonicalize identically
    assert out[ADDRS[0]] == out[ADDRS[1]] == ("123 N MAIN ST", "4B")
    assert out[ADDRS[2]] == ("9 W ELM AVE", "200")
    assert out["APT 5"] == ("", "5")
    assert out[""] == ("", None)


def test_address_spark_matches_duckdb(spark):
    df = spark.createDataFrame([(a,) for a in ADDRS], "a string")
    got = [
        (r.n, r.u)
        for r in df.select(
            A.normalize_address(F.col("a")).alias("n"),
            A.address_unit(F.col("a")).alias("u"),
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(a,) for a in ADDRS])
    exp = con.execute(
        f"SELECT {A.normalize_address_sql('a')}, {A.address_unit_sql('a')} FROM t"
    ).fetchall()
    assert got == [tuple(e) for e in exp]


# ---------------------------------------------------------------------------
# Group linkage
# ---------------------------------------------------------------------------

def test_group_linkage_hand_case(spark):
    """Two groups with 2x2 members: the 1:1 assignment must not double-use
    a member, and group_sim is the matched-member Jaccard."""
    from sneaky_data_matcher_spark.operators.assignment import group_linkage

    # group pair (g1, h1): members a1,a2 vs b1,b2.
    # sims: (a1,b1)=0.9 (a1,b2)=0.8 (a2,b1)=0.85 -> mutual best: (a1,b1);
    # a2's best b1 is taken by... mutual-best does NOT chain: a2->b1 but
    # b1->a1, so only (a1,b1) matches => n_matched=1, sim=1/(2+2-1)=1/3.
    rows = [
        (1, 1, "a1", "b1", 0.9),
        (1, 1, "a1", "b2", 0.8),
        (1, 1, "a2", "b1", 0.85),
        # group pair (2, 2): perfect 1:1 double match
        (2, 2, "c1", "d1", 1.0),
        (2, 2, "c2", "d2", 1.0),
    ]
    mp = spark.createDataFrame(
        rows, "group_a int, group_b int, id_a string, id_b string, sim double"
    )
    sza = spark.createDataFrame([(1, 2), (2, 2)], "group_a int, na long")
    szb = spark.createDataFrame([(1, 2), (2, 2)], "group_b int, nb long")
    out = {
        (r.group_a, r.group_b): (r.n_matched, round(r.group_sim, 6), r.avg_sim)
        for r in group_linkage(mp, sza, szb).collect()
    }
    assert out[(1, 1)] == (1, round(1 / 3, 6), 0.9)
    assert out[(2, 2)] == (2, 1.0, 1.0)


def test_group_linkage_matches_duckdb_twin(spark):
    import random

    import duckdb

    from sneaky_data_matcher_spark.operators.assignment import (
        group_linkage,
        group_linkage_sql_ctes,
    )

    rng = random.Random(5)
    rows = []
    for ga in range(4):
        for gb in range(4):
            for i in range(rng.randint(0, 5)):
                rows.append(
                    (ga, gb, f"a{rng.randint(0,6)}", f"b{rng.randint(0,6)}",
                     round(rng.random(), 6))
                )
    rows = list({(ga, gb, ia, ib): (ga, gb, ia, ib, s)
                 for ga, gb, ia, ib, s in rows}.values())
    sza_r = [(g, rng.randint(7, 10)) for g in range(4)]
    szb_r = [(g, rng.randint(7, 10)) for g in range(4)]
    mp = spark.createDataFrame(
        rows, "group_a int, group_b int, id_a string, id_b string, sim double"
    )
    sza = spark.createDataFrame(sza_r, "group_a int, na long")
    szb = spark.createDataFrame(szb_r, "group_b int, nb long")
    got = sorted(
        (r.group_a, r.group_b, r.n_matched, round(r.group_sim, 9), round(r.avg_sim, 9))
        for r in group_linkage(mp, sza, szb, min_sim=0.3).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE mp(group_a INT, group_b INT, id_a VARCHAR, id_b VARCHAR, sim DOUBLE)")
    con.executemany("INSERT INTO mp VALUES (?,?,?,?,?)", rows)
    con.execute("CREATE TABLE sza(group_a INT, na BIGINT)")
    con.executemany("INSERT INTO sza VALUES (?,?)", sza_r)
    con.execute("CREATE TABLE szb(group_b INT, nb BIGINT)")
    con.executemany("INSERT INTO szb VALUES (?,?)", szb_r)
    exp = sorted(
        (a, b, n, round(gs, 9), round(av, 9))
        for a, b, n, gs, av in con.execute(
            "WITH " + group_linkage_sql_ctes("mp", "sza", "szb", 0.3)
            + " SELECT group_a, group_b, n_matched, group_sim, avg_sim FROM gl_out"
        ).fetchall()
    )
    assert got == exp


# ---------------------------------------------------------------------------
# Person names
# ---------------------------------------------------------------------------

NAME_CASES = [
    ("Smith, John A.", ("JOHN", "A", "SMITH", None), "JOHN SMITH"),
    ("John A. Smith", ("JOHN", "A", "SMITH", None), "JOHN SMITH"),
    ("SMITH JR, BILL", ("BILL", None, "SMITH", "JR"), "WILLIAM SMITH"),
    ("Bill Smith Jr.", ("BILL", None, "SMITH", "JR"), "WILLIAM SMITH"),
    ("Cher", (None, None, "CHER", None), "CHER"),
    ("", (None, None, None, None), None),
    ("van der Berg, Liz", ("LIZ", None, "VAN DER BERG", None),
     "ELIZABETH VAN DER BERG"),
    (",John", ("JOHN", None, None, None), "JOHN"),
    ("Kate  B.  C.  O Neil III", ("KATE", "B C O", "NEIL", "III"),
     "KATHERINE NEIL"),
]


def test_parse_person_name_cases(spark):
    from sneaky_data_matcher_spark.functions import names as N

    df = spark.createDataFrame([(x,) for x, _, _ in NAME_CASES], "x string")
    out = {
        r.x: ((r.p.first, r.p.middle, r.p.last, r.p.suffix), r.cn)
        for r in df.select(
            "x",
            N.parse_person_name(F.col("x")).alias("p"),
            N.canonical_name(F.col("x")).alias("cn"),
        ).collect()
    }
    for raw, parts, canon in NAME_CASES:
        assert out[raw] == (parts, canon), raw


def test_parse_person_name_matches_duckdb(spark):
    from sneaky_data_matcher_spark.functions import names as N

    extra = ["x, y, z", "PAT  LEE  SR", "JR", "Smith,", "  "]
    all_names = [x for x, _, _ in NAME_CASES] + extra
    df = spark.createDataFrame([(x,) for x in all_names], "x string")
    got = [
        (r.x, (r.p.first, r.p.middle, r.p.last, r.p.suffix), r.cn)
        for r in df.select(
            "x",
            N.parse_person_name(F.col("x")).alias("p"),
            N.canonical_name(F.col("x")).alias("cn"),
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE nm(x VARCHAR)")
    con.executemany("INSERT INTO nm VALUES (?)", [(x,) for x in all_names])
    exp = [
        (r[0], (r[1]["first"], r[1]["middle"], r[1]["last"], r[1]["suffix"]), r[2])
        for r in con.execute(
            f"SELECT x, {N.parse_person_name_sql('x')} p, "
            f"{N.canonical_name_sql('x')} cn FROM nm"
        ).fetchall()
    ]
    assert got == exp
