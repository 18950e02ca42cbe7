"""Driver-contract registry integrity: fast structural gates that catch a
broken query registration or an unparseable oracle in seconds, without the
full value-hash sweep (tools/oracle_check.py) that takes over an hour."""

from __future__ import annotations

import duckdb
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def test_every_query_has_an_oracle():
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) == set(qs), (
        set(qs) - set(osql),
        set(osql) - set(qs),
    )
    assert len(qs) >= 190


def test_every_oracle_parses_and_plans_in_duckdb():
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    bad = {}
    for name, sql in E.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 — collecting all failures
            bad[name] = str(exc).splitlines()[0]
    assert not bad, bad


def test_query_callables_are_uniquely_named():
    import __spark_entry__ as E

    qs = E.queries()
    assert all(callable(fn) for fn in qs.values())
    assert len(qs) == len(set(qs))
