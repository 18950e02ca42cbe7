"""Local mirror of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 and compares against
its oracle_sql() twin in DuckDB: row count, column names, and an
order-insensitive value hash over columns sorted by name. Floats are
hashed at FULL precision (repr of the exact double) — strictly at least
as strict as any driver-side hash, so local green implies driver green.
(r3 lesson: a 9-decimal pre-round here let two tie-rounding bugs through
the local gate that the driver then failed — VERDICT r3 "What's wrong".)

Usage: python tools/oracle_check.py [name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def _norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(only: list[str]) -> int:
    import duckdb

    import __spark_entry__ as E
    from sneaky_data_matcher_spark.session import get_spark

    # cpus override: re-running the sweep at a DIFFERENT parallelism is
    # the determinism check — a query whose values depend on partition
    # order (unsorted collect_set, partition-order LIMIT) hashes
    # differently across levels and gets caught here before the driver.
    spark = get_spark(
        app_name="oracle_check",
        cpus=int(os.environ.get("SPARK_GRAFT_ORACLE_CPUS", "8")),
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, osql = E.queries(), E.oracle_sql()
    names = only or list(qs)
    failures = 0
    import time as _time
    for name in names:
        t0 = _time.perf_counter()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in osql:
                dt = _time.perf_counter() - t0
                print(f"{name:28s} rows={len(srows):6d}  (rows-only, no oracle)  t={dt:.1f}s")
                continue
            odf = con.sql(osql[name])
            ocols = list(odf.columns)
            orows = odf.fetchall()
            problems = []
            if sorted(scols) != sorted(ocols):
                problems.append(f"cols spark={scols} duck={ocols}")
            if len(srows) != len(orows):
                problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
            if not problems:
                hs = value_hash(srows, scols)
                ho = value_hash(orows, ocols)
                if hs != ho:
                    problems.append("value-hash mismatch")
                    # print a sample diff
                    ss = set("\x01".join(map(_norm_cell, r)) for r in srows)
                    oo = set("\x01".join(map(_norm_cell, r)) for r in orows)
                    for x in list(ss - oo)[:3]:
                        print("   spark-only:", x[:160])
                    for x in list(oo - ss)[:3]:
                        print("   duck-only: ", x[:160])
            dt = _time.perf_counter() - t0
            if problems:
                failures += 1
                print(f"{name:28s} FAIL  {'; '.join(problems)}  t={dt:.1f}s")
            else:
                print(f"{name:28s} OK    rows={len(srows)}  t={dt:.1f}s")
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"{name:28s} ERROR {type(exc).__name__}: {exc}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
