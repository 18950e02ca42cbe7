"""Local mirror of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 and compares against
its oracle_sql() twin in DuckDB: row count, column names, and an
order-insensitive value hash over columns sorted by name. Floats are
hashed at FULL precision (repr of the exact double) — strictly at least
as strict as any driver-side hash, so local green implies driver green.

The DuckDB side is collected via `con.sql(sql).df()` — the DRIVER's
collection path — not `fetchall()`. The difference is load-bearing
(VERDICT r4 forensics): pandas coerces DuckDB HUGEINT (e.g. any
un-CAST `SUM(BIGINT)`) to float64, rendering `512` as `512.0`, while
fetchall() hands back exact Python ints. Three rounds of driver-red /
local-green on packing_stats + lm_logprob were exactly this type-path
divergence — never a value or rounding bug. Going through .df() here
makes the local gate fail the same way the driver would. A registry
type gate (`--typegate`, also run at the start of every full sweep)
binds every oracle in DuckDB and fails on HUGEINT/UHUGEINT output
columns so the class can't reappear.

Usage: python tools/oracle_check.py [--typegate] [name ...]
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
    # numpy scalars (the .df() path yields np.int64 / np.float64 /
    # np.bool_) → Python scalars first: repr(np.float64(x)) is
    # "np.float64(x)" under numpy 2, which would poison the hash.
    if type(v).__module__ == "numpy" and hasattr(v, "item"):
        v = v.item()
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


def typegate(con, oracle_sql: dict) -> int:
    """Bind every oracle in DuckDB (no execution) and fail on output
    column types that the driver's pandas `.df()` collection renders
    differently from Spark's collect() (VERDICT r4 / r5 forensics):

    - HUGEINT/UHUGEINT (any un-CAST SUM(BIGINT)) → float64 ("512.0" vs
      Spark long "512"); CAST the aggregate to BIGINT.
    - DATE → pandas Timestamp str '... 00:00:00' vs Spark date
      'yyyy-MM-dd'; render as strftime VARCHAR on BOTH engines.

    NULLs in numeric/timestamp columns (NaN / int→float64 / NaT) are the
    same class but not statically detectable — the full sweep's .df()
    value-hash path catches those. Returns the number of offenders."""
    bad = 0
    for name, sql in oracle_sql.items():
        try:
            rel = con.sql(sql)
            offend = [
                (c, str(t))
                for c, t in zip(rel.columns, rel.types)
                if str(t) in ("HUGEINT", "UHUGEINT", "DATE")
            ]
        except Exception as exc:  # noqa: BLE001
            bad += 1
            print(f"TYPEGATE {name:28s} BIND-ERROR {type(exc).__name__}: {exc}")
            continue
        if offend:
            bad += 1
            print(
                f"TYPEGATE {name:28s} FAIL {offend} — CAST sums to BIGINT / "
                "render dates as strftime VARCHAR (both engines)"
            )
    return bad


def main(only: list[str]) -> int:
    import duckdb

    import __spark_entry__ as E
    from sneaky_data_matcher_spark.session import get_spark

    typegate_only = "--typegate" in only
    only = [n for n in only if n != "--typegate"]
    if typegate_only:
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
        bad = typegate(con, E.oracle_sql())
        print(f"typegate: {bad} offending oracle(s)")
        return 1 if bad else 0

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
    if not only:
        # full sweep: run the registry type gate first so a HUGEINT
        # regression fails loudly even before any query executes
        failures += typegate(con, osql)
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
            # .df() (pandas), NOT fetchall(): the driver's type path —
            # see module docstring.
            opdf = con.sql(osql[name]).df()
            ocols = list(opdf.columns)
            orows = list(opdf.itertuples(index=False, name=None))
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
