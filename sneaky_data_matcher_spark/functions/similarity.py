"""Vectorized string- and vector-similarity kernels.

The reference matches on *exact* canonical-key equality
(services/SearchService.java:165 — EQUALS probe lookups). The north-star
generalization scores candidate pairs with Jaro-Winkler + Levenshtein; Spark
has a native codegen'd ``levenshtein`` but no Jaro-Winkler, so Jaro-Winkler
runs in an Arrow-batched pandas UDF.

Implementation choice: inside the pandas UDF each Arrow batch is handed to
an in-process DuckDB instance (`jaro_winkler_similarity`, vectorized C++).
That keeps the kernel out of per-row Python (the batch loop is C++) AND is
bit-identical to the DuckDB oracle the driver compares against. A pure-numpy
fallback is included in case duckdb is absent on executors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # executor-side import guard
    import duckdb as _duckdb
except Exception:  # pragma: no cover
    _duckdb = None

_DUCK_CON = None


def _duck_con():
    """Per-worker DuckDB connection pinned to ONE thread: Spark already owns
    the core-level parallelism (one Python worker per task slot); letting
    each worker's DuckDB fan out to all cores oversubscribes the box and
    destroys scaling (32 workers x 32 threads on 32 cores)."""
    global _DUCK_CON
    if _DUCK_CON is None:
        _DUCK_CON = _duckdb.connect()
        _DUCK_CON.execute("SET threads TO 1")
    return _DUCK_CON


def _jaro_winkler_py(s1: str, s2: str) -> float:
    """Plain-Python Jaro-Winkler replicating DuckDB's kernel (a rapidfuzz
    port) EXACTLY — fallback + test oracle for the DuckDB kernel. The
    rapidfuzz variant differs from the textbook algorithm in three
    fuzz-verified ways: empty-vs-empty scores 0.0 (not 1.0), the
    transposition term is halved with INTEGER division, and the Winkler
    prefix boost applies only when jaro > 0.7 (the standard boost
    threshold; e.g. jw('jon','jr') = 0.6111 unboosted). A fourth
    fuzz-verified delta: DuckDB compares UTF-8 BYTES, not code points
    (identical on ASCII), so the fallback encodes first."""
    s1 = s1.encode("utf-8") if isinstance(s1, str) else s1
    s2 = s2.encode("utf-8") if isinstance(s2, str) else s2
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    match_dist = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(l2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    jaro = (matches / l1 + matches / l2 + (matches - t // 2) / matches) / 3
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return jaro + prefix * 0.1 * (1.0 - jaro)


def _jw_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    sa = a.fillna("")
    sb = b.fillna("")
    if _duckdb is not None:
        con = _duck_con()
        batch = pd.DataFrame({"a": sa, "b": sb})
        con.register("batch", batch)
        out = con.execute(
            "SELECT jaro_winkler_similarity(a, b) AS jw FROM batch"
        ).df()
        con.unregister("batch")
        out.index = a.index
        return out["jw"]
    return pd.Series([_jaro_winkler_py(x, y) for x, y in zip(sa, sb)], index=a.index)


@F.pandas_udf(T.DoubleType())
def jaro_winkler(a: pd.Series, b: pd.Series) -> pd.Series:  # pragma: no cover (runs on executors)
    return _jw_batch(a, b)


def levenshtein_ratio(a: Column, b: Column) -> Column:
    """1 - lev(a,b)/max(len) — native codegen'd expression."""
    ml = F.greatest(F.length(a), F.length(b))
    return F.when(ml == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b).cast("double") / ml.cast("double")
    )


def token_jaccard(a: Column, b: Column) -> Column:
    """Jaccard over whitespace token sets — native array ops."""
    ta = F.array_distinct(F.split(a, r"\s+"))
    tb = F.array_distinct(F.split(b, r"\s+"))
    inter = F.size(F.array_intersect(ta, tb))
    un = F.size(F.array_union(ta, tb))
    return F.when(un == 0, F.lit(1.0)).otherwise(inter.cast("double") / un.cast("double"))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine over two array<float|double> columns — native higher-order fns
    (F.zip_with + F.aggregate), stays JVM-side for 100 TB scans."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))


# ---------------------------------------------------------------------------
# Monge-Elkan token-set similarity (r3)
# ---------------------------------------------------------------------------

def _me_directed_py(ta, tb) -> float:
    if len(ta) == 0:
        return 1.0 if len(tb) == 0 else 0.0
    if len(tb) == 0:
        return 0.0
    return sum(max(_jaro_winkler_py(a, b) for b in tb) for a in ta) / len(ta)


def _me_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    ta = a.apply(lambda x: [] if x is None else list(x))
    tb = b.apply(lambda x: [] if x is None else list(x))
    if _duckdb is not None:
        con = _duck_con()
        batch = pd.DataFrame({"ta": ta, "tb": tb})
        con.register("batch", batch)
        out = con.execute(f"SELECT {monge_elkan_sql('ta', 'tb')} AS me FROM batch").df()
        con.unregister("batch")
        out.index = a.index
        return out["me"]
    return pd.Series(
        [(_me_directed_py(x, y) + _me_directed_py(y, x)) / 2.0 for x, y in zip(ta, tb)],
        index=a.index,
    )


@F.pandas_udf(T.DoubleType())
def monge_elkan(a: pd.Series, b: pd.Series) -> pd.Series:  # pragma: no cover (executors)
    """Symmetric Monge-Elkan similarity over two array<string> token
    columns: mean over tokens of A of the best Jaro-Winkler partner in B,
    averaged with the B->A direction (the standard symmetrization — the
    raw measure is asymmetric). Hybrid token/character measure: tolerant
    to token reordering AND per-token typos, where token_jaccard only
    credits exact token equality.

    Same kernel strategy as `jaro_winkler`: each Arrow batch runs ONE
    vectorized DuckDB list-lambda expression (C++ inner loops, no per-row
    Python), bit-identical to the DuckDB oracle twin. Cost is
    O(|A|*|B|) jw calls per pair — use on CANDIDATE pairs after blocking,
    never as a blocking measure."""
    return _me_batch(a, b)


def _me_directed_sql(ta: str, tb: str) -> str:
    avg = (
        f"list_avg(list_transform({ta}, x -> "
        f"list_max(list_transform({tb}, y -> jaro_winkler_similarity(x, y)))))"
    )
    return (
        f"CASE WHEN len({ta}) = 0 AND len({tb}) = 0 THEN 1.0 "
        f"WHEN len({ta}) = 0 OR len({tb}) = 0 THEN 0.0 "
        f"ELSE {avg} END"
    )


def monge_elkan_sql(ta: str, tb: str) -> str:
    """DuckDB twin of `monge_elkan` over two list(varchar) expressions."""
    return f"(({_me_directed_sql(ta, tb)}) + ({_me_directed_sql(tb, ta)})) / 2.0"
