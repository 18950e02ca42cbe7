"""The ONE portable per-character Horner polynomial hash.

Every oracle-checkable hashing operator in this engine (simhash tokens,
PPRL q-grams, count-min sketch, DSIR n-gram buckets, winnowing k-grams)
uses the same construction — fold character code points through
``acc * base + ord(c) mod M`` with a Mersenne 31-bit modulus — because it
is the strongest hash whose EXACT arithmetic is expressible in Spark
column expressions, DuckDB SQL, and plain Python alike (xxhash/sha are
not recomputable in SQL engines digit-for-digit over arbitrary
expressions). Modules bind their own (base, modulus) constants; the fold
shape lives here once, so a portability fix (e.g. the prepend-init trick
in the SQL twin, or the ord()/substr convention) cannot drift between
copies.

Spark ``F.ascii`` returns the code point of the first character and
DuckDB ``ord(substr(s, i, 1))`` likewise — both per CHARACTER, not per
byte, so parity holds on non-ASCII input too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_31 = (1 << 31) - 1


def horner(t: Column, base: int, modulus: int = MERSENNE_31) -> Column:
    """Horner code-point hash of one (lambda-var) string column."""
    return F.aggregate(
        F.sequence(F.lit(1), F.length(t)),
        F.lit(0).cast("long"),
        lambda acc, i: (acc * base + F.ascii(F.substring(t, i, 1))) % modulus,
    )


def horner_sql(var: str, base: int, modulus: int = MERSENNE_31) -> str:
    """DuckDB twin — identical arithmetic over the same code points.
    ``var`` is any string-typed SQL expression (typically a lambda var)."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length({var}) + 1), "
        f"__hi -> CAST(ord(substr({var}, CAST(__hi AS INT), 1)) AS BIGINT))), "
        f"(acc, c) -> (acc * {base} + c) % {modulus})"
    )
