"""Phonetic blocking keys — a portable Soundex usable as a blocking pass.

The reference blocks only on exact canonical equality
(repositories/IndexManager.java:29-38 per-column value index +
services/SearchService.java:165 EQUALS probe); phonetic codes are the
classic record-linkage blocking key for name-like fields (Fellegi-Sunter
era practice, public literature): typo'd variants of a name share the
same 4-char code, so they land in the same block without any pair
comparison.

This is American Soundex with the H/W-transparency rule (letters of the
same class separated by H or W are coded once; separated by a vowel they
are coded twice). It is implemented THREE times from one spec so every
engine agrees byte-for-byte:

  - `soundex_col`      Spark Column — translate + per-digit regexp collapse
                       (no regex backreferences: RE2 in DuckDB lacks them,
                       so the collapse is seven literal-run replaces)
  - `soundex_sql`      DuckDB SQL twin, same expression shape
  - `soundex_py`       pure-Python oracle for unit/property tests

NOTE: Spark ships a builtin `F.soundex`, but its edge-case behavior
(H/W rule, non-letter handling) is not replicated by any DuckDB builtin,
so the oracle could not check it; the portable chain is the point.
Deltas from a given library's soundex are irrelevant here — the code is
a BLOCKING KEY, and all that matters is that the same spec is applied to
both sides of every comparison.

Scale notes (100 TB): the whole code is a per-row projection of native
string expressions — whole-stage codegen, no UDF, no shuffle. As a
blocking pass it adds one more (doc_id, pass, block_key) stripe to the
long keys frame; census/salting apply to it unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# letter -> digit class map; H and W map to nothing (deleted), vowels+Y
# map to '0' (separator). Single source of truth for all three engines.
_FROM = "BFPVCGJKQSXZDTLMNRAEIOUY" + "HW"
_TO = "111122222222334556000000"  # 2 shorter than _FROM -> H/W deleted
_DIGITS = "0123456"


def soundex_col(col: Column) -> Column:
    """Portable Soundex of a string column -> '' for letterless input,
    else LETTER + 3 digits (zero-padded)."""
    s = F.upper(F.regexp_replace(col, "[^A-Za-z]", ""))
    first = F.substring(s, 1, 1)
    code = F.translate(s, _FROM, _TO)
    for d in _DIGITS:
        code = F.regexp_replace(code, f"{d}{d}+", d)
    # the first collapsed code belongs to the first letter iff that letter
    # is a coded consonant (vowels code to '0', H/W are deleted) — drop it
    # so the letter itself is not double-counted
    first_is_coded = F.translate(first, _FROM, _TO).isin(
        *[str(i) for i in range(1, 7)]
    )
    digits = F.when(first_is_coded, code.substr(F.lit(2), F.length(code))).otherwise(
        code
    )
    digits = F.rpad(F.substring(F.regexp_replace(digits, "0", ""), 1, 3), 3, "0")
    return F.when(s == "", F.lit("")).otherwise(F.concat(first, digits))


def soundex_sql(expr: str) -> str:
    """DuckDB twin of `soundex_col` over SQL expression `expr`."""
    s = f"upper(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    code = f"translate({s}, '{_FROM}', '{_TO}')"
    for d in _DIGITS:
        code = f"regexp_replace({code}, '{d}{d}+', '{d}', 'g')"
    first = f"substr({s}, 1, 1)"
    first_is_coded = f"translate({first}, '{_FROM}', '{_TO}') IN ('1','2','3','4','5','6')"
    digits = f"CASE WHEN {first_is_coded} THEN substr({code}, 2) ELSE {code} END"
    digits = f"rpad(substr(replace({digits}, '0', ''), 1, 3), 3, '0')"
    return f"CASE WHEN {s} = '' THEN '' ELSE {first} || {digits} END"


def soundex_py(x: str | None) -> str | None:
    """Pure-Python oracle, same spec (tests/test_phonetic.py checks all
    three engines agree on crafted names + Hypothesis random strings).
    NULL propagates (matching Spark/DuckDB); letterless input -> ''."""
    if x is None:
        return None
    # strip BEFORE uppercasing, like the Spark/SQL twins — Python upper()
    # does multi-char locale folds ('ß' -> 'SS') the engines never see
    s = "".join(ch for ch in x if "A" <= ch <= "Z" or "a" <= ch <= "z").upper()
    if not s:
        return ""
    tr = {c: d for c, d in zip(_FROM, _TO)}  # H/W absent -> deleted
    code = "".join(tr[c] for c in s if c in tr)
    out = []
    for c in code:
        if not out or out[-1] != c:
            out.append(c)
    collapsed = "".join(out)
    if s[0] in tr and tr[s[0]] != "0":
        collapsed = collapsed[1:]
    digits = collapsed.replace("0", "")[:3].ljust(3, "0")
    return s[0] + digits


def phonetic_pass(canon: DataFrame, n_tokens: int = 2) -> DataFrame:
    """canon(doc_id, doc_text) -> (doc_id, pass='sdx', block_key): the
    Soundex codes of the first `n_tokens` tokens, joined. Unions cleanly
    into blocking.blocking_keys' long frame as an extra recall pass;
    census + salt_keys apply unchanged."""
    toks = F.split(F.col("doc_text"), " ")
    # try_element_at + coalesce('') ≡ DuckDB split_part's ''-for-missing
    # (ANSI element_at throws past the end; soundex('') = '')
    parts = [
        soundex_col(F.coalesce(F.try_element_at(toks, F.lit(i + 1)), F.lit("")))
        for i in range(n_tokens)
    ]
    return canon.select(
        "doc_id",
        F.lit("sdx").alias("pass"),
        F.concat(F.lit("sdx:"), *parts).alias("block_key"),
    )


def phonetic_candidate_pairs(
    canon: DataFrame, n_tokens: int = 2, max_block_size: int = 50
) -> DataFrame:
    """Candidate pairs from phonetic blocks: self-join doc ids within each
    sdx block, skipping degenerate (hot) blocks past `max_block_size` —
    the same census-cap discipline as blocking.blocking_keys. The census
    (one row per block) is broadcast, so the only shuffle is the
    block_key hash partitioning of the ids themselves; ids are bare longs
    until the caller attaches payload."""
    sdx = phonetic_pass(canon, n_tokens=n_tokens)
    census = sdx.groupBy("block_key").agg(F.count("*").alias("sz"))
    cold = sdx.join(
        F.broadcast(census.filter(F.col("sz") <= max_block_size)), "block_key"
    ).select("doc_id", "block_key")
    a = cold.alias("a")
    b = cold.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.block_key").alias("block_key"),
        )
    )


def phonetic_pass_sql(canon_rel: str = "canon", n_tokens: int = 2) -> str:
    """DuckDB twin of `phonetic_pass` (reads the canon CTE)."""
    parts = " || ".join(
        soundex_sql(f"split_part(doc_text, ' ', {i + 1})") for i in range(n_tokens)
    )
    return (
        f"SELECT doc_id, 'sdx' AS pass, 'sdx:' || {parts} AS block_key "
        f"FROM {canon_rel}"
    )
