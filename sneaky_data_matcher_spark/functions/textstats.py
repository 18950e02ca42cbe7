"""Text-analysis column functions for training-data pipelines.

All native column expressions (JVM-side, codegen'd): language-ID heuristic,
quality scoring, token counting, document fingerprinting. These extend the
reference's string-canonicalization surface (SURVEY.md §2 P2-P5) to the ops
a 100 TB corpus-preparation pipeline needs.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — needed to resolve pandas_udf annotations
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Tiny stopword sets per language for the n-gram/stopword language heuristic.
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "ich", "zu", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
    "es": ["el", "la", "de", "que", "y", "los", "se", "un", "por", "con"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokens, blanks dropped."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_token_count(col: Column) -> Column:
    """BPE-ish regex token count: words, numbers, and single punctuation
    marks each count as one token (approximates subword tokenizer load)."""
    return F.size(
        F.filter(
            F.split(col, r"(?=[^A-Za-z0-9\s])|\s+"),
            lambda t: t != F.lit(""),
        )
    )


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = tokens(F.lower(col))
    sw = F.array(*[F.lit(w) for w in _LANG_STOPWORDS[lang]])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(n_sw.cast("double") / n.cast("double"))


def lang_id(col: Column) -> Column:
    """Pick the language whose stopword set overlaps the text most; 'und'
    if no stopwords hit. Deterministic tie-break: alphabetical language id
    wins (greatest(struct) compares ratio desc then we invert lang order)."""
    scored = [
        F.struct(
            stopword_ratio(col, lg).alias("r"),
            F.lit(chr(255 - i)).alias("tie"),  # earlier language wins ties
            F.lit(lg).alias("lang"),
        )
        for i, lg in enumerate(sorted(_LANG_STOPWORDS))
    ]
    best = F.greatest(*scored)
    return F.when(best["r"] > 0, best["lang"]).otherwise(F.lit("und"))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    n_punct = F.length(F.regexp_replace(col, r"[^!-/:-@\[-`{-~]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(n_punct.cast("double") / n.cast("double"))


def alpha_ratio(col: Column) -> Column:
    n = F.length(col)
    n_alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(n_alpha.cast("double") / n.cast("double"))


def mean_word_length(col: Column) -> Column:
    toks = tokens(col)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n == 0, F.lit(0.0)).otherwise(total.cast("double") / n.cast("double"))


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]: length sweet-spot, low punct
    noise, healthy mean word length, some stopwords. Weights are fixed so
    the score is deterministic and SQL-reproducible."""
    n_tok = token_count(col).cast("double")
    len_score = F.least(n_tok / 50.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), 1.0 - punct_ratio(col) * 4.0)
    mwl = mean_word_length(col)
    mwl_score = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    sw_score = F.least(stopword_ratio(col, "en") * 5.0, F.lit(1.0))
    return (0.3 * len_score + 0.3 * punct_pen + 0.2 * mwl_score + 0.2 * sw_score)


def fingerprint(col: Column) -> Column:
    """Document fingerprint: sha2 over the sorted distinct token set — order-
    and duplication-insensitive content id (reference P8 generalized,
    utils/Signature.java:15-28)."""
    return F.sha2(F.array_join(F.array_sort(F.array_distinct(tokens(F.lower(col)))), " "), 256)


# Winnowing (Schleimer et al., SIGMOD 2003) rolling-hash fingerprints.
# Polynomial k-gram hash with Horner evaluation mod a 31-bit prime — chosen
# (not xxhash/sha) so the EXACT same arithmetic is expressible in any SQL
# engine, making the operator oracle-checkable end to end.
WINNOW_B = 257
WINNOW_M = (1 << 31) - 1


def _winnow_np(text, k: int, w: int):
    """Vectorized winnow of one string: numpy Horner-mod rolling hashes +
    sliding-window minima. Identical arithmetic to the SQL twin."""
    import numpy as np

    s = ("" if text is None else text).lower()
    codes = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8).astype(np.int64)
    n = codes.size
    if n < k:
        return []
    npos = n - k + 1
    acc = np.zeros(npos, dtype=np.int64)
    for j in range(k):  # k tiny; each step vectorized over all positions
        acc = (acc * WINNOW_B + codes[j : j + npos]) % WINNOW_M
    if npos < w:
        return sorted(set(acc.tolist()))
    mins = acc[: npos - w + 1].copy()
    for j in range(1, w):
        np.minimum(mins, acc[j : j + npos - w + 1], out=mins)
    return sorted(set(mins.tolist()))


def winnow_fingerprints(col: Column, k: int = 8, w: int = 4) -> Column:
    """Winnowing (Schleimer et al., SIGMOD 2003) rolling-hash fingerprints:
    sorted distinct per-window minima over character-k-gram polynomial
    hashes. Guarantees any shared substring of length >= k + w - 1 yields a
    shared fingerprint — the standard near-copy detection primitive.

    Arrow-batched pandas UDF with numpy inner loops: a pure column-
    expression version (transform+aggregate Horner per position) evaluates
    interpreted per element and measured ~1000x slower — this is exactly
    the 'Python only where built-ins genuinely can't express it
    efficiently' case. ASCII-safe: non-ASCII bytes hash per UTF-8 byte on
    both sides (the SQL twin uses ord(); keep inputs ASCII for parity)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _udf(texts: pd.Series) -> pd.Series:  # pragma: no cover (executors)
        return texts.map(lambda t: _winnow_np(t, k, w))

    return _udf(col)


def kgram_hashes_sql(expr: str, k: int = 8) -> str:
    """DuckDB twin of kgram_hashes — identical Horner-mod arithmetic."""
    s = f"lower({expr})"
    horner = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(0, {k}), j -> CAST(ord(substr({s}, i + j, 1)) AS BIGINT))), "
        f"(acc, c) -> (acc * {WINNOW_B} + c) % {WINNOW_M})"
    )
    return (
        f"CASE WHEN length({s}) < {k} THEN CAST([] AS BIGINT[]) "
        f"ELSE list_transform(range(1, length({s}) - {k} + 2), i -> {horner}) END"
    )


def winnow_fingerprints_sql(kh_col: str, w: int = 4) -> str:
    """DuckDB twin of winnow_fingerprints, over a column already holding
    the k-gram hash list (compute it once via kgram_hashes_sql in a
    subquery — inlining it here would re-evaluate the rolling hash per
    reference)."""
    kh = kh_col
    return (
        f"CASE WHEN len({kh}) < {w} THEN list_sort(list_distinct({kh})) "
        f"ELSE list_sort(list_distinct(list_transform("
        f"range(1, len({kh}) - {w} + 2), i -> list_min(({kh})[i:i+{w}-1])))) END"
    )
