"""PII detection and redaction for training-data pipelines.

A 100 TB corpus pipeline has to scrub personal data before training.
These are native column expressions (JVM-side regexp + higher-order
aggregate for Luhn) — no Python in the hot path — extending the
reference's per-field validation surface (RecordValidationUtilService.java
validates email/phone on ingest; here the same concern is applied to free
text at corpus scale).

Every pattern is written in the common subset of Java regex (Spark),
RE2 (DuckDB oracle twin), and Python re — no backreferences, no
lookaround — so detection counts and redacted text agree byte-for-byte
across all three engines (same discipline as the email twins in
canonicalize.py).

Scale notes: all per-row projections, no shuffle, whole-stage codegen'd.
Luhn runs as an `aggregate` over a digit sequence (bounded at 19 digits),
not a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- patterns (Java regex ∩ RE2 ∩ Python re) -------------------------------
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# dotted-quad with per-octet range check; \b keeps '1.2.3.4.5' out
IPV4_PAT = (
    r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b"
)
SSN_PAT = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
# candidate card number: 13-19 digits allowing space/dash separators;
# true positives are confirmed by the Luhn checksum (luhn_valid below)
CARD_CANDIDATE_PAT = r"\b[0-9](?:[0-9 \-]{11,21})[0-9]\b"
# E.164-ish international phone: +country then 7-14 more digits with
# optional single separators
PHONE_PAT = r"\+[0-9]{1,3}(?:[ \-]?[0-9]){7,14}\b"


def digits_only(col: Column) -> Column:
    return F.regexp_replace(col, "[^0-9]", "")


def luhn_valid(col: Column) -> Column:
    """Luhn checksum over the digits of `col` (separators stripped).

    Native `aggregate` over the reversed digit positions: odd positions
    (1-based, from the right) add the digit, even positions add
    double-with-minus-9. Valid iff 13..19 digits and total % 10 == 0.
    """
    ds = digits_only(col)
    n = F.length(ds)
    d_at = lambda i: F.substring(ds, n - i + 1, 1).cast("int")  # noqa: E731
    total = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0),
        lambda acc, i: acc
        + F.when(i % 2 == 1, d_at(i)).otherwise(
            F.when(d_at(i) * 2 > 9, d_at(i) * 2 - 9).otherwise(d_at(i) * 2)
        ),
    )
    # CaseWhen short-circuits in codegen, so sequence(1, n) never sees
    # n == 0 (the descending-sequence footgun, ADVICE r2).
    return F.when((n >= 13) & (n <= 19), total % 10 == 0).otherwise(F.lit(False))


def luhn_valid_sql(expr: str) -> str:
    """DuckDB twin of luhn_valid, as a PURE expression (no subquery), so
    it can sit inside a list_filter lambda; `expr` is inlined (DuckDB CSEs
    the repeats, and this only runs in the sf0.01 oracle anyway)."""
    ds = f"regexp_replace({expr}, '[^0-9]', '', 'g')"
    n = f"length({ds})"
    d = f"CAST(substr({ds}, {n} - i + 1, 1) AS INT)"
    term = (
        f"CASE WHEN i % 2 = 1 THEN {d} "
        f"WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END"
    )
    total = f"list_sum(list_transform(range(1, {n} + 1), i -> {term}))"
    return f"({n} BETWEEN 13 AND 19 AND {total} % 10 = 0)"


def pii_counts(col: Column) -> dict[str, Column]:
    """Match counts per PII kind; card candidates are Luhn-confirmed."""
    card_hits = F.filter(
        F.regexp_extract_all(col, F.lit(CARD_CANDIDATE_PAT), 0), luhn_valid
    )
    return {
        "n_email": F.size(F.regexp_extract_all(col, F.lit(EMAIL_PAT), 0)),
        "n_ipv4": F.size(F.regexp_extract_all(col, F.lit(IPV4_PAT), 0)),
        "n_ssn": F.size(F.regexp_extract_all(col, F.lit(SSN_PAT), 0)),
        "n_card": F.size(card_hits),
        "n_phone": F.size(F.regexp_extract_all(col, F.lit(PHONE_PAT), 0)),
    }


# Redaction order matters: email first (its local part may contain
# digits); SSN before card (dashed digit runs); phone before card — a
# phone's national part is a 10-14-digit separated run that the card
# candidate pattern would otherwise swallow, while cards never start
# with '+' so phone-first can't eat a card.
_REDACT_ORDER = [
    ("<EMAIL>", EMAIL_PAT),
    ("<SSN>", SSN_PAT),
    ("<PHONE>", PHONE_PAT),
    ("<CARD>", CARD_CANDIDATE_PAT),
    ("<IP>", IPV4_PAT),
]


def redact(col: Column) -> Column:
    """Replace every PII match with a typed placeholder token.

    Card redaction is conservative: every 13-19-digit candidate is
    masked, Luhn-valid or not (a missed mask costs more than an extra
    one). Detection counts (pii_counts) stay Luhn-exact.
    """
    out = col
    for token, pat in _REDACT_ORDER:
        out = F.regexp_replace(out, pat, token)
    return out


def redact_sql(expr: str) -> str:
    """DuckDB twin of redact (same order, 'g' flag for replace-all)."""
    out = expr
    for token, pat in _REDACT_ORDER:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{token}', 'g')"
    return out


def pii_scan(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII census + redacted text.

    One codegen'd projection — no shuffle, no UDF; at 100 TB this is a
    pure map stage that pipelines with the parquet scan.
    """
    counts = pii_counts(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[c.alias(k) for k, c in counts.items()],
        redact(F.col(text_col)).alias("redacted"),
    )
