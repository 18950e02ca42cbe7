"""Pure-Python executable oracle of the reference's canonicalization.

Exact ports (same observable behavior) of:
  - StringTransformer.transform / normalize / trimQuotes
    (reference: utils/StringTransformer.java:11-45)
  - phone rule (reference: services/RecordValidationUtilService.java:24-31)
  - email rule (reference: services/RecordValidationUtilService.java:17-23,
    commons-validator EmailValidator.getInstance(true, true)) — re-implemented
    from the documented grammar; see ``email_is_valid`` for noted deltas.
  - the query mini-language parser
    (reference: repositories/SearchRepository.java:302-341)

These run row-at-a-time in plain Python and exist ONLY as the comparison
oracle for unit/property tests — the engine itself uses vectorized Spark
column expressions (functions/canonicalize.py) that must agree with these.

Java semantics notes baked in:
  - ``String.trim()`` strips chars <= U+0020 from both ends.
  - ``StringTokenizer`` default delimiters are " \\t\\n\\r\\f".
  - ``\\d`` in Java regex is ASCII [0-9] only.
"""

from __future__ import annotations

import re

JAVA_TRIM_CHARS = "".join(chr(c) for c in range(0x21))  # <= U+0020
_TOKEN_DELIMS = " \t\n\r\f"
_QUOTES = "'\""


def java_trim(s: str) -> str:
    return s.strip(JAVA_TRIM_CHARS)


def trim_quotes(s: str) -> str:
    """Port of StringTransformer.trimQuotes (StringTransformer.java:24-33).

    Loop-strip leading then trailing quote chars, re-java-trimming after each
    strip. Net effect: strip both ends of the class [\\x00-\\x20'\"].
    """
    res = java_trim(s)
    while res.startswith(("'", '"')):
        res = java_trim(res[1:])
    while res.endswith(("'", '"')):
        res = java_trim(res[:-1])
    return res


def _java_is_whitespace(c: str) -> bool:
    """Character.isWhitespace: unicode space separators except the
    non-breaking ones (\\u00a0 \\u2007 \\u202f), plus \\t \\n \\x0B \\f \\r \\x1C-\\x1F."""
    if c in "\t\n\x0b\f\r\x1c\x1d\x1e\x1f":
        return True
    if c in "\u00a0\u2007\u202f":
        return False
    import unicodedata

    return unicodedata.category(c) in ("Zs", "Zl", "Zp")


def _java_is_blank(s: str) -> bool:
    return all(_java_is_whitespace(c) for c in s)


def normalize(s: str) -> str:
    """Port of StringTransformer.normalize (StringTransformer.java:35-45)."""
    out = []
    for token in re.split(f"[{re.escape(_TOKEN_DELIMS)}]+", s):
        if not token:
            continue
        t = trim_quotes(java_trim(token))
        if t and not _java_is_blank(t):
            out.append(t)
    return " ".join(out)


def transform(src: str | None, transformations: list[str]) -> str:
    """Port of StringTransformer.transform (StringTransformer.java:11-22)."""
    result = "" if src is None else src
    for t in transformations:
        t = t.upper()
        if t == "TLC":
            result = result.lower()
        elif t == "TUC":
            result = result.upper()
        elif t == "TRIM":
            result = java_trim(result)
        elif t == "NRM":
            result = normalize(result)
        else:
            raise ValueError(f"unknown transformation: {t}")
    return result


def phone_rule(result: str) -> str:
    """Port of the phone branch (RecordValidationUtilService.java:24-31)."""
    only = re.sub(r"[^0-9.]", "", result).replace(".", " ").replace(" ", "")
    return "" if len(only) < 5 else only


# EmailValidator.getInstance(true, true): allowLocal (single-label domains
# like "localhost") and allowTld. Structural re-implementation of the
# commons-validator 1.7 grammar (EmailValidator.java USER_REGEX/EMAIL_REGEX,
# DomainValidator.java DOMAIN_NAME_REGEX, InetAddressValidator IPv4):
#   - split at the LAST '@' (greedy ^(.+)@(\S+)$); reject trailing-dot email
#   - local part: WORD(.WORD)* where WORD = 1+ of (backslash-escape | any
#     char not whitespace/control/()<>@,;:\".[] | apostrophe) OR a quoted
#     string "[^"]*"; length <= 64 (MAX_USERNAME_LEN)
#   - domain: [IPv4-literal] (octets 0-255, no leading zeros), OR symbolic
#     <= 253 chars: (label.)+toplabel with alpha-leading toplabel, or a
#     single alnum label (allowLocal hostname)
# Remaining deltas (documented, not load-bearing for the blocking key):
# the IANA TLD-list membership check is opt-in (check_tld=True, frozen
# snapshot in functions/tld.py — r4); no IDN punycoding (non-ASCII
# domains rejected here). Bracketed IP literals cover IPv4 AND (r4)
# structural IPv6 — commons' EmailValidator strips the brackets and runs
# InetAddressValidator.isValid, which accepts bare "[2001:db8::1]" (no
# RFC-5321 "IPv6:" tag); the IPv6 grammar below covers full, ::-
# compressed, and IPv4-embedded forms with alternation-only constructs
# that Java regex, RE2, and Python re parse identically.
# Whitespace/control classes are pinned to explicit ASCII ranges so the
# Spark (Java regex), DuckDB (RE2), and Python twins agree byte-for-byte.
# Raw pattern strings are shared verbatim with the Spark (Java regex) and
# DuckDB (RE2) twins — only constructs all three engines parse identically.
_EMAIL_WORD = r'(?:(?:\\.|[^\x00-\x1F\x7F ()<>@,;:\\".\[\]])+|"[^"]*")'
EMAIL_USER_PATTERN = rf"^{_EMAIL_WORD}(?:\.{_EMAIL_WORD})*$"
_EMAIL_LABEL = r"[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
_EMAIL_TOP_LABEL = r"[A-Za-z](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
EMAIL_DOMAIN_PATTERN = rf"^(?:{_EMAIL_LABEL}\.)+{_EMAIL_TOP_LABEL}$|^{_EMAIL_LABEL}$"
_IPV4_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_IPV4 = rf"{_IPV4_OCTET}(?:\.{_IPV4_OCTET}){{3}}"
_H16 = r"[0-9A-Fa-f]{1,4}"
_IPV6 = (
    rf"(?:(?:{_H16}:){{7}}{_H16}"          # full 8-group form
    rf"|(?:{_H16}:){{1,7}}:"               # trailing ::
    rf"|(?:{_H16}:){{1,6}}:{_H16}"         # h::h
    rf"|(?:{_H16}:){{1,5}}(?::{_H16}){{1,2}}"
    rf"|(?:{_H16}:){{1,4}}(?::{_H16}){{1,3}}"
    rf"|(?:{_H16}:){{1,3}}(?::{_H16}){{1,4}}"
    rf"|(?:{_H16}:){{1,2}}(?::{_H16}){{1,5}}"
    rf"|{_H16}:(?::{_H16}){{1,6}}"
    rf"|:(?:(?::{_H16}){{1,7}}|:)"         # leading :: (incl. bare ::)
    rf"|(?:{_H16}:){{6}}{_IPV4}"           # full form, IPv4 tail
    # Compressed IPv4-tail pyramid (ADVICE r4 #4): A::B:IPv4 with A
    # leading and B intermediate h16 groups needs A+B <= 5 (IPv4 counts
    # as 2 of the 8 groups, and '::' must stand for >= 1 zero group —
    # the constraint commons InetAddressValidator enforces by octet
    # count). Enumerated per A so no alternative overmatches; the old
    # single '(H16:){1,4}:IPv4' line missed A=5 ('1:2:3:4:5::1.2.3.4'),
    # every B>=1 form ('1::3:1.2.3.4'), and leading-:: forms with
    # intermediate groups ('::2:3:4:1.2.3.4').
    rf"|(?:{_H16}:){{5}}:{_IPV4}"          # A=5, B=0
    rf"|(?:{_H16}:){{4}}(?::{_H16}){{0,1}}:{_IPV4}"  # A=4, B<=1
    rf"|(?:{_H16}:){{3}}(?::{_H16}){{0,2}}:{_IPV4}"  # A=3, B<=2
    rf"|(?:{_H16}:){{2}}(?::{_H16}){{0,3}}:{_IPV4}"  # A=2, B<=3
    rf"|{_H16}:(?::{_H16}){{0,4}}:{_IPV4}"           # A=1, B<=4
    rf"|:(?::{_H16}){{0,5}}:{_IPV4}"                 # A=0 (leading ::), B<=5
    rf"|::(?:[Ff]{{4}}(?::0{{1,4}})?:)?{_IPV4})"  # ::ffff:a.b.c.d mapped
)
EMAIL_IP_DOMAIN_PATTERN = rf"^\[(?:{_IPV4}|{_IPV6})\]$"
# ^(.+)@(\S+)$ with Java-\s as explicit ASCII class; greedy (.+) -> last @.
EMAIL_SPLIT_PATTERN = r"^(.+)@([^ \t\n\x0B\f\r]+)$"
EMAIL_USER_RE = re.compile(EMAIL_USER_PATTERN)
EMAIL_DOMAIN_RE = re.compile(EMAIL_DOMAIN_PATTERN)
EMAIL_IP_DOMAIN_RE = re.compile(EMAIL_IP_DOMAIN_PATTERN)
EMAIL_SPLIT_RE = re.compile(EMAIL_SPLIT_PATTERN)


def _idn_ascii(domain: str) -> str:
    """commons DomainValidator.unicodeToASCII parity (r5, VERDICT r4 #5):
    java.net.IDN.toASCII is IDNA2003 (RFC 3490), the same algorithm as
    the stdlib ``idna`` codec (nameprep + per-label punycode). commons
    returns the INPUT unchanged when conversion fails — the ASCII
    pattern then rejects it — so we mirror that on UnicodeError. ASCII
    domains pass through untouched (no nameprep case-fold: the ASCII
    pattern is already case-insensitive, matching commons' behavior of
    only converting when non-ASCII is present)."""
    if all(ord(c) < 128 for c in domain):
        return domain
    try:
        return domain.encode("idna").decode("ascii")
    except UnicodeError:
        return domain


def email_is_valid(s: str, check_tld: bool = False) -> bool:
    # Line-terminator guard (shared across all three twins): Python/Java
    # regex let $ match BEFORE a final \n while RE2 does not, and Java
    # matches() requires the full region anyway — commons-validator rejects
    # "user@host\n". Rejecting \r\n explicitly keeps the three engines
    # byte-for-byte identical on terminator-bearing inputs.
    if not s or s.endswith(".") or "\n" in s or "\r" in s:
        return False
    m = EMAIL_SPLIT_RE.match(s)
    if m is None:
        return False
    user, domain = m.group(1), m.group(2)
    if len(user) > 64 or EMAIL_USER_RE.match(user) is None:
        return False
    if domain.startswith("["):
        return EMAIL_IP_DOMAIN_RE.match(domain) is not None
    # IDN punycoding BEFORE the structural/TLD checks, as commons'
    # DomainValidator.isValid does (r5 — the last documented email delta)
    domain = _idn_ascii(domain)
    if len(domain) > 253 or EMAIL_DOMAIN_RE.match(domain) is None:
        return False
    if check_tld and "." in domain:
        # DomainValidator final-label check against the frozen public IANA
        # snapshot (functions/tld.py); single-label hosts pass (allowLocal).
        from .tld import is_known_tld

        return is_known_tld(domain.rsplit(".", 1)[-1])
    return True


def email_rule(result: str) -> str:
    """Port of the mail branch (RecordValidationUtilService.java:17-23)."""
    return result if email_is_valid(result) else ""


def extract_and_validate(value: str | None, source_col_name: str, transformations: list[str]) -> str:
    """Port of RecordValidationUtilService.extractAndValidate (:16-32)."""
    name_lc = source_col_name.lower()
    result = transform(value, transformations)
    if "mail" in name_lc:
        return email_rule(result)
    if "phone" in name_lc:
        return phone_rule(result)
    return result


def map_and_concat(values: list[str | None], source_names: list[str], transformations: list[str]) -> str:
    """Port of the mapping projection P1 (UploadsService.java:148-163).

    Validate each source column value, join with a single space, then apply
    the transformation chain AGAIN to the concatenation.
    """
    parts = [extract_and_validate(v, n, transformations) for v, n in zip(values, source_names)]
    return transform(" ".join(parts), transformations)


def parse_search_query(query: str) -> tuple[str, str, str]:
    """Port of SearchRepository.SearchQuery (SearchRepository.java:302-341).

    Returns (column, query, type) with type in
    {STARTS_WITH, ENDS_WITH, CONTAINS, MATCHES}.
    Java ``String.split(":")`` keeps only parts [0] and [1] — values with a
    second colon are silently truncated (reproduced on purpose).
    """
    split = query.split(":")
    if len(split) < 2:
        raise ValueError("Search query must be in form: <column:query>")
    node = transform(split[0], ["TLC", "TRIM"])
    if not node:
        raise ValueError("Column name must not be empty.")
    qp = transform(split[1], ["TLC", "TRIM"])
    if not qp:
        raise ValueError("Query must not be empty.")
    if qp.startswith(">"):
        if qp.endswith("<"):
            return node, qp[1:-1], "CONTAINS"
        return node, qp[1:], "ENDS_WITH"
    if qp.endswith("<"):
        return node, qp[:-1], "STARTS_WITH"
    return node, qp, "MATCHES"
