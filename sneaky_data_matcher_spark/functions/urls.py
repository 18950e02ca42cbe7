"""URL canonicalization for web-corpus deduplication.

A web-scale training-data pipeline dedups documents by canonical URL
before any content hashing: the same page is crawled as
``HTTP://WWW.Site.COM:80/a//b/?utm_source=x&b=2&a=1#frag`` and
``https://site.com/a/b?a=1&b=2``. The reference has no URL handling (its
ingest is CSV rows — ``UploadController.java``); this module adds the
standard normalization, entirely as NATIVE column expressions (regex +
array ops — no UDF), with a DuckDB twin built from the same rule list so
the oracle certifies every rule:

  1. strip fragment;
  2. lowercase scheme and host, strip a leading ``www.``;
  3. drop default ports (http:80, https:443), keep explicit others;
  4. collapse duplicate slashes in the path, strip the trailing slash
     (root stays ``/``; empty path becomes ``/``);
  5. drop tracking parameters (``utm_*``, fbclid, gclid, msclkid, ref,
     mc_cid, mc_eid) and empty pairs, then sort the remaining query
     pairs byte-lexicographically and rejoin.

Scale notes (100 TB): pure per-row projections inside whole-stage
codegen — no shuffle, no Python; the downstream dedup is an ordinary
hash groupBy on the canonical string.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_EXACT = ("fbclid", "gclid", "msclkid", "ref", "mc_cid", "mc_eid")
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s)-style URL (native exprs)."""
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")

    host = F.regexp_replace(
        F.lower(F.regexp_extract(authority, r"^([^:]*)", 1)), r"^www\.", ""
    )
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))

    path = F.regexp_replace(F.regexp_extract(pathq, r"^([^?]*)", 1), r"//+", "/")
    path = F.regexp_replace(path, r"(.)/$", "$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)

    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~F.split(p, "=")[0].startswith("utm_")
            & ~F.split(p, "=")[0].isin(*TRACKING_EXACT),
        )
    )
    query_part = F.when(
        F.size(kept) == 0, F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(kept, "&")))

    return F.concat(scheme, F.lit("://"), host, port_part, path, query_part)


def canonical_url_sql(col: str) -> str:
    """DuckDB twin of :func:`canonical_url` — identical rule list."""
    u = f"regexp_replace(trim({col}), '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    rest = f"regexp_replace({u}, '{_SCHEME_RE}', '')"
    authority = f"regexp_extract({rest}, '^([^/?]*)', 1)"
    pathq = f"regexp_replace({rest}, '^[^/?]*', '')"
    host = (
        f"regexp_replace(lower(regexp_extract({authority}, '^([^:]*)', 1)), "
        "'^www\\.', '')"
    )
    port = f"regexp_extract({authority}, ':([0-9]+)$', 1)"
    default_port = (
        f"(({scheme} = 'http' AND {port} = '80') OR "
        f"({scheme} = 'https' AND {port} = '443'))"
    )
    port_part = (
        f"CASE WHEN {port} = '' OR {default_port} THEN '' "
        f"ELSE ':' || {port} END"
    )
    path0 = (
        f"regexp_replace(regexp_replace(regexp_extract({pathq}, '^([^?]*)', 1), "
        "'//+', '/', 'g'), '(.)/$', '\\1')"
    )
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    query = f"regexp_extract({pathq}, '\\?(.*)$', 1)"
    exact = ", ".join(f"'{t}'" for t in TRACKING_EXACT)
    kept = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT starts_with(string_split(p, '=')[1], 'utm_') "
        f"AND string_split(p, '=')[1] NOT IN ({exact})))"
    )
    query_part = (
        f"CASE WHEN len({kept}) = 0 THEN '' "
        f"ELSE '?' || array_to_string({kept}, '&') END"
    )
    return f"{scheme} || '://' || {host} || {port_part} || {path} || {query_part}"
