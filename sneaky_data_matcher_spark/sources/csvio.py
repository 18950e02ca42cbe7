"""CSV source with format autodetect + CSV export sink (SURVEY.md §2 S1, S6).

The reference ingests CSV uploads by trying 24 Apache-Commons CSVFormat
variants (default/excel/tsv/mysql/... x with/without header) and keeping the
first that parses (utils/csv/CsvUtil.java:118-159), and exports search
results as CSV with a global sorted header, JSON-encoding multi-valued
cells (services/SearchService.java:233-259,168-186).

Spark-first re-expression: `spark.read.csv` already handles quoting/escape
dialects; autodetect reduces to choosing (sep, header) from a small sample
read on the driver — a few KB of the first file, never a full pass. The
export sink is `df.write.csv` over the wide frame from
operators/search.export_wide (arrays JSON-encoded there).

Scale notes: a 100 TB CSV ingest is split-parallel out of the box
(newline-splittable unless multiLine); autodetect cost is O(sample), not
O(data). Export writes one file per partition — callers coalesce only for
small parity exports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Candidate dialects, mirroring the reference's variant sweep (CsvUtil.java:
# 19-116): comma/tab/semicolon/pipe separators, each with and without header,
# each with RFC-4180 doubled-quote escaping (DEFAULT/EXCEL/RFC4180) or
# mysql-style backslash escaping (MYSQL/INFORMIX_UNLOAD/POSTGRESQL_*).
_SEPS = [",", "\t", ";", "|"]
_ESCAPES = ['"', "\\"]  # RFC doubled-quote first — the reference's try order


def sniff_csv_format(spark: SparkSession, path: str, sample_lines: int = 20) -> dict:
    """Pick (sep, header, escape) from a driver-side sample of the first
    lines.

    (sep, escape): the candidate pair parsing every sampled line into the
    same column count > 1 (most columns wins ties; on a column-count tie
    RFC-4180 doubled-quote beats backslash-escape, matching the reference's
    variant order — CsvUtil.java:118-159 keeps the FIRST format that
    parses). A backslash dialect additionally requires backslash evidence
    in the sample (a bare `\\"` or `\\\\`), so escape-free files never
    misdetect. header: first row is all-non-numeric while any later row
    has a numeric cell — the common-case heuristic; callers can override.
    """
    import csv as _csv

    sample = [r.value for r in spark.read.text(path).limit(sample_lines).collect()]
    if not sample:
        return {"sep": ",", "header": False, "escape": '"'}
    has_backslash = any("\\" in line for line in sample)
    best_sep, best_cols, best_rows, best_esc = ",", 1, [sample], '"'
    for sep in _SEPS:
        for esc in _ESCAPES:
            if esc == "\\" and not has_backslash:
                continue
            # quote-aware parse of the sample (the reference tries full CSV
            # parsers per variant, not naive splits — CsvUtil.java:140-150)
            if esc == "\\":
                rows = list(
                    _csv.reader(
                        sample, delimiter=sep, doublequote=False, escapechar="\\"
                    )
                )
            else:
                rows = list(_csv.reader(sample, delimiter=sep))
            counts = {len(r) for r in rows if r}
            if len(counts) == 1:
                (n,) = counts
                if n > best_cols:
                    best_sep, best_cols, best_rows, best_esc = sep, n, rows, esc
    def _numericish(cell: str) -> bool:
        try:
            float(cell.strip())
            return True
        except ValueError:
            return False

    first = best_rows[0]
    rest = best_rows[1:]
    # header if the first row looks like labels: all non-numeric, and either
    # later rows carry numbers (type contrast) or the first row's cells are
    # distinct identifier-like names ([A-Za-z_][\w -]*; an email or URL in
    # row 1 means data, not a header — misclassifying silently drops the
    # first record). Genuinely ambiguous files: callers override.
    import re as _re

    ident = _re.compile(r"^[A-Za-z_][A-Za-z0-9_ -]*$")
    header = (
        best_cols > 1
        and not any(_numericish(c) for c in first)
        and (
            any(_numericish(c) for row in rest for c in row)
            or (
                len(set(first)) == len(first)
                and all(ident.match(c.strip()) for c in first)
            )
        )
    )
    return {"sep": best_sep, "header": header, "escape": best_esc}


def read_csv_auto(spark: SparkSession, path: str, **overrides) -> DataFrame:
    """S1: CSV scan with dialect autodetect; explicit options override the
    sniff. Columns without a header get Spark's positional names (_c0...) —
    the reference's name-or-index access (CsvUtil.java:98-110) maps to
    `df.columns[i]` resolution at plan time (S3)."""
    fmt = sniff_csv_format(spark, path)
    fmt.update(overrides)
    return (
        spark.read.option("sep", fmt["sep"])
        .option("header", str(bool(fmt["header"])).lower())
        .option("quote", fmt.get("quote", '"'))
        .option("escape", fmt.get("escape", '"'))
        .csv(path)
    )


def export_csv(wide: DataFrame, path: str, single_file: bool = True) -> None:
    """S6: CSV export sink. `wide` is the export frame (global sorted header,
    array cells already JSON-encoded — operators/search.export_wide).
    single_file=True mirrors the reference's one-blob-to-MinIO export for
    parity tests; large exports keep one file per partition."""
    out = wide.coalesce(1) if single_file else wide
    # escape=quote -> RFC-4180 doubled quotes (Spark defaults to backslash)
    (
        out.write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
