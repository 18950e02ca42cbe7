"""JSONL ingest: corrupt-line capture, escaping round-trip, no silent drops."""

from __future__ import annotations

from pyspark.sql import types as T

from sneaky_data_matcher_spark.sources import jsonio

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def test_corrupt_lines_captured_not_dropped(spark, tmp_path):
    lines = [
        '{"doc_id": 1, "text": "ok"}',
        "this is not json",
        '{"doc_id": 2, "text": "fine"}',
        '{"doc_id": 3, "text": "trunca',  # cut mid-string
        "{}",  # valid JSON, all fields null -> GOOD row
    ]
    p = tmp_path / "in.jsonl"
    p.write_text("\n".join(lines) + "\n")
    df = jsonio.read_jsonl(spark, str(p), SCHEMA)
    good, bad = jsonio.split_corrupt(df)
    assert good.count() + bad.count() == len(lines)  # nothing vanished
    assert sorted(r["doc_id"] for r in good.collect() if r["doc_id"]) == [1, 2]
    raws = {r["raw_line"] for r in bad.collect()}
    assert raws == {"this is not json", '{"doc_id": 3, "text": "trunca'}


def test_escaping_roundtrip(spark, tmp_path):
    texts = ['line\nbreak', 'quote " inside', "tab\tchar", "unicode é中"]
    src = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = str(tmp_path / "rt")
    src.write.mode("overwrite").json(out)
    back, bad = jsonio.split_corrupt(jsonio.read_jsonl(spark, out, SCHEMA))
    assert bad.count() == 0
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == {i: t for i, t in enumerate(texts)}
