"""Text-analysis functions: multilingual lang_id (16 stopword languages +
CJK script detection) classified on real-language samples, with the DuckDB
oracle twin agreeing exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.functions import textstats as TS

# One stopword-heavy sample per language; CJK via script, 'und' fallback.
LANG_SAMPLES = [
    ("cs", "se na je že do to jako byl jsem ale"),
    ("da", "og det at en den til er som på ikke"),
    ("de", "der die und das ist nicht ein ich zu mit"),
    ("en", "the quick and of to a in is it you that"),
    ("es", "el la de que y los se un por con"),
    ("fi", "ja on ei se että hän oli mutta niin kuin"),
    ("fr", "le la et les des est un une dans que"),
    ("id", "yang dan di itu dengan untuk ini dari ke pada"),
    ("it", "il di che e per un una sono non si"),
    ("nl", "de het een en van ik dat op niet zijn"),
    ("pl", "nie się w na i z co jest to że"),
    ("pt", "o de que e do da em um para com"),
    ("ro", "și de la cu un o este pentru care nu"),
    ("ru", "и в не на я что он с как это"),
    ("sv", "och det att i en jag är som på med"),
    ("tr", "bir ve bu için de ne gibi ama çok daha"),
    ("zh", "机器学习模型在大规模数据集上训练效果良好"),
    ("ja", "これは日本語のテキストです"),
    ("ko", "한국어 텍스트를 처리하는 파이프라인입니다"),
    ("und", "xyzzy qwerty 12345"),
    # sparse CJK inside English stays on the stopword vote (below the 30%
    # script threshold)
    ("en", "the and of to a in is it that 好"),
]


def test_lang_id_classifies_samples(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(LANG_SAMPLES)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select("doc_id", TS.lang_id(F.col("text")).alias("lang")).collect()
    }
    want = {i: lang for i, (lang, _) in enumerate(LANG_SAMPLES)}
    assert got == want


def test_lang_id_duckdb_twin_agrees(spark):
    """The driver-query oracle SQL (entry_queries) must classify the same
    samples identically — including non-ASCII stopwords and CJK ranges
    through RE2."""
    import duckdb

    from sneaky_data_matcher_spark.entry_queries import ORACLE_SQL

    df = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(LANG_SAMPLES)], "doc_id long, text string"
    )
    spark_got = {
        r["doc_id"]: r["lang_pred"]
        for r in df.select(
            "doc_id", TS.lang_id(F.col("text")).alias("lang_pred")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT unnest(?) AS doc_id, unnest(?) AS text",
        [list(range(len(LANG_SAMPLES))), [t for _, t in LANG_SAMPLES]],
    )
    duck_got = dict(con.execute(ORACLE_SQL["lang_id"]).fetchall())
    assert spark_got == duck_got


def test_quality_v2_penalizes_repetition(spark):
    """Crafted boilerplate: duplicated lines and a dominating bigram must
    drag quality_score_v2 below the clean doc's, while v1 (which sees
    neither signal) stays close."""
    clean = "\n".join(
        f"the research team published a detailed study of topic {i} today"
        for i in range(8)
    )
    dup_lines = "\n".join(["click here to subscribe to our newsletter now"] * 8)
    loop_bigram = " ".join(["click here"] * 40)
    df = spark.createDataFrame(
        [(1, clean), (2, dup_lines), (3, loop_bigram)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (float(r["v1"]), float(r["v2"]))
        for r in df.select(
            "doc_id",
            TS.quality_score(F.col("text")).alias("v1"),
            TS.quality_score_v2(F.col("text")).alias("v2"),
        ).collect()
    }
    assert out[1][1] > out[2][1] + 0.15  # dup lines punished
    assert out[1][1] > out[3][1] + 0.15  # bigram loop punished
    # and the penalty comes from the NEW terms, not a v1 regression
    assert abs(out[1][0] - out[2][0]) < 0.35
    # components bounded
    for v1, v2 in out.values():
        assert 0.0 <= v1 <= 1.0 and 0.0 <= v2 <= 1.0


def test_quality_v2_duckdb_twin_agrees(spark):
    import duckdb

    from sneaky_data_matcher_spark.entry_queries import ORACLE_SQL

    texts = [
        "the research team published a detailed study of results today",
        "click here click here click here click here",
        "one two three four five six seven eight nine ten",
        "",
        "word",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    lined = F.translate(F.col("text"), " ", "\n")
    spark_got = {
        r["doc_id"]: float(r["quality"])
        for r in df.select(
            "doc_id", F.round(TS.quality_score_v2(lined), 6).alias("quality")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT unnest(?) AS doc_id, unnest(?) AS text",
        [list(range(len(texts))), texts],
    )
    duck_got = {
        k: float(v) for k, v in con.execute(ORACLE_SQL["quality_score_v2"]).fetchall()
    }
    assert spark_got == duck_got


def test_lang_id_empty_and_null(spark):
    df = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    got = [
        r["lang"]
        for r in df.orderBy("doc_id")
        .select(TS.lang_id(F.col("text")).alias("lang"))
        .collect()
    ]
    assert got[0] == "und"  # empty text: no CJK, no stopwords
