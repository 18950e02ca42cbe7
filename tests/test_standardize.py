from __future__ import annotations

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import standardize as S


def _df(spark):
    rows = (
        [("Smith, John A.",)] * 3
        + [("john a smith",)] * 2
        + [("JOHN A SMITH.",)]
        + [("JOHN  A  SMÍTH",)]  # accent + double spaces, same cluster
        + [("Jane Doe",)] * 2
        + [("...",)]  # punctuation-only: empty fingerprint, self-maps
        + [("!!!",)]
    )
    return spark.createDataFrame(rows, "value string")


def test_fingerprint_collapses_variants(spark):
    df = _df(spark).select(S.fingerprint(F.col("value")).alias("fp"))
    fps = set(r["fp"] for r in df.collect())
    assert "a john smith" in fps  # sorted distinct tokens
    assert "doe jane" in fps
    assert "" in fps


def test_standardize_values_modal_election(spark):
    out = {r["value"]: r.asDict() for r in S.standardize_values(_df(spark), "value").collect()}
    # the 3-row surface form wins the smith cluster
    for v in ["Smith, John A.", "john a smith", "JOHN A SMITH.", "JOHN  A  SMÍTH"]:
        assert out[v]["canonical_value"] == "Smith, John A."
        assert out[v]["group_size"] == 4
    assert out["Jane Doe"]["canonical_value"] == "Jane Doe"
    # punctuation-only values never merge, even with each other
    assert out["..."]["canonical_value"] == "..."
    assert out["!!!"]["canonical_value"] == "!!!"
    assert out["..."]["group_size"] == 1


def test_apply_standardization_roundtrip(spark):
    df = _df(spark)
    mapping = S.standardize_values(df, "value")
    applied = S.apply_standardization(df, "value", mapping)
    vals = set(r["value"] for r in applied.collect())
    assert vals == {"Smith, John A.", "Jane Doe", "...", "!!!"}
    assert applied.count() == df.count()


def test_fingerprint_sql_parity(spark):
    import duckdb

    vals = [r["value"] for r in _df(spark).distinct().collect()]
    got_spark = {
        r["value"]: r["fp"]
        for r in _df(spark)
        .distinct()
        .select("value", S.fingerprint(F.col("value")).alias("fp"))
        .collect()
    }
    con = duckdb.connect()
    for v in vals:
        sql_fp = con.execute(
            f"SELECT {S.fingerprint_sql('?')}", [v]
        ).fetchone()[0]
        assert sql_fp == got_spark[v], v
