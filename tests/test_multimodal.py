"""Multimodal plumbing: schema, deterministic fake featurizer, frame plan,
and the explicit NotImplementedError seam for real codecs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import multimodal as M
from sneaky_data_matcher_spark.sources.spans import derive_spans

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return M.synth_media_table(derive_spans(docs)).localCheckpoint(eager=True)


def test_media_schema_and_payloads(media):
    assert media.schema.simpleString() == (
        "struct<media_ref:string,kind:string,payload:binary,"
        "meta:struct<width:int,height:int,sample_rate:int,duration_ms:int>>"
    )
    r = media.first()
    assert isinstance(r["payload"], (bytes, bytearray)) and len(r["payload"]) == 16
    assert r["meta"]["width"] >= 16


def test_features_deterministic(media):
    f1 = {r["media_ref"]: r["feature"] for r in M.extract_features(media).collect()}
    f2 = {r["media_ref"]: r["feature"] for r in M.extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == 16 for v in f1.values())


def test_strict_mode_raises(media):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        M.extract_features(media, strict=True).count()
    assert "NotImplementedError" in str(ei.value) or "real media decode" in str(ei.value)


def test_frame_sample_plan(media):
    plan = M.frame_sample_plan(media, every_ms=1000)
    vids = media.where(F.col("kind") == "video")
    assert plan.count() >= vids.count()  # at least 1 frame per video
    bad = plan.where(F.col("timestamp_ms") != F.col("frame_idx") * 1000).count()
    assert bad == 0
