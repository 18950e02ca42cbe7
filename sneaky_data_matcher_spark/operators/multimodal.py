"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with typed metadata, processed
by Arrow-batched `mapInPandas` operators. The decode step itself is STUBBED
(this container ships no image/audio codecs): `decode_media` uses a
deterministic fake decoder keyed off the payload hash, and raises
NotImplementedError when `strict=True`. Everything Spark-side — schema,
partition sizing, UDF signatures, batch shapes — is real and tested, so
swapping in PIL/ffmpeg later changes only `_fake_decode`.

Schema convention:

  media(media_ref string, kind string, payload binary,
        meta struct<width:int, height:int, sample_rate:int, duration_ms:int>)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_ref string, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FEATURES_SCHEMA = (
    "media_ref string, kind string, feature array<float>, feat_dim int"
)

_FEAT_DIM = 16


def synth_media_table(spans_df: DataFrame) -> DataFrame:
    """Deterministic media table for the media_refs present in a spans
    corpus: payload = sha2-derived pseudo-bytes, metadata hashed from the
    ref. Stands in for the object store the refs point at."""
    refs = (
        spans_df.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") != "text")
        .select(
            F.col("s.media_ref").alias("media_ref"), F.col("s.kind").alias("kind")
        )
        .distinct()
    )
    h = F.sha2(F.col("media_ref"), 256)
    # metadata from sha2 hex digits of the ref (not xxhash64): portable to
    # the DuckDB oracle, so frame plans get value-hash checks
    _hx = lambda pos, n: F.conv(F.substring(h, pos, n), 16, 10).cast("int")
    return refs.select(
        "media_ref",
        "kind",
        F.to_binary(F.substring(h, 1, 32), F.lit("hex")).alias("payload"),
        F.struct(
            (_hx(33, 3) % 1024 + 16).alias("width"),
            (_hx(36, 3) % 1024 + 16).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (_hx(39, 5) % 60000).alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, kind: str) -> list[float]:
    """Deterministic stand-in for a real decoder+featurizer: fold the
    payload bytes into a fixed-dim unit-ish vector."""
    if payload is None:
        return [0.0] * _FEAT_DIM
    acc = [0] * _FEAT_DIM
    for i, byte in enumerate(payload):
        acc[i % _FEAT_DIM] = (acc[i % _FEAT_DIM] * 31 + byte) % 100003
    return [round(a / 100003.0, 6) for a in acc]


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas featurizer: binary payload -> fixed-dim float vector.

    strict=True raises NotImplementedError (no real codecs in this image) —
    the marked seam where PIL/torchaudio/ffmpeg plug in.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real media decode requires image/audio codecs not present "
                "in this environment; plug a decoder into _fake_decode"
            )
        for pdf in batches:
            feats = [
                _fake_decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "feat_dim": _FEAT_DIM,
                }
            )

    return media.mapInPandas(op, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    (real decoder would attach pixels). Native explode over a sequence —
    the expensive part (decode) stays in extract_features."""
    vids = media.where(F.col("kind") == "video")
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return vids.select(
        "media_ref",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "t0"),
    ).select(
        "media_ref",
        "frame_idx",
        (F.col("frame_idx") * every_ms).alias("timestamp_ms"),
    )
