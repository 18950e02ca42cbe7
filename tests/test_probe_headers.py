"""Image header probes: pure-Python byte-level cases (no Spark session)."""

from __future__ import annotations

import struct

from sneaky_data_matcher_spark.operators.multimodal import (
    _gif_header_bytes,
    _jpeg_header_bytes,
    _png_header_bytes,
    compressed_header_params,
    probe_image_header,
)


def test_png_gif_jpeg_roundtrip():
    for w, h in [(16, 16), (1039, 17), (65535, 1)]:
        assert probe_image_header(_png_header_bytes(w, h)) == ("png", w, h)
        if w <= 65535:
            assert probe_image_header(_gif_header_bytes(w, h)) == ("gif", w, h)
            assert probe_image_header(_jpeg_header_bytes(w, h)) == ("jpeg", w, h)


def test_jpeg_skips_leading_segments():
    # COM + APP1 segments before SOF, plus a standalone TEM marker
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    app1 = b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00"
    sof2 = (
        b"\xff\xc2" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 99, 321) + b"\x01\x01\x11\x00"
    )
    payload = b"\xff\xd8" + b"\xff\x01" + com + app1 + sof2
    assert probe_image_header(payload) == ("jpeg", 321, 99)


def test_jpeg_dht_is_not_sof():
    dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x01\x02"
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 7, 9) + b"\x01\x01\x11\x00"
    assert probe_image_header(b"\xff\xd8" + dht + sof) == ("jpeg", 9, 7)


def test_bmp_negative_height_topdown():
    hdr = b"BM" + b"\x00" * 16 + struct.pack("<ii", 40, -30)
    assert probe_image_header(hdr) == ("bmp", 40, 30)


def test_unrecognized_and_truncated():
    assert probe_image_header(None) is None
    assert probe_image_header(b"\x00" * 50) is None
    assert probe_image_header(b"\x89PNG\r\n\x1a\n\x00\x00") is None  # short PNG
    assert probe_image_header(b"\xff\xd8\xff\xfe\x00") is None  # cut JPEG
    assert probe_image_header(b"\xff\xd8" + b"\x00" * 20) is None  # broken chain


def test_params_deterministic():
    f1 = compressed_header_params("m:abc-0")
    assert f1 == compressed_header_params("m:abc-0")
    assert f1[0] in ("png", "gif", "jpeg") and f1[1] >= 16 and f1[2] >= 16
