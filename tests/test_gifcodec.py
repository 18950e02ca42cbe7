"""GIF LZW codec (operators/multimodal.py _gif_bytes/_decode_gif) —
lossless, so decoded features must equal the BMP decoder's on the same
generative pixels; the LZW layer is additionally exercised directly
(KwKwK, width growth to 12 bits, clear-on-full, sub-block reassembly).
"""

from __future__ import annotations

import pytest

from sneaky_data_matcher_spark.operators import multimodal as M


def test_gif_features_equal_bmp_features():
    """Container independence: GIF(LZW) and BMP decode to identical
    features for the same media_ref (same generative pixel formula) —
    the property that lets the existing SQL pixel oracle certify GIF."""
    for i in range(25):
        ref = f"g:{i:04d}-x"
        gif_feats = M._decode_one(M._gif_bytes(ref), "image", strict=True)
        bmp_feats = M._decode_one(M._bmp_bytes(ref), "image", strict=True)
        assert gif_feats == bmp_feats, ref


def test_lzw_kwkwk_case():
    """A run of identical symbols forces code == len(table) immediately
    (the KwKwK special case) — must round-trip."""
    for run in (2, 3, 10, 100):
        idx = [0] * run
        enc = M._gif_lzw_encode(idx, 2)
        assert M._gif_lzw_decode(enc, 2, run) == idx


def test_lzw_width_growth_and_reset():
    """A long non-repeating-ish stream drives the code width up (past 9
    bits needs > 256 table entries) and, at > 4095 entries, the encoder
    emits a mid-stream CLEAR — decoder must follow both."""
    # Lehmer-ish deterministic pseudo-random indices over a 256-symbol
    # alphabet; 60k symbols ≈ tens of thousands of dict entries → resets
    idx = [(i * 48271 + 11) % 256 for i in range(60000)]
    enc = M._gif_lzw_encode(idx, 8)
    assert M._gif_lzw_decode(enc, 8, len(idx)) == idx


def test_lzw_small_alphabet_roundtrip():
    idx = [i % 3 for i in range(997)]
    enc = M._gif_lzw_encode(idx, 2)
    assert M._gif_lzw_decode(enc, 2, len(idx)) == idx


def test_gif_subblock_chunking():
    """Payload LZW data longer than 255 bytes must split into multiple
    sub-blocks and reassemble — use the largest synthetic image."""
    # find a ref with a big image (w, h near 15) so the LZW stream is long
    for i in range(200):
        ref = f"big:{i}"
        _, w, h = M.bmp_params(ref)
        if w * h > 180:
            payload = M._gif_bytes(ref)
            feats = M._decode_one(payload, "image", strict=True)
            assert feats[0] == pytest.approx(w / 1024.0, abs=1e-6)
            return
    pytest.fail("no large synthetic image found")


def test_gif_truncation_raises():
    payload = M._gif_bytes("t:1")
    with pytest.raises((ValueError, IndexError)):
        M._decode_gif(payload[: len(payload) // 2])


def test_gif_header_probe_fixture_is_not_decodable():
    """The header-probe pseudo-GIF (header bytes only, no image data)
    must raise under strict decode — it has no image descriptor."""
    hdr = M._gif_header_bytes(10, 10)
    with pytest.raises((ValueError, IndexError)):
        M._decode_gif(hdr)


def test_gif_property_roundtrip_random_images():
    """GIF is lossless: random small RGB images (palette ≤ 256 by
    construction of the color pool) must round-trip EXACTLY through
    encode→decode, checked against the BMP decoder on identical bytes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import struct as _struct

    pool = [(i * 37 % 256, i * 91 % 256, i * 53 % 256) for i in range(200)]

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(min_value=1, max_value=20),
        st.integers(min_value=1, max_value=20),
        st.lists(st.integers(min_value=0, max_value=199), min_size=1, max_size=400),
    )
    def prop(w, h, colors):
        pixels = [pool[colors[p % len(colors)]] for p in range(w * h)]
        # hand-assemble a GIF from these pixels via the module's encoder
        # internals: palette + LZW, then compare decode against the truth
        palette, lookup, indices = [], {}, []
        for px in pixels:
            if px not in lookup:
                lookup[px] = len(palette)
                palette.append(px)
            indices.append(lookup[px])
        size_bits = max(1, (len(palette) - 1).bit_length())
        mcs = max(2, size_bits)
        out = bytearray(b"GIF89a") + _struct.pack("<HH", w, h)
        out += bytes([0x80 | (7 << 4) | (size_bits - 1), 0, 0])
        for i in range(1 << size_bits):
            out += bytes(palette[i]) if i < len(palette) else b"\x00\x00\x00"
        out += b"\x2c" + _struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(mcs)
        lzw = M._gif_lzw_encode(indices, mcs)
        for i in range(0, len(lzw), 255):
            out.append(len(lzw[i:i + 255]))
            out += lzw[i:i + 255]
        out += b"\x00\x3b"
        feats = M._decode_gif(bytes(out))
        # independent truth: compute features directly from the pixels
        rs = sum(p[0] for p in pixels)
        gs = sum(p[1] for p in pixels)
        lums = [(p[0] * 299 + p[1] * 587 + p[2] * 114) // 1000 for p in pixels]
        npx = w * h
        assert feats[0] == M._q6(w / 1024.0)
        assert feats[2] == M._q6(rs / npx / 255.0)
        assert feats[3] == M._q6(gs / npx / 255.0)
        assert feats[6] == M._q6(max(lums) / 255.0)

    prop()


def test_ahash_container_invariance():
    """The perceptual hash is identical across all LOSSLESS containers of
    the same pixels, and within a small Hamming radius for the lossy
    JPEG copy (solid-color fixture: exactly 0 or trivially small)."""
    for i in range(8):
        ref = f"xh:{i}"
        w, h, lums_bmp = M._image_rgb_lums(M._bmp_bytes(ref))
        _, _, lums_png = M._image_rgb_lums(M._png_bytes(ref))
        _, _, lums_gif = M._image_rgb_lums(M._gif_bytes(ref))
        assert lums_bmp == lums_png == lums_gif
        a = M.ahash_bits(lums_bmp, w, h)
        assert a == M.ahash_bits(lums_gif, w, h) == M.ahash_bits(lums_png, w, h)
        # the JPEG fixture is a DIFFERENT image (solid color), so only
        # check that its pixel view decodes consistently with itself
        wj, hj, lums_j = M._image_rgb_lums(M._jpeg_bytes(ref))
        assert len(lums_j) == wj * hj
