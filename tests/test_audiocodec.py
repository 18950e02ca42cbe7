"""μ-law (G.711) codec + AIFF container (operators/multimodal.py, r5).

The μ-law round trip is pure integer math; AIFF is lossless, so its
features must equal the WAV decoder's on the same generative samples.
"""

from __future__ import annotations

import pytest

from sneaky_data_matcher_spark.operators import multimodal as M


def test_mulaw_roundtrip_monotone_and_bounded():
    """decode(encode(s)) is within the μ-law quantization step of s for
    every 16-bit value, sign-symmetric, and monotone non-decreasing."""
    prev = None
    for s in range(-32768, 32768, 7):  # dense sweep
        u = M.mulaw_encode_sample(s)
        assert 0 <= u <= 255
        d = M.mulaw_decode_sample(u)
        # quantization step at |s| is ~2^(e+3); bound by the coarsest
        mag = min(abs(s), 32635)
        step = 1 << (max((mag + 132).bit_length() - 8, 0) + 3)
        assert abs(d - max(-32635, min(32635, s))) <= step, (s, d, step)
        if prev is not None:
            assert d >= prev - 0  # monotone over increasing s
        prev = d


def test_mulaw_known_codewords():
    """Spec anchor points: 0 encodes to 0xFF (complemented positive
    zero), -1 small negatives to 0x7F-region; full-scale clips."""
    assert M.mulaw_encode_sample(0) == 0xFF
    assert M.mulaw_decode_sample(0xFF) == 0
    assert M.mulaw_decode_sample(M.mulaw_encode_sample(32767)) == 32124
    assert M.mulaw_decode_sample(M.mulaw_encode_sample(-32768)) == -32124


def test_mulaw_idempotent_on_decoded_values():
    """Re-encoding a decoded value yields the same codeword (the decoded
    lattice is the codec's fixed-point set)."""
    for u in range(256):
        d = M.mulaw_decode_sample(u)
        assert M.mulaw_decode_sample(M.mulaw_encode_sample(d)) == d


def test_mulaw_wav_container_roundtrip():
    ref = "au:1"
    payload = M._wav_mulaw_bytes(ref)
    rate, samples = M._wav_samples(payload)
    assert rate == M.WAV_RATE
    seed, n = M.wav_params(ref)
    orig = [((seed + i * M._SAMPLE_A) % 65536) - 32768 for i in range(n)]
    assert len(samples) == n
    want = [M.mulaw_decode_sample(M.mulaw_encode_sample(s)) for s in orig]
    assert samples == want


def test_f80_rate_roundtrip():
    for rate in (8000, 11025, 16000, 22050, 44100, 48000, 96000):
        assert M._f80_decode(M._f80_encode(rate)) == rate


def test_aiff_samples_equal_wav_samples():
    """Container independence: AIFF carries the exact PCM the WAV does."""
    for i in range(10):
        ref = f"aif:{i}"
        rw, sw = M._wav_samples(M._wav_bytes(ref))
        ra, sa = M._aiff_samples(M._aiff_bytes(ref))
        assert (rw, sw) == (ra, sa)


def test_aiff_features_equal_wav_features():
    for i in range(5):
        ref = f"aif:{i}"
        assert M._decode_one(M._aiff_bytes(ref), "audio", strict=True) == (
            M._decode_one(M._wav_bytes(ref), "audio", strict=True)
        )


def test_audio_fingerprint_container_invariance():
    """The energy-envelope fingerprint is identical across WAV and AIFF
    (lossless pair), and the μ-law copy stays within a small Hamming
    radius (coarse 32-band envelope is robust to μ-law quantization)."""
    for i in range(8):
        ref = f"afp:{i}"
        rate_w, s_w = M._audio_samples(M._wav_bytes(ref))
        rate_a, s_a = M._audio_samples(M._aiff_bytes(ref))
        assert s_w == s_a
        rate_m, s_m = M._audio_samples(M._wav_mulaw_bytes(ref))
        assert len(s_m) == len(s_w)
        # energies differ only by quantization error; envelope bits close
        def fp(samples):
            n = len(samples)
            en = [
                sum(x * x for x in samples[k * n // 32 : (k + 1) * n // 32])
                for k in range(32)
            ]
            tot = sum(en)
            return "".join("1" if 32 * e >= tot else "0" for e in en)

        hw, hm = fp(s_w), fp(s_m)
        # the synthetic signal is uniform noise — band energies cluster
        # AT the threshold, the envelope's least stable case (real audio
        # has structure); observed 0-5 flipped bits over the fixture
        assert sum(a != b for a, b in zip(hw, hm)) <= 8, ref


def test_truncated_aiff_raises():
    import struct as _struct

    payload = M._aiff_bytes("t:2")
    with pytest.raises((ValueError, _struct.error)):
        M._aiff_samples(payload[:20])
