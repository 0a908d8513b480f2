"""Unit tests for the REAL WAV codec (pipeline/audiocodec.py):
byte-level encode/decode round-trips, chunk-walk robustness (junk
chunks, odd-size word alignment), corrupt-container rejection, and
the synthetic driver payloads being genuine decodable files.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hive_clone_spark.pipeline.audiocodec import decode_wav, encode_wav, synth_wav


@pytest.mark.parametrize("c", [1, 2, 4])
@pytest.mark.parametrize("n", [1, 7, 256])
def test_wav_roundtrip(c, n):
    rng = np.random.default_rng(c * 1000 + n)
    samples = rng.integers(-32768, 32768, size=(n, c), dtype=np.int16)
    payload = encode_wav(samples, 16000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert len(payload) == 44 + 2 * c * n
    rate, out = decode_wav(payload)
    assert rate == 16000
    np.testing.assert_array_equal(out, samples)


def test_wav_chunk_walk_skips_extras():
    """Real WAVs interleave LIST/fact/etc chunks around data; the
    parser must walk and skip them, including odd-size chunks that
    force word-alignment padding."""
    samples = np.arange(6, dtype=np.int16).reshape(3, 2)
    payload = encode_wav(samples, 8000)
    # splice an ODD-size junk chunk (5 bytes -> 1 pad byte) before data
    junk = b"LIST" + struct.pack("<I", 5) + b"JUNK!" + b"\x00"
    body = payload[8:36] + junk + payload[36:]
    spliced = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, out = decode_wav(spliced)
    assert rate == 8000
    np.testing.assert_array_equal(out, samples)
    # and one AFTER data too
    body2 = payload[8:] + b"fact" + struct.pack("<I", 4) + b"\x03\x00\x00\x00"
    rate2, out2 = decode_wav(b"RIFF" + struct.pack("<I", len(body2)) + body2)
    np.testing.assert_array_equal(out2, samples)


def test_wav_rejects_corrupt():
    samples = np.zeros((4, 1), dtype=np.int16)
    good = encode_wav(samples)
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"RIFX" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:-3])
    mutated = bytearray(good)
    struct.pack_into("<H", mutated, 20, 3)  # format tag 1 -> IEEE float
    with pytest.raises(ValueError, match="PCM16"):
        decode_wav(bytes(mutated))
    no_data = good[:36]  # header + fmt only
    fixed = b"RIFF" + struct.pack("<I", 28) + no_data[8:]
    with pytest.raises(ValueError, match="missing fmt/data"):
        decode_wav(fixed)


def test_synth_wav_is_real_and_decodable():
    for doc_id in [0, 1, 2, 3, 6, 255, 256, 9999]:
        payload = synth_wav(doc_id)
        rate, samples = decode_wav(payload)
        c = 1 + doc_id % 2
        n = 1 + (doc_id * 13) % 256
        assert rate == 8000
        assert samples.shape == (n, c)
        want_bytes = 44 + (12 if doc_id % 3 == 0 else 0) + 2 * c * n
        assert len(payload) == want_bytes
        i = np.arange(n, dtype=np.int64)
        for ch in range(c):
            want = ((doc_id * 31 + i * 7 + ch * 97) % 4001) - 2000
            np.testing.assert_array_equal(samples[:, ch].astype(np.int64), want)


# ---------------------------------------------------------------------------
# G.711 mu-law companding (round-6 addition)
# ---------------------------------------------------------------------------
def test_mulaw_full_range_roundtrip_error_bounded():
    import numpy as np

    from hive_clone_spark.pipeline.audiocodec import mulaw_decode, mulaw_encode

    x = np.arange(-32768, 32768, dtype=np.int32).astype(np.int16)
    d = mulaw_decode(mulaw_encode(x)).astype(np.int64)
    err = np.abs(d - x.astype(np.int64))
    # error is segment-proportional: exact near zero, <= ~1024 at clip
    assert err[32768 - 64 : 32768 + 64].max() <= 4
    assert err.max() <= 1024


def test_mulaw_known_codewords():
    import numpy as np

    from hive_clone_spark.pipeline.audiocodec import mulaw_decode, mulaw_encode

    # zero encodes to 0xFF (all bits inverted zero code), decodes to 0
    assert mulaw_encode(np.array([0], np.int16))[0] == 0xFF
    assert mulaw_decode(np.array([0xFF], np.uint8))[0] == 0
    # sign symmetry: enc(-x) = enc(x) with the sign bit cleared
    u_pos = mulaw_encode(np.array([1000], np.int16))[0]
    u_neg = mulaw_encode(np.array([-1000], np.int16))[0]
    assert (u_pos ^ u_neg) == 0x80
    assert mulaw_decode(np.array([u_pos], np.uint8))[0] == -mulaw_decode(
        np.array([u_neg], np.uint8)
    )[0]


def test_mulaw_monotone_on_positives():
    import numpy as np

    from hive_clone_spark.pipeline.audiocodec import mulaw_decode, mulaw_encode

    x = np.arange(0, 32636, dtype=np.int32).astype(np.int16)
    d = mulaw_decode(mulaw_encode(x)).astype(np.int64)
    assert (np.diff(d) >= 0).all()  # quantizer is monotone
