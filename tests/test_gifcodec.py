"""Unit tests for the REAL GIF codec (pipeline/gifcodec.py): LZW
round-trips through dictionary growth/CLEAR, the KwKwK
self-referencing-code case via a hand-built vector, interlacing,
extension-block skipping, local-color-table precedence, and error
paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hive_clone_spark.pipeline.gifcodec import (
    _LSBWriter,
    _interlace_order,
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
    synth_gif,
)


@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_lzw_roundtrip_random(mcs):
    rng = np.random.default_rng(mcs)
    for _ in range(5):
        n = int(rng.integers(1, 30000))
        data = rng.integers(0, 1 << mcs, size=n, dtype=np.uint8).tobytes()
        assert lzw_decode(lzw_encode(data, mcs), mcs) == data


def test_lzw_dictionary_overflow_clears():
    """>4096 distinct phrases force a mid-stream CLEAR; the stream must
    still round-trip."""
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=60000, dtype=np.uint8).tobytes()
    assert lzw_decode(lzw_encode(data, 8), 8) == data


def test_lzw_low_entropy_deep_chains():
    data = (b"abab" * 3000) + (b"\x00" * 5000)
    assert lzw_decode(lzw_encode(data, 8), 8) == data


def test_lzw_kwkwk_vector():
    """Hand-built stream exercising the code == len(table) case: after
    CLEAR, codes [A, len(table)] decode as A, A+A[0] (KwKwK)."""
    mcs = 2
    clear, end = 4, 5
    wr = _LSBWriter()
    wr.write(clear, 3)
    wr.write(1, 3)   # literal 1 -> out "1", prev="1"
    wr.write(6, 3)   # == next table slot -> KwKwK: "11"
    wr.write(end, 3)
    assert lzw_decode(wr.flush(), mcs) == b"\x01\x01\x01"


def test_lzw_bad_code_raises():
    mcs = 2
    wr = _LSBWriter()
    wr.write(4, 3)   # clear
    wr.write(7, 3)   # table has 6 entries, 7 > len(table): invalid
    with pytest.raises(ValueError, match="bad LZW"):
        lzw_decode(wr.flush(), mcs)


def test_interlace_order_is_permutation():
    for h in (1, 2, 7, 8, 31, 32):
        order = _interlace_order(h)
        assert sorted(order) == list(range(h))


@pytest.mark.parametrize("interlace", [False, True])
def test_container_roundtrip(interlace):
    rng = np.random.default_rng(17 + interlace)
    idx = rng.integers(0, 256, size=(23, 31), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    rgb = decode_gif(encode_gif(idx, pal, interlace=interlace))
    np.testing.assert_array_equal(rgb, pal[idx])


def test_small_palette_roundtrip():
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    np.testing.assert_array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])


def test_extension_blocks_skipped():
    """Insert a comment extension before the image descriptor."""
    idx = np.array([[5, 6], [7, 8]], dtype=np.uint8)
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    payload = encode_gif(idx, pal)
    desc = 13 + 3 * 256 + 8  # header+LSD, 256-entry GCT, GCE block
    assert payload[desc] == 0x2C
    patched = payload[:desc] + b"\x21\xfe\x05hello\x00" + payload[desc:]
    np.testing.assert_array_equal(decode_gif(patched), pal[idx])


def test_local_color_table_precedence():
    """A local color table must override the global one."""
    idx = np.zeros((1, 1), dtype=np.uint8)
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    payload = bytearray(encode_gif(idx, pal))
    desc = 13 + 3 * 256 + 8  # header+LSD, 256-entry GCT, GCE block
    assert payload[desc] == 0x2C
    # set local-table flag (2 colors) and splice a 2-entry table in
    assert payload[desc + 9] == 0x00
    payload[desc + 9] = 0x80  # local table, size bits 0 -> 2 entries
    local = bytes([10, 20, 30, 40, 50, 60])
    patched = bytes(payload[: desc + 10]) + local + bytes(payload[desc + 10 :])
    assert decode_gif(patched)[0, 0].tolist() == [10, 20, 30]


def test_bad_signature_raises():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + b"\x00" * 20)


def test_synth_shapes():
    rgb = decode_gif(synth_gif(7))
    assert rgb.shape == (1 + 35 % 32, 8, 3)
