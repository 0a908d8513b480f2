"""Snappy block-format codec: spec vectors, edge cases, hypothesis
roundtrips, and decoder validation (sources/snappy.py)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_clone_spark.sources.snappy import (
    snappy_compress,
    snappy_decompress,
)


def test_empty():
    c = snappy_compress(b"")
    assert c == b"\x00"  # just the uvarint preamble
    assert snappy_decompress(c) == b""


def test_short_literal_exact_bytes():
    # 5-byte input, no 4-byte repeat -> preamble + literal tag + bytes
    c = snappy_compress(b"abcde")
    assert c == b"\x05" + bytes([(5 - 1) << 2]) + b"abcde"


def test_repeat_uses_copy():
    raw = b"abcdabcdabcdabcd"
    c = snappy_compress(raw)
    assert len(c) < len(raw)
    assert snappy_decompress(c) == raw


def test_overlapping_copy_rle():
    # classic snappy RLE: literal 'a' * small, copy with offset < length
    raw = b"a" * 200
    c = snappy_compress(raw)
    assert snappy_decompress(c) == raw
    assert len(c) < 30


def test_long_literal_length_bytes():
    # 61..256 bytes of non-repeating literal take the 1-extra-byte form
    raw = bytes(range(256))  # no 4-byte repeats
    c = snappy_compress(raw)
    # preamble 256 = 2-byte uvarint (0x80 0x02), then tag + length byte
    assert c[:2] == b"\x80\x02"
    assert c[2] == 60 << 2 and c[3] == 255
    assert snappy_decompress(c) == raw


def test_decode_spec_copy_forms():
    # handcrafted stream exercising tag 01 (11-bit offset) and tag 11
    # (32-bit offset), which the encoder never emits
    # literal 'abcd', copy1 len4 off4, copy4 len4 off8
    stream = bytearray(b"\x0c")  # preamble: 12
    stream += bytes([(4 - 1) << 2]) + b"abcd"
    stream += bytes([((4 - 4) << 2) | ((4 >> 8) << 5) | 0x01, 4 & 0xFF])
    stream += bytes([((4 - 1) << 2) | 0x03]) + (8).to_bytes(4, "little")
    assert snappy_decompress(bytes(stream)) == b"abcdabcdabcd"


def test_decoder_rejects_bad_offset():
    # copy reaching before the start of output
    stream = b"\x04" + bytes([(4 - 1) << 2 | 0x02]) + (9).to_bytes(2, "little")
    with pytest.raises(ValueError):
        snappy_decompress(stream)


def test_decoder_rejects_length_mismatch():
    c = bytearray(snappy_compress(b"hello world"))
    c[0] += 1  # preamble lies about the length
    with pytest.raises(ValueError):
        snappy_decompress(bytes(c))


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_roundtrip_random(data):
    assert snappy_decompress(snappy_compress(data)) == data


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.sampled_from([b"spark", b"scan", b"x", b"merge-join", b"\x00\xff"]),
        min_size=0,
        max_size=120,
    )
)
def test_roundtrip_repetitive(parts):
    data = b"".join(parts)
    c = snappy_compress(data)
    assert snappy_decompress(c) == data
    # determinism: same input, same bytes
    assert snappy_compress(data) == c
