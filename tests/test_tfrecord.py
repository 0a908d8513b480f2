"""Clean-room TFRecord codec: CRC-32C spec vector, framing roundtrip,
corruption detection modes (sources/tfrecord.py)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_clone_spark.sources.tfrecord import (
    crc32c,
    decode_tfrecord,
    encode_tfrecord,
    masked_crc,
)


def test_crc32c_spec_vectors():
    # RFC 3720 / published Castagnoli test vectors
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_roundtrip_and_corrupt_skip():
    rows = [(1, 1.5, "HI"), (-7, -3.25, "LOW"), (2**40, 0.1, "")]
    buf = encode_tfrecord(rows, corrupt_extra=True)
    out, skipped = decode_tfrecord(buf)
    assert out == rows  # doubles bit-exact through the frame
    assert skipped == 1


def test_length_crc_failure_is_fatal():
    buf = bytearray(encode_tfrecord([(1, 2.0, "X")]))
    buf[8] ^= 0xFF  # corrupt the length CRC itself
    with pytest.raises(ValueError, match="length CRC"):
        decode_tfrecord(bytes(buf))


def test_trailing_garbage_rejected():
    buf = encode_tfrecord([(1, 2.0, "X")]) + b"\x01\x02"
    with pytest.raises(ValueError):
        decode_tfrecord(buf)


def test_mask_definition():
    data = b"abc"
    c = crc32c(data)
    assert masked_crc(data) == ((c >> 15 | c << 17) + 0xA282EAD8) & 0xFFFFFFFF


@settings(max_examples=50, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.floats(allow_nan=False, allow_infinity=True, width=64),
            st.text(
                alphabet=st.characters(codec="utf-8"), max_size=20
            ),
        ),
        max_size=8,
    )
)
def test_property_roundtrip(rows):
    out, skipped = decode_tfrecord(encode_tfrecord(rows))
    assert skipped == 0
    assert len(out) == len(rows)
    for (k, p, s), (k2, p2, s2) in zip(rows, out):
        assert k == k2 and s == s2
        assert struct.pack("<d", p) == struct.pack("<d", p2)  # bit-exact
