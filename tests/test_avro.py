"""Byte-level tests for the clean-room Avro OCF codec."""

from __future__ import annotations

import pytest
from hypothesis import given
from hypothesis import strategies as st

from hive_clone_spark.sources.avro import (
    _BLOCK_ROWS,
    decode_ocf,
    dec_long,
    enc_long,
    encode_ocf,
)


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_varint_zigzag_roundtrip(n):
    got, pos = dec_long(enc_long(n), 0)
    assert got == n and pos == len(enc_long(n))


def test_known_zigzag_vectors():
    # from the Avro spec's binary-encoding table
    assert enc_long(0) == b"\x00"
    assert enc_long(-1) == b"\x01"
    assert enc_long(1) == b"\x02"
    assert enc_long(-2) == b"\x03"
    assert enc_long(2) == b"\x04"
    assert enc_long(-64) == b"\x7f"
    assert enc_long(64) == b"\x80\x01"


def test_ocf_roundtrip_multiblock():
    rows = [(i, f"p{i % 3}", i * 0.5) for i in range(_BLOCK_ROWS * 2 + 10)]
    buf = encode_ocf(3, rows)
    back, n_blocks = decode_ocf(buf)
    assert back == rows
    assert n_blocks == 3  # 256 + 256 + 10


def test_ocf_doubles_exact():
    vals = [0.1, -1e300, 3.141592653589793, 2.0**-1074]
    rows = [(i, "x", v) for i, v in enumerate(vals)]
    back, _ = decode_ocf(encode_ocf(0, rows))
    assert [r[2] for r in back] == vals  # bit-exact IEEE roundtrip


def test_ocf_sync_marker_mismatch_detected():
    buf = bytearray(encode_ocf(1, [(1, "a", 1.0), (2, "b", 2.0)]))
    buf[-1] ^= 0xFF  # corrupt the final sync marker
    with pytest.raises(ValueError, match="sync marker"):
        decode_ocf(bytes(buf))


def test_ocf_bad_magic_and_codec():
    buf = encode_ocf(0, [(1, "a", 1.0)])
    with pytest.raises(ValueError, match="magic"):
        decode_ocf(b"Nope" + buf[4:])
    # splice the codec metadata value 'deflate' -> 'snappyz' (same len)
    hacked = buf.replace(b"deflate", b"snappyz", 1)
    with pytest.raises(ValueError, match="codec"):
        decode_ocf(hacked)
