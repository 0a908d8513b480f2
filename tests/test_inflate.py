"""Clean-room DEFLATE decoder vs the stdlib-zlib encoder: all three
block types, all compression levels, zlib wrapper + Adler-32, raw
streams, hypothesis roundtrips, malformed-input rejection."""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_clone_spark.sources.inflate import (
    _BitReader,
    _canonical_decoder,
    inflate,
    inflate_zlib,
)


def test_stored_fixed_dynamic_blocks():
    data = b"the quick brown fox " * 100
    assert inflate_zlib(zlib.compress(data, 0)) == data  # stored
    assert inflate_zlib(zlib.compress(data, 1)) == data
    assert inflate_zlib(zlib.compress(data, 9)) == data  # dynamic
    # small input at level 6 commonly emits a fixed-Huffman block
    assert inflate_zlib(zlib.compress(b"abc", 6)) == b"abc"


def test_empty_and_binary():
    assert inflate_zlib(zlib.compress(b"")) == b""
    blob = bytes(range(256)) * 20
    assert inflate_zlib(zlib.compress(blob, 9)) == blob


def test_raw_deflate_no_wrapper():
    data = b"raw stream " * 50
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw = co.compress(data) + co.flush()
    assert inflate(raw) == data


def test_overlapping_distance_rle():
    # long single-byte run decodes through dist=1 overlap copies
    data = b"z" * 50000
    assert inflate_zlib(zlib.compress(data, 6)) == data


def test_adler_verification():
    comp = bytearray(zlib.compress(b"integrity matters " * 40, 6))
    comp[-2] ^= 0x01
    with pytest.raises(ValueError, match="Adler-32"):
        inflate_zlib(bytes(comp))


def test_header_rejection():
    with pytest.raises(ValueError):
        inflate_zlib(b"\x00" * 8)  # bad method
    with pytest.raises(ValueError):
        inflate_zlib(b"\x78")  # too short


def test_canonical_code_assignment():
    # RFC 1951 3.2.2 worked example: lengths (3,3,3,3,3,2,4,4)
    tab = _canonical_decoder([3, 3, 3, 3, 3, 2, 4, 4])
    assert tab[(2, 0b00)] == 5
    assert tab[(3, 0b010)] == 0
    assert tab[(4, 0b1110)] == 6
    assert tab[(4, 0b1111)] == 7


def test_bitreader_lsb_order():
    br = _BitReader(bytes([0b10110100]))
    assert [br.bits(1) for _ in range(8)] == [0, 0, 1, 0, 1, 1, 0, 1]


@settings(max_examples=150, deadline=None)
@given(
    st.one_of(
        st.binary(max_size=2000),
        st.builds(
            lambda seed, reps: seed * reps,
            st.binary(min_size=1, max_size=40),
            st.integers(min_value=1, max_value=200),
        ),
    ),
    st.sampled_from([0, 1, 6, 9]),
)
def test_roundtrip_property(data, level):
    assert inflate_zlib(zlib.compress(data, level)) == data
