"""MessagePack codec: spec vectors (msgpack.org format spec) +
hypothesis roundtrips. The distributed entry (p_msgpack_roundtrip)
is covered by the oracle-parity suite; these pin the byte-level
format, including branches the documents fixture never hits
(negative ints, bin, nested collections, wide headers)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_clone_spark.sources.msgpack import (
    MsgpackError,
    msgpack_decode,
    msgpack_encode,
)

# (value, exact encoding) — transcribed from the public spec tables
SPEC_VECTORS = [
    (None, b"\xc0"),
    (False, b"\xc2"),
    (True, b"\xc3"),
    (0, b"\x00"),
    (127, b"\x7f"),
    (128, b"\xcc\x80"),
    (255, b"\xcc\xff"),
    (256, b"\xcd\x01\x00"),
    (65535, b"\xcd\xff\xff"),
    (65536, b"\xce\x00\x01\x00\x00"),
    (4294967296, b"\xcf\x00\x00\x00\x01\x00\x00\x00\x00"),
    (-1, b"\xff"),
    (-32, b"\xe0"),
    (-33, b"\xd0\xdf"),
    (-128, b"\xd0\x80"),
    (-129, b"\xd1\xff\x7f"),
    (-32768, b"\xd1\x80\x00"),
    (-32769, b"\xd2\xff\xff\x7f\xff"),
    (-2147483648, b"\xd2\x80\x00\x00\x00"),
    (-2147483649, b"\xd3\xff\xff\xff\xff\x7f\xff\xff\xff"),
    ("", b"\xa0"),
    ("a", b"\xa1a"),
    ("hello", b"\xa5hello"),
    ("x" * 31, b"\xbf" + b"x" * 31),
    ("x" * 32, b"\xd9\x20" + b"x" * 32),
    ("x" * 256, b"\xda\x01\x00" + b"x" * 256),
    (1.5, b"\xcb\x3f\xf8\x00\x00\x00\x00\x00\x00"),
    (b"\x01\x02", b"\xc4\x02\x01\x02"),
    ([], b"\x90"),
    ([1, 2, 3], b"\x93\x01\x02\x03"),
    (list(range(16)), b"\xdc\x00\x10" + bytes(range(16))),
    ({}, b"\x80"),
    ({"a": 1}, b"\x81\xa1a\x01"),
]


@pytest.mark.parametrize("value,encoded", SPEC_VECTORS)
def test_spec_vector_encode(value, encoded):
    assert msgpack_encode(value) == encoded


@pytest.mark.parametrize("value,encoded", SPEC_VECTORS)
def test_spec_vector_decode(value, encoded):
    assert msgpack_decode(encoded) == value


def test_wide_map_header():
    m = {f"k{i:03d}": i for i in range(16)}  # 16 entries -> map16
    buf = msgpack_encode(m)
    assert buf[:3] == b"\xde\x00\x10"
    assert msgpack_decode(buf) == m


def test_float32_decode_only():
    # ca is decoded (foreign encoders emit it); we never produce it
    import struct

    buf = b"\xca" + struct.pack(">f", 2.5)
    assert msgpack_decode(buf) == 2.5


def test_trailing_bytes_rejected():
    with pytest.raises(MsgpackError):
        msgpack_decode(b"\x01\x02")


def test_truncated_rejected():
    with pytest.raises(MsgpackError):
        msgpack_decode(b"\xcd\x01")  # uint16 missing a byte


def test_oversized_int_rejected():
    with pytest.raises(MsgpackError):
        msgpack_encode(1 << 64)


_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(1 << 63), max_value=(1 << 64) - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=300),
    st.binary(max_size=300),
)
_tree = st.recursive(
    _scalar,
    lambda kids: st.one_of(
        st.lists(kids, max_size=20),
        st.dictionaries(st.text(max_size=20), kids, max_size=20),
    ),
    max_leaves=30,
)


@settings(max_examples=150, deadline=None)
@given(_tree)
def test_roundtrip_property(obj):
    back = msgpack_decode(msgpack_encode(obj))
    # tuples come back as lists; our strategy emits none, so ==
    assert back == obj
