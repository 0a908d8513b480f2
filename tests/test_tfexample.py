"""Wire-format tests for the clean-room tf.Example codec
(pipeline/tfexample.py): protobuf spec vectors, unknown-field
forward-compat, and property-based roundtrips."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hive_clone_spark.pipeline.tfexample import (
    _ld,
    _tag,
    encode_bytes_list,
    encode_example,
    encode_float_list,
    encode_int64_list,
    parse_example,
    read_varint,
    synth_example,
    write_varint,
)


def test_varint_spec_vectors():
    # from the protobuf encoding documentation
    assert write_varint(0) == b"\x00"
    assert write_varint(1) == b"\x01"
    assert write_varint(127) == b"\x7f"
    assert write_varint(128) == b"\x80\x01"
    assert write_varint(300) == b"\xac\x02"
    assert read_varint(b"\xac\x02", 0) == (300, 2)


@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_varint_roundtrip(n):
    buf = write_varint(n)
    val, pos = read_varint(buf, 0)
    assert val == n and pos == len(buf)


def test_tag_encoding():
    # field 1 wire 2 -> 0x0a (the most recognizable protobuf byte)
    assert _tag(1, 2) == b"\x0a"
    assert _tag(3, 0) == b"\x18"


@settings(max_examples=50)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), max_size=8),
    st.binary(max_size=32),
    st.integers(min_value=0, max_value=400),
)
def test_example_roundtrip(toks, blob, quarter):
    ex = encode_example(
        {
            "toks": (3, encode_int64_list(toks)),
            "blob": (1, encode_bytes_list([blob])),
            "q": (2, encode_float_list([quarter / 4.0])),
        }
    )
    feats = parse_example(ex)
    assert feats["toks"] == toks
    assert feats["blob"] == [blob]
    assert feats["q"] == [quarter / 4.0]  # quarters exact in float32


def test_unknown_fields_are_skipped():
    """Forward compatibility: a writer that adds fields this reader
    has never heard of must not break the parse."""
    base = synth_example(42)
    # append an unknown varint field (9) and an unknown
    # length-delimited field (10) at the Example level
    hacked = base + _tag(9, 0) + write_varint(777) + _ld(10, b"future")
    assert parse_example(hacked) == parse_example(base)


def test_unpacked_int64_reader_compat():
    """Some writers emit repeated int64 UNPACKED (one varint field per
    value); the reader accepts both encodings."""
    unpacked = b"".join(_tag(1, 0) + write_varint(v) for v in (7, 8, 9))
    ex = encode_example({"toks": (3, unpacked)})
    assert parse_example(ex)["toks"] == [7, 8, 9]
