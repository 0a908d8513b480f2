"""LZ4 block codec: spec vectors, end-of-block rules, overlap copy,
hypothesis roundtrip, and encoder determinism (the property the
driver entry's reproducibility rests on)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_clone_spark.sources.lz4 import (
    _LAST_LITERALS,
    _MFLIMIT,
    lz4_compress,
    lz4_decompress,
)


def test_empty_and_tiny():
    assert lz4_decompress(lz4_compress(b"")) == b""
    assert lz4_decompress(lz4_compress(b"x")) == b"x"
    assert lz4_decompress(lz4_compress(b"abcd")) == b"abcd"


def test_literal_only_vector():
    # token 0x50: 5 literals, no match (last sequence)
    assert lz4_decompress(b"\x50hello") == b"hello"


def test_overlap_rle_vector():
    # 'a' literal then match offset=1 len=8: self-overlapping copy
    assert lz4_decompress(bytes([0x14, ord("a"), 0x01, 0x00, 0x00])) == b"a" * 9


def test_extended_lengths():
    # >= 15 literals forces the 255-run extension path on both nibbles
    data = bytes(range(64)) * 8 + b"tail-literals"
    assert lz4_decompress(lz4_compress(data)) == data
    long_run = b"z" * 1000
    comp = lz4_compress(long_run)
    assert lz4_decompress(comp) == long_run
    assert len(comp) < 40  # the RLE case must actually compress


def test_end_of_block_rules():
    """Spec: last sequence literals-only; matches never start within
    MFLIMIT of the end nor extend into the last 5 bytes."""
    data = (b"abcdefgh" * 10) + b"abcdefgh"  # repetitive to the very end
    comp = lz4_compress(data)
    assert lz4_decompress(comp) == data
    # walk sequences: the final one must be literals-only
    i, n, seqs = 0, len(comp), []
    while i < n:
        token = comp[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                lit += comp[i]
                b = comp[i]
                i += 1
                if b != 255:
                    break
        i += lit
        if i == n:
            seqs.append(("literals", lit))
            break
        i += 2  # offset
        ml = token & 0xF
        if ml == 15:
            while True:
                ml += comp[i]
                b = comp[i]
                i += 1
                if b != 255:
                    break
        seqs.append(("match", ml + 4))
    assert seqs[-1][0] == "literals"
    assert seqs[-1][1] >= min(len(data), _LAST_LITERALS)


def test_malformed_raises():
    with pytest.raises(ValueError):
        lz4_decompress(b"\x10")  # truncated literals
    with pytest.raises(ValueError):
        lz4_decompress(bytes([0x04, 0x05, 0x00, 0x00]))  # offset past start
    with pytest.raises(ValueError):
        lz4_decompress(b"\xf0")  # truncated extended literal length


def test_encoder_deterministic():
    data = b"determinism is the contract " * 40
    assert lz4_compress(data) == lz4_compress(data)


@settings(max_examples=200, deadline=None)
@given(
    st.one_of(
        st.binary(max_size=600),
        # repetitive inputs: small alphabet tiled — exercises matches
        st.builds(
            lambda seed, reps: (seed * reps)[: len(seed) * reps],
            st.binary(min_size=1, max_size=24),
            st.integers(min_value=1, max_value=60),
        ),
    )
)
def test_roundtrip_property(data):
    assert lz4_decompress(lz4_compress(data)) == data


def test_mflimit_boundary_sizes():
    """Every size around the MFLIMIT/LAST_LITERALS thresholds."""
    for n in range(0, _MFLIMIT + _LAST_LITERALS + 4):
        data = b"a" * n
        assert lz4_decompress(lz4_compress(data)) == data
