"""Zstandard codec (RFC 8878): handcrafted frame/block spec vectors,
repeat-offset rules, XXH64 vector, decoder validation, and hypothesis
roundtrips (sources/zstd.py)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_clone_spark.sources.zstd import (
    ZstdError,
    _resolve_offset,
    xxh64,
    zstd_compress,
    zstd_decompress,
)

MAGIC = (0xFD2FB528).to_bytes(4, "little")


def test_xxh64_published_vector():
    assert xxh64(b"") == 0xEF46DB3751D8E999


def test_empty_input():
    c = zstd_compress(b"")
    assert zstd_decompress(c) == b""
    # frame layout: magic + FHD + 1-byte FCS(0) + raw last block size 0
    assert c[:4] == MAGIC
    assert c[4] == 0x24  # single-segment | checksum, FCS flag 0
    assert c[5] == 0


def test_rle_block_for_uniform_input():
    raw = b"z" * 5000
    c = zstd_compress(raw)
    assert zstd_decompress(c) == raw
    # block header starts after magic(4) + FHD(1) + FCS(2: 5000 >= 256)
    bh = int.from_bytes(c[7:10], "little")
    assert bh & 1 == 1  # last block
    assert (bh >> 1) & 3 == 1  # RLE type
    assert bh >> 3 == 5000  # regenerated size
    assert len(c) == 10 + 1 + 4  # + RLE byte + checksum


def test_raw_block_for_incompressible_input():
    raw = bytes((i * 131) & 0xFF for i in range(200))  # no 4-gram repeats
    c = zstd_compress(raw)
    assert zstd_decompress(c) == raw
    bh = int.from_bytes(c[6:9], "little")
    assert (bh >> 1) & 3 == 0  # raw block: compression did not pay


# ---------------------------------------------------------------------------
# handcrafted decode vectors (built by hand from RFC 8878 field layouts,
# NOT by the encoder under test)
# ---------------------------------------------------------------------------
def _frame(fhd: int, fcs: bytes, blocks: bytes) -> bytes:
    return MAGIC + bytes([fhd]) + fcs + blocks


def test_decode_handcrafted_raw_frame():
    # single-segment, 1-byte FCS=5, one raw last block "hello"
    blk = (1 | (0 << 1) | (5 << 3)).to_bytes(3, "little") + b"hello"
    assert zstd_decompress(_frame(0x20, b"\x05", blk)) == b"hello"


def test_decode_handcrafted_rle_frame():
    blk = (1 | (1 << 1) | (7 << 3)).to_bytes(3, "little") + b"q"
    assert zstd_decompress(_frame(0x20, b"\x07", blk)) == b"qqqqqqq"


def test_decode_handcrafted_huffman_literals():
    """Compressed block, 0 sequences, Huffman literals 'abba' with a
    direct-weight tree: listed weights cover symbols 0..97 (only
    'a'=97 has weight 1), the implicit last symbol 98='b' completes
    the power of 2 -> 1-bit codes a=0, b=1."""
    tree = bytes([127 + 98]) + bytes(48) + bytes([0x01])  # 49 weight bytes
    stream = bytes([0x16])  # bits (LSB up): 0,1,1,0 + marker -> a,b,b,a
    co = len(tree) + len(stream)
    h = 2 | (0 << 2) | (4 << 4) | (co << 14)
    lit_sec = h.to_bytes(3, "little") + tree + stream
    content = lit_sec + b"\x00"  # 0 sequences
    blk = (1 | (2 << 1) | (len(content) << 3)).to_bytes(3, "little") + content
    assert zstd_decompress(_frame(0x20, b"\x04", blk)) == b"abba"


def test_decode_handcrafted_rle_sequences_with_repeat_offset():
    """Compressed block with RLE sequence modes: 2 sequences, each
    LL=1 / Offset_Value=1 (initial Repeated_Offset1 = 1) / ML=3 —
    exercises repeat offsets and overlapping copies. Expected:
    'a' + copy3(off1) + 'b' + copy3(off1) = 'aaaabbbb'."""
    lit_sec = bytes([0 | (2 << 3)]) + b"ab"  # raw literals "ab"
    seq = bytes([2, 0x54, 1, 0, 0])  # nbseq=2, modes RLE^3, LL=1 OF=0 ML=0
    seq += bytes([0x01])  # zero-content reverse bitstream (marker only)
    content = lit_sec + seq
    blk = (1 | (2 << 1) | (len(content) << 3)).to_bytes(3, "little") + content
    assert zstd_decompress(_frame(0x20, b"\x08", blk)) == b"aaaabbbb"


def test_decode_skippable_and_concatenated_frames():
    skip = (0x184D2A53).to_bytes(4, "little") + (3).to_bytes(4, "little") + b"xyz"
    real = zstd_compress(b"payload")
    assert zstd_decompress(skip + real + real) == b"payloadpayload"


def test_repeat_offset_rules():
    # Offset_Value > 3: push
    rep = [1, 4, 8]
    assert _resolve_offset(10, 5, rep) == 7 and rep == [7, 1, 4]
    # value 1, ll != 0: RO1, no reorder
    rep = [2, 5, 9]
    assert _resolve_offset(1, 3, rep) == 2 and rep == [2, 5, 9]
    # value 2, ll != 0: RO2, swap
    rep = [2, 5, 9]
    assert _resolve_offset(2, 3, rep) == 5 and rep == [5, 2, 9]
    # value 3, ll != 0: RO3, rotate
    rep = [2, 5, 9]
    assert _resolve_offset(3, 3, rep) == 9 and rep == [9, 2, 5]
    # ll == 0 shifts: value 1 -> RO2, value 2 -> RO3, value 3 -> RO1 - 1
    rep = [2, 5, 9]
    assert _resolve_offset(1, 0, rep) == 5 and rep == [5, 2, 9]
    rep = [2, 5, 9]
    assert _resolve_offset(2, 0, rep) == 9 and rep == [9, 2, 5]
    rep = [2, 5, 9]
    assert _resolve_offset(3, 0, rep) == 1 and rep == [1, 2, 5]
    with pytest.raises(ZstdError):
        _resolve_offset(3, 0, [1, 4, 8])  # RO1 - 1 == 0 is corruption


# ---------------------------------------------------------------------------
# decoder validation
# ---------------------------------------------------------------------------
def test_rejects_bad_magic():
    with pytest.raises(ZstdError):
        zstd_decompress(b"\x00\x00\x00\x00rest")


def test_rejects_dictionary():
    # FHD: single-segment + dict-id flag 1, dict id 7
    blk = (1 | (0 << 1) | (0 << 3)).to_bytes(3, "little")
    with pytest.raises(ZstdError):
        zstd_decompress(MAGIC + bytes([0x21, 0x07, 0x00]) + blk)


def test_rejects_reserved_block_type():
    blk = (1 | (3 << 1) | (4 << 3)).to_bytes(3, "little") + b"xxxx"
    with pytest.raises(ZstdError):
        zstd_decompress(_frame(0x20, b"\x04", blk))


def test_rejects_checksum_mismatch():
    c = bytearray(zstd_compress(b"checksummed payload"))
    c[-1] ^= 0xFF
    with pytest.raises(ZstdError):
        zstd_decompress(bytes(c))


def test_rejects_content_size_mismatch():
    blk = (1 | (0 << 1) | (5 << 3)).to_bytes(3, "little") + b"hello"
    with pytest.raises(ZstdError):
        zstd_decompress(_frame(0x20, b"\x09", blk))


def test_rejects_match_beyond_output():
    """RLE-mode sequence whose first match has nothing to copy from:
    LL=0 with Offset_Value=2 resolves to initial RO3=8 > output."""
    lit_sec = bytes([0 | (0 << 3)])  # raw literals, size 0
    seq = bytes([1, 0x54, 0, 1, 0])  # 1 seq, RLE modes, LL=0 OF=1 ML=0
    seq += bytes([0x02])  # one 1-bit offset-extra = 0 -> value 2, + marker
    content = lit_sec + seq
    blk = (1 | (2 << 1) | (len(content) << 3)).to_bytes(3, "little") + content
    with pytest.raises(ZstdError):
        zstd_decompress(_frame(0x20, b"\x03", blk))


# ---------------------------------------------------------------------------
# roundtrips
# ---------------------------------------------------------------------------
def _debruijn_4_4() -> bytes:
    """de Bruijn sequence over 'abcd', order 4: every 4-gram unique, so
    the match finder finds nothing and only Huffman can compress it."""
    k, n = 4, 4
    a = [0] * k * n
    seq = []

    def db(t, p):
        if t > n:
            if n % p == 0:
                seq.extend(a[1 : p + 1])
        else:
            a[t] = a[t - p]
            db(t + 1, p)
            for j in range(a[t - p] + 1, k):
                a[t] = j
                db(t + 1, t)

    db(1, 1)
    return bytes(b"abcd"[s] for s in seq)


def test_huffman_only_compression():
    raw = _debruijn_4_4()  # 256 bytes, 4 symbols, no 4-gram repeats
    c = zstd_compress(raw)
    assert zstd_decompress(c) == raw
    assert len(c) < len(raw)  # 2-bit codes beat 8-bit bytes


def test_multiblock_roundtrip():
    raw = (b"abcdefgh" * 40000) + bytes(range(256)) * 64  # > 128 KiB
    c = zstd_compress(raw)
    assert zstd_decompress(c) == raw
    assert len(c) < len(raw) // 10


def test_text_compresses_well():
    raw = (b"select l_returnflag, sum(l_quantity) from lineitem group by 1; " * 300)
    c = zstd_compress(raw)
    assert zstd_decompress(c) == raw
    assert len(c) < len(raw) // 10


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_roundtrip_random(data):
    assert zstd_decompress(zstd_compress(data)) == data


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
    c = zstd_compress(data)
    assert zstd_decompress(c) == data
    # determinism: same input, same bytes
    assert zstd_compress(data) == c


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="etaoin shrdlu\n", min_size=0, max_size=3000))
def test_roundtrip_skewed_text(s):
    data = s.encode("utf-8")
    assert zstd_decompress(zstd_compress(data)) == data


def test_weight_gap_before_last_symbol():
    """Regression: the direct tree description lists weights for
    symbols 0..last-1 INCLUDING zeros — trimming trailing zeros shifts
    the implicit-weight symbol and silently remaps the alphabet (166
    of 500 fixture documents hit this before the fix). Alphabet
    {a, m, v, z}: the symbols between 'v' and 'z' all have weight 0,
    so the zero run sits directly before the implicit last symbol."""
    seq = _debruijn_4_4()
    raw = bytes(b"amvz"[b"abcd".index(ch)] for ch in seq)  # no 4-gram repeats
    c = zstd_compress(raw)
    assert zstd_decompress(c) == raw
    assert len(c) < len(raw)  # Huffman path actually taken
