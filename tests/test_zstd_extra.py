"""Zstandard decoder branches the deterministic encoder never emits:
FSE-compressed Huffman weight descriptions (two interleaved states,
overflow termination) and Treeless literals (table reuse across blocks
in a frame). Vectors are handcrafted; the weight-FSE state cells are
located via the module's own table builder, which the direct-weight
vectors in test_zstd.py pin independently."""

from __future__ import annotations

import pytest

from hive_clone_spark.sources.zstd import (
    ZstdError,
    _BitWriter,
    _FseTable,
    zstd_compress,
    zstd_decompress,
)

MAGIC = (0xFD2FB528).to_bytes(4, "little")


def _frame(fhd: int, fcs: bytes, blocks: bytes) -> bytes:
    return MAGIC + bytes([fhd]) + fcs + blocks


def _fse_weight_description() -> bytes:
    """Weight table {symbol 1: 16/32, symbol 2: 16/32} at AL=5, then a
    two-state stream decoding exactly the weight list [2, 1] (implicit
    last weight completes: a=2, b=1, c=1 -> 1-bit 'a', 2-bit 'b','c').

    ncount bit layout (forward, LSB-first), derived by hand from RFC
    8878 4.1.1: AL nibble 0 (=5), symbol0 value 1 in 5 bits (short
    form, count 0), zero-repeat flag 0 in 2 bits, symbol1 value 17 in
    5 bits (short form, count 16; threshold drops to 16 after),
    symbol2 value 31 in 5 bits (long form: low-4 bits 15 >= cap 14,
    count = 31 - 14 - 1 = 16)."""
    bits = [(0, 4), (1, 5), (0, 2), (17, 5), (31, 5)]
    acc = 0
    pos = 0
    for v, n in bits:
        acc |= v << pos
        pos += n
    ncount = acc.to_bytes((pos + 7) // 8, "little")  # 3 bytes
    tbl = _FseTable([0, 16, 16], 5)
    s1 = tbl.sym.index(2)  # first cell decoding weight-symbol 2
    s2 = tbl.sym.index(1)
    # decode order: init s1 (5 bits), init s2 (5 bits); the first state
    # update (1 bit) overflows the stream, so exactly [2, 1] decodes
    bw = _BitWriter()
    bw.write(s2, 5)  # reversed decode order
    bw.write(s1, 5)
    stream = bw.close()
    return ncount + stream


def test_decode_fse_compressed_weights():
    body = _fse_weight_description()
    tree = bytes([len(body)]) + body  # headerByte < 128: FSE form
    # weight list [2, 1] covers byte symbols 0 and 1; the implicit
    # last symbol is byte 2. Codes: sym0 = 1-bit '1', sym1 = '00',
    # sym2 = '01'. Literals \x00\x00\x01 -> decode-order fields
    # [1, 1, 00] -> writer reversed.
    bw = _BitWriter()
    bw.write(0, 2)  # sym1
    bw.write(1, 1)  # sym0
    bw.write(1, 1)  # sym0
    stream = bw.close()
    co = len(tree) + len(stream)
    h = 2 | (0 << 2) | (3 << 4) | (co << 14)
    lit_sec = h.to_bytes(3, "little") + tree + stream
    content = lit_sec + b"\x00"
    blk = (1 | (2 << 1) | (len(content) << 3)).to_bytes(3, "little") + content
    assert zstd_decompress(_frame(0x20, b"\x03", blk)) == bytes([0, 0, 1])


def test_decode_treeless_literals_reuse_previous_table():
    """Two compressed blocks: the first carries a direct-weight tree
    (1-bit codes a=0, b=1, the test_zstd.py 'abba' vector), the second
    is Treeless and must reuse it."""
    tree = bytes([127 + 98]) + bytes(48) + bytes([0x01])
    stream = bytes([0x16])  # a,b,b,a
    co1 = len(tree) + len(stream)
    h1 = 2 | (0 << 2) | (4 << 4) | (co1 << 14)
    blk1_content = h1.to_bytes(3, "little") + tree + stream + b"\x00"
    blk1 = (0 | (2 << 1) | (len(blk1_content) << 3)).to_bytes(3, "little") + blk1_content
    # treeless: type 3, same single stream, no tree description
    bw = _BitWriter()
    for code in (1, 0, 1):  # decode order b,a,b -> write reversed
        bw.write(code, 1)
    s2 = bw.close()
    h2 = 3 | (0 << 2) | (3 << 4) | (len(s2) << 14)
    blk2_content = h2.to_bytes(3, "little") + s2 + b"\x00"
    blk2 = (1 | (2 << 1) | (len(blk2_content) << 3)).to_bytes(3, "little") + blk2_content
    assert zstd_decompress(_frame(0x20, b"\x07", blk1 + blk2)) == b"abbabab"


def test_treeless_without_previous_table_rejected():
    bw = _BitWriter()
    bw.write(0, 1)
    s = bw.close()
    h = 3 | (0 << 2) | (1 << 4) | (len(s) << 14)
    content = h.to_bytes(3, "little") + s + b"\x00"
    blk = (1 | (2 << 1) | (len(content) << 3)).to_bytes(3, "little") + content
    with pytest.raises(ZstdError):
        zstd_decompress(_frame(0x20, b"\x01", blk))


def test_four_stream_huffman_roundtrip():
    """Literals > 1023 with few matches force the encoder's 4-stream
    Huffman path (jump table + split regenerated sizes)."""
    # deterministic 16-symbol text with sparse 4-gram repeats
    raw = bytes(b"abcdefghijklmnop"[(i * i * 31 + i * 7) % 16] for i in range(4000))
    c = zstd_compress(raw)
    assert zstd_decompress(c) == raw
    assert len(c) < len(raw)  # 4-bit entropy vs 8-bit bytes
