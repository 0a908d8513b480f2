"""Clean-room LZ4 block-format codec + driver entry: the compression
format training-data shards and columnar file pages actually ship in
(Parquet's default codec family, WebDataset-over-object-store's usual
wrapper). With the container formats covered (WARC / WebDataset /
Avro OCF / TFRecord / ORC), this adds the COMPRESSION layer those
containers sit on — encode and decode both implemented from the public
block spec (lz4/doc/lz4_Block_format.md), no external lz4 library.

Block format (public spec):

    sequence := token | [lit-len 255-bytes] | literals
                | offset(2B LE) | [match-len 255-bytes]
    token    := (literal_len:4bit << 4) | (match_len - 4):4bit
                (nibble 15 => extended with 255-run bytes)

End-of-block rules (spec "End of block restrictions"): the last
sequence is literals-only; the last match must start >= 12 bytes
before the end; the last 5 bytes are always literals. Matches are
4+ bytes at offsets 1..65535; offset < match length is legal and
means self-overlapping replication (the RLE case) — the decoder
copies byte-by-byte for exactly that reason.

The encoder is a deterministic greedy parser (hash-chain of 4-byte
prefixes, most-recent candidate wins, every scanned position
inserted), so compressed bytes are reproducible across runs/workers —
which is what lets tests pin roundtrips and ratios.

Scale design: one document = one row through an Arrow-batched
mapInPandas (the codec-family shape: spread() pins parallelism past
the driver's 1-split testdata scan). At 100 TB the same kernel runs
per page/shard; nothing here holds more than one payload in memory.
Reference parity: the reference engine (SURVEY.md §0) has no storage
or compression layer; this belongs to the driver contract's
training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_clone_spark.catalog import table
from hive_clone_spark.registry import register

_MIN_MATCH = 4
_MFLIMIT = 12  # last match must start >= 12 bytes before block end
_LAST_LITERALS = 5
_MAX_OFFSET = 65535
_HASH_MUL = 2654435761
_HASH_BITS = 16


def _hash4(u32: int) -> int:
    return ((u32 * _HASH_MUL) & 0xFFFFFFFF) >> (32 - _HASH_BITS)


def _u32at(data: bytes, i: int) -> int:
    return (
        data[i]
        | (data[i + 1] << 8)
        | (data[i + 2] << 16)
        | (data[i + 3] << 24)
    )


def _emit_len(n: int) -> bytes:
    """Extended-length 255-run bytes for a nibble that hit 15."""
    out = bytearray()
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)
    return bytes(out)


def lz4_compress(data: bytes) -> bytes:
    """Greedy LZ4 block encode (deterministic). Any input; output obeys
    the spec's end-of-block restrictions so third-party decoders accept
    it."""
    n = len(data)
    out = bytearray()
    if n == 0:
        out.append(0)  # one empty-literals sequence
        return bytes(out)
    table: dict[int, int] = {}
    anchor = 0
    i = 0
    match_limit = n - _MFLIMIT
    while i <= match_limit and i + _MIN_MATCH <= n:
        h = _hash4(_u32at(data, i))
        cand = table.get(h, -1)
        table[h] = i
        if (
            cand >= 0
            and i - cand <= _MAX_OFFSET
            and data[cand : cand + _MIN_MATCH] == data[i : i + _MIN_MATCH]
        ):
            # extend the match forward, but never into the last 5 bytes
            end_cap = n - _LAST_LITERALS
            mlen = _MIN_MATCH
            while i + mlen < end_cap and data[cand + mlen] == data[i + mlen]:
                mlen += 1
            lit = data[anchor:i]
            lit_n = len(lit)
            ml_code = mlen - _MIN_MATCH
            token = (min(lit_n, 15) << 4) | min(ml_code, 15)
            out.append(token)
            if lit_n >= 15:
                out += _emit_len(lit_n - 15)
            out += lit
            off = i - cand
            out.append(off & 0xFF)
            out.append(off >> 8)
            if ml_code >= 15:
                out += _emit_len(ml_code - 15)
            i += mlen
            anchor = i
        else:
            i += 1
    # final literals-only sequence
    lit = data[anchor:]
    lit_n = len(lit)
    out.append(min(lit_n, 15) << 4)
    if lit_n >= 15:
        out += _emit_len(lit_n - 15)
    out += lit
    return bytes(out)


def lz4_decompress(comp: bytes) -> bytes:
    """LZ4 block decode. Raises ValueError on malformed input. The
    match copy is byte-by-byte so offset < match-length overlap
    (self-replicating runs) decodes per spec."""
    out = bytearray()
    i = 0
    n = len(comp)
    while i < n:
        token = comp[i]
        i += 1
        lit_n = token >> 4
        if lit_n == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated literal length")
                b = comp[i]
                i += 1
                lit_n += b
                if b != 255:
                    break
        if i + lit_n > n:
            raise ValueError("lz4: truncated literals")
        out += comp[i : i + lit_n]
        i += lit_n
        if i == n:
            break  # last sequence is literals-only
        if i + 2 > n:
            raise ValueError("lz4: truncated offset")
        off = comp[i] | (comp[i + 1] << 8)
        i += 2
        if off == 0 or off > len(out):
            raise ValueError("lz4: invalid offset")
        mlen = (token & 0xF) + _MIN_MATCH
        if (token & 0xF) == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated match length")
                b = comp[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        src = len(out) - off
        for k in range(mlen):
            out.append(out[src + k])
    return bytes(out)


@register(
    "p_lz4_roundtrip",
    oracle="""
    SELECT doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS orig_len,
      CAST(octet_length(encode(text)) AS BIGINT) AS decoded_len,
      md5(text) AS decoded_md5,
      TRUE AS roundtrip_ok
    FROM documents ORDER BY doc_id
    """,
)
def p_lz4_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> distributed LZ4 encode -> distributed decode ->
    per-doc census. The oracle predicts byte length and md5 of every
    decoded payload from the source table (the decode must be
    bit-exact); the compressed size is encoder-defined and therefore
    asserted in tests (deterministic greedy => reproducible), not
    hashed against DuckDB."""
    import hashlib

    import pandas as pd

    from pyspark import cloudpickle as _cp

    import hive_clone_spark.sources.lz4 as _mod
    from hive_clone_spark.pipeline.common import spread

    _cp.register_pickle_by_value(_mod)

    d = spread(table(spark, sf_dir, "documents").select("doc_id", "text"))

    def codec_batches(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = str(text).encode("utf-8")
                comp = lz4_compress(raw)
                back = lz4_decompress(comp)
                rows.append(
                    (
                        int(doc_id),
                        len(raw),
                        len(back),
                        hashlib.md5(back).hexdigest(),
                        back == raw,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "orig_len",
                    "decoded_len",
                    "decoded_md5",
                    "roundtrip_ok",
                ],
            )

    return d.mapInPandas(
        codec_batches,
        "doc_id BIGINT, orig_len BIGINT, decoded_len BIGINT, "
        "decoded_md5 STRING, roundtrip_ok BOOLEAN",
    ).orderBy("doc_id")
