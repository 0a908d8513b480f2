"""Clean-room MessagePack codec (msgpack.org spec) + a distributed
roundtrip entry whose encoded SIZE the DuckDB oracle predicts exactly.

MessagePack is the wire format of choice for feature stores, RPC
payloads, and event buses feeding a lakehouse — an engine ingesting
"binary blob" columns at 100 TB needs to parse it where the data
lives (executor-side, Arrow-batched), never on a driver. This module
implements the format family actually seen in those payloads:

  nil / bool            c0, c2, c3
  ints                  positive fixint, negfixint (e0-ff),
                        uint8/16/32/64 (cc-cf), int8/16/32/64 (d0-d3)
  float64               cb (Python floats are doubles; float32 is
                        decode-only, ca)
  str                   fixstr (a0-bf), str8 (d9), str16 (da), str32 (db)
  bin                   bin8 (c4), bin16 (c5), bin32 (c6)
  array                 fixarray (90-9f), array16 (dc), array32 (dd)
  map                   fixmap (80-8f), map16 (de), map32 (df)

The encoder is CANONICAL: every value takes its smallest
representation — which makes the encoded byte count a pure function
of the data, so an SQL oracle can predict it to the byte (the
p_postings_varint verification strategy: the engine earns the bytes
by packing them; the oracle derives the count arithmetically).

Clean-room: written from the public format spec
(github.com/msgpack/msgpack/blob/master/spec.md); no reference to any
msgpack library source.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession

from hive_clone_spark.catalog import table
from hive_clone_spark.registry import register


class MsgpackError(ValueError):
    pass


def _encode_int(n: int, out: bytearray) -> None:
    if 0 <= n <= 0x7F:
        out.append(n)
    elif -32 <= n < 0:
        out.append(0x100 + n)  # 111xxxxx negative fixint
    elif 0 <= n <= 0xFF:
        out += b"\xcc" + bytes([n])
    elif 0 <= n <= 0xFFFF:
        out += b"\xcd" + n.to_bytes(2, "big")
    elif 0 <= n <= 0xFFFFFFFF:
        out += b"\xce" + n.to_bytes(4, "big")
    elif 0 <= n <= 0xFFFFFFFFFFFFFFFF:
        out += b"\xcf" + n.to_bytes(8, "big")
    elif -0x80 <= n < 0:
        out += b"\xd0" + n.to_bytes(1, "big", signed=True)
    elif -0x8000 <= n < 0:
        out += b"\xd1" + n.to_bytes(2, "big", signed=True)
    elif -0x80000000 <= n < 0:
        out += b"\xd2" + n.to_bytes(4, "big", signed=True)
    elif -0x8000000000000000 <= n < 0:
        out += b"\xd3" + n.to_bytes(8, "big", signed=True)
    else:
        raise MsgpackError(f"int out of 64-bit range: {n}")


def _encode_str(s: str, out: bytearray) -> None:
    b = s.encode("utf-8")
    n = len(b)
    if n <= 31:
        out.append(0xA0 | n)
    elif n <= 0xFF:
        out += b"\xd9" + bytes([n])
    elif n <= 0xFFFF:
        out += b"\xda" + n.to_bytes(2, "big")
    else:
        out += b"\xdb" + n.to_bytes(4, "big")
    out += b


def _encode(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        _encode_int(obj, out)
    elif isinstance(obj, float):
        out += b"\xcb" + struct.pack(">d", obj)
    elif isinstance(obj, str):
        _encode_str(obj, out)
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n <= 0xFF:
            out += b"\xc4" + bytes([n])
        elif n <= 0xFFFF:
            out += b"\xc5" + n.to_bytes(2, "big")
        else:
            out += b"\xc6" + n.to_bytes(4, "big")
        out += bytes(obj)
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += b"\xdc" + n.to_bytes(2, "big")
        else:
            out += b"\xdd" + n.to_bytes(4, "big")
        for v in obj:
            _encode(v, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += b"\xde" + n.to_bytes(2, "big")
        else:
            out += b"\xdf" + n.to_bytes(4, "big")
        for k, v in obj.items():
            _encode(k, out)
            _encode(v, out)
    else:
        raise MsgpackError(f"unsupported type: {type(obj).__name__}")


def msgpack_encode(obj) -> bytes:
    out = bytearray()
    _encode(obj, out)
    return bytes(out)


def _decode(buf: bytes, pos: int):
    if pos >= len(buf):
        raise MsgpackError("truncated")
    b = buf[pos]
    pos += 1
    if b <= 0x7F:
        return b, pos
    if b >= 0xE0:
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:
        return _decode_map(buf, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:
        return _decode_array(buf, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:
        n = b & 0x1F
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b == 0xC4:
        n = buf[pos]
        return bytes(buf[pos + 1 : pos + 1 + n]), pos + 1 + n
    if b == 0xC5:
        n = int.from_bytes(buf[pos : pos + 2], "big")
        return bytes(buf[pos + 2 : pos + 2 + n]), pos + 2 + n
    if b == 0xC6:
        n = int.from_bytes(buf[pos : pos + 4], "big")
        return bytes(buf[pos + 4 : pos + 4 + n]), pos + 4 + n
    if b == 0xCA:
        return struct.unpack(">f", buf[pos : pos + 4])[0], pos + 4
    if b == 0xCB:
        return struct.unpack(">d", buf[pos : pos + 8])[0], pos + 8
    if b == 0xCC:
        return buf[pos], pos + 1
    if b == 0xCD:
        return int.from_bytes(buf[pos : pos + 2], "big"), pos + 2
    if b == 0xCE:
        return int.from_bytes(buf[pos : pos + 4], "big"), pos + 4
    if b == 0xCF:
        return int.from_bytes(buf[pos : pos + 8], "big"), pos + 8
    if b == 0xD0:
        return int.from_bytes(buf[pos : pos + 1], "big", signed=True), pos + 1
    if b == 0xD1:
        return int.from_bytes(buf[pos : pos + 2], "big", signed=True), pos + 2
    if b == 0xD2:
        return int.from_bytes(buf[pos : pos + 4], "big", signed=True), pos + 4
    if b == 0xD3:
        return int.from_bytes(buf[pos : pos + 8], "big", signed=True), pos + 8
    if b == 0xD9:
        n = buf[pos]
        return buf[pos + 1 : pos + 1 + n].decode("utf-8"), pos + 1 + n
    if b == 0xDA:
        n = int.from_bytes(buf[pos : pos + 2], "big")
        return buf[pos + 2 : pos + 2 + n].decode("utf-8"), pos + 2 + n
    if b == 0xDB:
        n = int.from_bytes(buf[pos : pos + 4], "big")
        return buf[pos + 4 : pos + 4 + n].decode("utf-8"), pos + 4 + n
    if b == 0xDC:
        n = int.from_bytes(buf[pos : pos + 2], "big")
        return _decode_array(buf, pos + 2, n)
    if b == 0xDD:
        n = int.from_bytes(buf[pos : pos + 4], "big")
        return _decode_array(buf, pos + 4, n)
    if b == 0xDE:
        n = int.from_bytes(buf[pos : pos + 2], "big")
        return _decode_map(buf, pos + 2, n)
    if b == 0xDF:
        n = int.from_bytes(buf[pos : pos + 4], "big")
        return _decode_map(buf, pos + 4, n)
    raise MsgpackError(f"unsupported marker 0x{b:02x}")


def _decode_array(buf: bytes, pos: int, n: int):
    items = []
    for _ in range(n):
        v, pos = _decode(buf, pos)
        items.append(v)
    return items, pos


def _decode_map(buf: bytes, pos: int, n: int):
    d = {}
    for _ in range(n):
        k, pos = _decode(buf, pos)
        v, pos = _decode(buf, pos)
        d[k] = v
    return d, pos


def msgpack_decode(buf: bytes):
    obj, pos = _decode(buf, 0)
    if pos != len(buf):
        raise MsgpackError(f"{len(buf) - pos} trailing bytes")
    return obj


# ---------------------------------------------------------------------------
# p_msgpack_roundtrip: encode one record per document (the feature-
# payload shape: ints of varying widths, short and long strings, a
# word list), decode it back, and census the results. The oracle
# predicts the EXACT encoded byte count per document from the field
# values — the canonical-encoding width rules (fixint/uint8/uint16,
# fixstr/str8, fixmap/fixarray headers) transcribed into SQL CASEs —
# so a single wasted byte anywhere in the encoder breaks the hash.
# Roundtrip equality pins the decoder to the same bytes.
#
# Scale design: encode+decode run inside one mapInPandas pass
# (Arrow-batched, spread() pins parallelism); at 100 TB each executor
# packs its own partition and nothing but the bounded census
# shuffles. The codec module ships by value (workers lack the repo
# on sys.path — the lz4/avro discipline).
# ---------------------------------------------------------------------------
_HEAD_CHARS = 40
_N_WORDS = 3

_SQL_INT_SZ = (
    "CASE WHEN {v} < 128 THEN 1 WHEN {v} < 256 THEN 2 "
    "WHEN {v} < 65536 THEN 3 WHEN {v} < 4294967296 THEN 5 ELSE 9 END"
)
_SQL_STR_SZ = (  # strlen() is BYTE length in DuckDB (UTF-8 code units)
    "CASE WHEN strlen({s}) < 32 THEN 1 + strlen({s}) "
    "WHEN strlen({s}) < 256 THEN 2 + strlen({s}) "
    "ELSE 3 + strlen({s}) END"
)


@register(
    "p_msgpack_roundtrip",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang, source, n_chars,
        substr(text, 1, {_HEAD_CHARS}) AS head,
        list_slice(list_filter(str_split_regex(text, '\\s+'),
                               w -> w <> ''), 1, {_N_WORDS}) AS ws
      FROM documents),
    sized AS (
      SELECT doc_id, lang,
        1                                              -- fixmap(6)
        + (1 + 2) + {_SQL_INT_SZ.format(v="doc_id")}   -- "id"
        + (1 + 4) + {_SQL_STR_SZ.format(s="lang")}     -- "lang"
        + (1 + 3) + {_SQL_STR_SZ.format(s="source")}   -- "src"
        + (1 + 1) + {_SQL_INT_SZ.format(v="n_chars")}  -- "n"
        + (1 + 4) + {_SQL_STR_SZ.format(s="head")}     -- "head"
        + (1 + 5) + 1                                  -- "words" fixarray
        + CAST(list_sum(list_concat(LIST_VALUE(0),
            list_transform(ws, w -> {_SQL_STR_SZ.format(s="w")})))
            AS BIGINT) AS encoded_len
      FROM base)
    SELECT doc_id, lang, CAST(encoded_len AS BIGINT) AS encoded_len,
      TRUE AS roundtrip_ok
    FROM sized ORDER BY doc_id
    """,
)
def p_msgpack_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from pyspark import cloudpickle as _cp

    import hive_clone_spark.sources.msgpack as _mod
    from hive_clone_spark.pipeline.common import spread

    _cp.register_pickle_by_value(_mod)

    d = spread(
        table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source", "n_chars"
        )
    )

    def codec_batches(batches):
        for pdf in batches:
            rows = []
            for doc_id, text, lang, source, n_chars in zip(
                pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"],
                pdf["n_chars"],
            ):
                rec = {
                    "id": int(doc_id),
                    "lang": str(lang),
                    "src": str(source),
                    "n": int(n_chars),
                    "head": str(text)[:_HEAD_CHARS],
                    "words": str(text).split()[:_N_WORDS],
                }
                buf = msgpack_encode(rec)
                rows.append(
                    (
                        int(doc_id),
                        str(lang),
                        len(buf),
                        msgpack_decode(buf) == rec,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "lang", "encoded_len", "roundtrip_ok"],
            )

    return d.mapInPandas(
        codec_batches,
        "doc_id BIGINT, lang STRING, encoded_len BIGINT, roundtrip_ok BOOLEAN",
    ).orderBy("doc_id")
