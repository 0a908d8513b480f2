"""Clean-room Avro Object Container File (OCF) codec — the row-major
interchange format half the Hadoop estate still ships data in, and the
third source format in the repo's FORMATS family (parquet, ORC, CSV,
JSON, WARC, WebDataset/tar, + the media codecs).

Implemented from the PUBLIC Avro 1.11 spec only (no avro library in
the container — and the point is the byte-level format contract):

  * header: magic ``Obj\\x01``, file-metadata map (``avro.schema`` =
    the record schema JSON, ``avro.codec`` = ``deflate``), then a
    16-byte sync marker;
  * data blocks: object count (zigzag-varint long), byte size of the
    serialized objects (zigzag-varint long), the RAW-DEFLATE block
    payload, then the sync marker again — the marker is what makes the
    format SPLITTABLE (a reader seeks anywhere and scans forward to
    the next marker);
  * primitives: long = zigzag + base-128 varint (little-endian, high
    bit continues), string = long length + UTF-8 bytes, double =
    8 bytes IEEE little-endian.

Scale design: encode is one applyInPandas per shard group (shards are
the parallelism unit, like production Avro landing zones where each
writer task owns a file); decode is a mapInPandas over shard blobs —
block-at-a-time streaming, never materializing a whole file's rows in
one list beyond the shard (bounded by construction). At 100 TB the
shard count scales with the data and both stages stay embarrassingly
parallel; the sync-marker walk is exactly how Spark's own Avro reader
splits files mid-stream.

Reference parity: the reference has no serialization layer (SURVEY.md
§1); this is driver-contract FORMATS surface.
"""

from __future__ import annotations

import json
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_clone_spark.catalog import table
from hive_clone_spark.registry import register

_MAGIC = b"Obj\x01"
_SHARDS = 8
_BLOCK_ROWS = 256

_SCHEMA_JSON = json.dumps(
    {
        "type": "record",
        "name": "order",
        "fields": [
            {"name": "o_orderkey", "type": "long"},
            {"name": "o_orderpriority", "type": "string"},
            {"name": "o_totalprice", "type": "double"},
        ],
    },
    separators=(",", ":"),
)


# -- primitive encoders (Avro 1.11 spec §binary encoding) ---------------
def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def enc_long(n: int) -> bytes:
    u = _zigzag(n)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def dec_long(buf: bytes, pos: int) -> tuple[int, int]:
    u, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(u), pos
        shift += 7


def enc_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return enc_long(len(b)) + b


def dec_string(buf: bytes, pos: int) -> tuple[str, int]:
    n, pos = dec_long(buf, pos)
    return buf[pos : pos + n].decode("utf-8"), pos + n


def enc_double(x: float) -> bytes:
    return struct.pack("<d", x)


def dec_double(buf: bytes, pos: int) -> tuple[float, int]:
    return struct.unpack_from("<d", buf, pos)[0], pos + 8


def _sync_marker(shard: int) -> bytes:
    import hashlib

    return hashlib.md5(f"avro-shard-{shard}".encode()).digest()


# -- container encode / decode ------------------------------------------
def encode_ocf(shard: int, rows: list[tuple[int, str, float]]) -> bytes:
    """One OCF file: header + deflate blocks of _BLOCK_ROWS records."""
    sync = _sync_marker(shard)
    out = bytearray(_MAGIC)
    # file-metadata map: one count-prefixed block of entries, then 0
    meta = [("avro.schema", _SCHEMA_JSON), ("avro.codec", "deflate")]
    out += enc_long(len(meta))
    for k, v in meta:
        out += enc_string(k)
        vb = v.encode("utf-8")
        out += enc_long(len(vb)) + vb
    out += enc_long(0)
    out += sync
    for i in range(0, len(rows), _BLOCK_ROWS):
        block = rows[i : i + _BLOCK_ROWS]
        body = bytearray()
        for key, prio, price in block:
            body += enc_long(key)
            body += enc_string(prio)
            body += enc_double(price)
        # avro "deflate" codec = RAW deflate (no zlib header/checksum)
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        payload = comp.compress(bytes(body)) + comp.flush()
        out += enc_long(len(block))
        out += enc_long(len(payload))
        out += payload
        out += sync
    return bytes(out)


def decode_ocf(buf: bytes) -> tuple[list[tuple[int, str, float]], int]:
    """Parse one OCF file; returns (rows, n_blocks). Verifies magic,
    schema, codec, and EVERY block's sync marker (a framing slip —
    wrong varint width, bad deflate length — desyncs immediately)."""
    if buf[:4] != _MAGIC:
        raise ValueError("avro: bad magic")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = dec_long(buf, pos)
        if n == 0:
            break
        if n < 0:  # negative count variant: size follows (spec)
            _, pos = dec_long(buf, pos)
            n = -n
        for _ in range(n):
            k, pos = dec_string(buf, pos)
            ln, pos = dec_long(buf, pos)
            meta[k] = buf[pos : pos + ln]
            pos += ln
    if json.loads(meta["avro.schema"]) != json.loads(_SCHEMA_JSON):
        raise ValueError("avro: unexpected schema")
    codec = meta.get("avro.codec", b"null").decode()
    if codec != "deflate":
        raise ValueError(f"avro: unsupported codec {codec!r}")
    sync = buf[pos : pos + 16]
    pos += 16
    rows: list[tuple[int, str, float]] = []
    n_blocks = 0
    while pos < len(buf):
        count, pos = dec_long(buf, pos)
        size, pos = dec_long(buf, pos)
        body = zlib.decompress(buf[pos : pos + size], -15)
        pos += size
        if buf[pos : pos + 16] != sync:
            raise ValueError("avro: sync marker mismatch")
        pos += 16
        bp = 0
        for _ in range(count):
            key, bp = dec_long(body, bp)
            prio, bp = dec_string(body, bp)
            price, bp = dec_double(body, bp)
            rows.append((key, prio, price))
        if bp != len(body):
            raise ValueError("avro: trailing bytes in block")
        n_blocks += 1
    return rows, n_blocks


# ---------------------------------------------------------------------------
# Q136 — Avro OCF roundtrip: orders -> 8 shard files encoded
# distributed (applyInPandas per shard), decoded distributed
# (mapInPandas over the blobs), then aggregated. The oracle predicts
# the per-priority census AND the total block count from the
# construction rule (ceil(shard_rows / 256) summed over shards), so a
# mis-framed varint, a dropped block, a wrong shard assignment, or a
# lossy double roundtrip all fail the hash. Prices survive the
# byte-level double roundtrip EXACTLY (IEEE bits in, IEEE bits out).
# ---------------------------------------------------------------------------
@register(
    "q136_avro_roundtrip",
    oracle=f"""
    WITH shard AS (
      SELECT o_orderkey % {_SHARDS} AS s, COUNT(*) AS c
      FROM orders GROUP BY s),
    blocks AS (
      SELECT CAST(SUM((c + {_BLOCK_ROWS - 1}) // {_BLOCK_ROWS}) AS BIGINT)
        AS nb FROM shard),
    agg AS (
      SELECT o_orderpriority AS priority,
        CAST(COUNT(*) AS BIGINT) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY o_orderpriority)
    SELECT priority, n_orders, sum_price, nb AS n_blocks
    FROM agg, blocks ORDER BY priority
    """,
)
def q136_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from pyspark import cloudpickle as _cp
    import hive_clone_spark.sources.avro as _mod

    _cp.register_pickle_by_value(_mod)

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    sharded = o.withColumn("shard", (F.col("o_orderkey") % _SHARDS).cast("int"))

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        rows = sorted(
            zip(
                (int(k) for k in pdf["o_orderkey"]),
                pdf["o_orderpriority"],
                (float(p) for p in pdf["o_totalprice"]),
            )
        )
        return pd.DataFrame(
            {"shard": [shard], "payload": [encode_ocf(shard, rows)]}
        )

    files = sharded.groupBy("shard").applyInPandas(
        encode_group, "shard INT, payload BINARY"
    )

    def decode_batches(batches):
        for pdf in batches:
            out = []
            for shard, payload in zip(pdf["shard"], pdf["payload"]):
                rows, n_blocks = decode_ocf(bytes(payload))
                out.extend(
                    (int(shard), k, pr, pc, n_blocks) for k, pr, pc in rows
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "shard",
                    "o_orderkey",
                    "o_orderpriority",
                    "o_totalprice",
                    "blocks_in_shard",
                ],
            )

    decoded = files.mapInPandas(
        decode_batches,
        "shard INT, o_orderkey BIGINT, o_orderpriority STRING, "
        "o_totalprice DOUBLE, blocks_in_shard BIGINT",
    )
    # total blocks: each shard reports its count on every row — take it
    # once per shard, then sum (tiny: _SHARDS rows)
    nb = (
        decoded.groupBy("shard")
        .agg(F.first("blocks_in_shard").alias("b"))
        .agg(F.sum("b").cast("long").alias("n_blocks"))
    )
    agg = decoded.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )
    return agg.crossJoin(F.broadcast(nb)).orderBy("priority")
