"""Clean-room TFRecord codec + driver entry: the length-framed record
format TensorFlow training pipelines ship datasets in (the analogue of
WebDataset for the TF world) — and, with WARC / WebDataset / Avro OCF /
ORC already covered, the last of the big training-data container
formats this engine reads and writes.

Wire format (public TFRecord spec, tensorflow/core/lib/io/record_writer):

    uint64 length        (little-endian)
    uint32 masked_crc32c(length bytes)
    byte   data[length]
    uint32 masked_crc32c(data)

with CRC-32C (Castagnoli, reflected poly 0x82F63B78) and the mask
``((crc >> 15 | crc << 17) + 0xa282ead8) & 0xffffffff``. Both CRCs are
VERIFIED on read; a record whose data CRC fails is skipped and counted
(the recoverable corruption mode — framing is still trustworthy because
the length CRC held), which is exactly how a resilient reader survives
a flipped bit in a multi-terabyte shard without dropping the file.

Payload here is a fixed 16-byte struct (key int64 LE + price double
LE) followed by the priority string — so prices roundtrip bit-exactly
and the oracle can predict every byte count from the source table.

Scale design: one shard = one applyInPandas group on write, one
mapInPandas row on read — the shard is the parallelism unit, identical
to p_webdataset/q136. Reference parity: the reference engine has no
storage formats at all (SURVEY.md §0); this belongs to the driver
contract's training-data surface.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_clone_spark.catalog import table
from hive_clone_spark.registry import register

_POLY = 0x82F63B78
_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _POLY if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli). Test vector: b'123456789' -> 0xE3069283."""
    c = 0xFFFFFFFF
    for b in data:
        c = _CRC_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return ((c >> 15 | c << 17) + 0xA282EAD8) & 0xFFFFFFFF


def _frame(data: bytes) -> bytes:
    ln = struct.pack("<Q", len(data))
    return (
        ln
        + struct.pack("<I", masked_crc(ln))
        + data
        + struct.pack("<I", masked_crc(data))
    )


def encode_payload(key: int, price: float, prio: str) -> bytes:
    return struct.pack("<qd", key, price) + prio.encode()


def decode_payload(data: bytes) -> tuple[int, float, str]:
    key, price = struct.unpack_from("<qd", data, 0)
    return key, price, data[16:].decode()


def encode_tfrecord(
    rows: list[tuple[int, float, str]], corrupt_extra: bool = False
) -> bytes:
    """One shard file. With ``corrupt_extra`` a duplicate of the first
    record is appended with one payload byte flipped AFTER the CRC was
    computed — a genuine bit-rot fixture the reader must detect."""
    out = bytearray()
    for key, price, prio in rows:
        out += _frame(encode_payload(key, price, prio))
    if corrupt_extra and rows:
        data = encode_payload(*rows[0])
        ln = struct.pack("<Q", len(data))
        good_crc = struct.pack("<I", masked_crc(data))
        bad = bytes([data[0] ^ 0xFF]) + data[1:]
        out += ln + struct.pack("<I", masked_crc(ln)) + bad + good_crc
    return bytes(out)


def decode_tfrecord(
    buf: bytes,
) -> tuple[list[tuple[int, float, str]], int]:
    """Returns (rows, n_skipped). Length CRC failure is unrecoverable
    (framing lost) and raises; data CRC failure skips the record."""
    rows: list[tuple[int, float, str]] = []
    skipped = 0
    pos = 0
    while pos < len(buf):
        if pos + 12 > len(buf):
            raise ValueError("tfrecord: trailing bytes")
        ln_bytes = buf[pos : pos + 8]
        (ln,) = struct.unpack("<Q", ln_bytes)
        (lcrc,) = struct.unpack_from("<I", buf, pos + 8)
        if lcrc != masked_crc(ln_bytes):
            raise ValueError("tfrecord: length CRC mismatch — framing lost")
        data = buf[pos + 12 : pos + 12 + ln]
        (dcrc,) = struct.unpack_from("<I", buf, pos + 12 + ln)
        if dcrc != masked_crc(data):
            skipped += 1
        else:
            rows.append(decode_payload(data))
        pos += 12 + ln + 4
    if pos != len(buf):
        raise ValueError("tfrecord: trailing bytes")
    return rows, skipped


_TF_SHARDS = 8


@register(
    "p_tfrecord_roundtrip",
    oracle=f"""
    WITH agg AS (
      SELECT o_orderpriority AS priority,
        CAST(COUNT(*) AS BIGINT) AS n_records,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price,
        CAST(SUM(16 + length(o_orderpriority)) AS BIGINT)
          AS payload_bytes
      FROM orders GROUP BY o_orderpriority)
    SELECT priority, n_records, sum_price, payload_bytes,
      CAST({_TF_SHARDS} AS BIGINT) AS n_corrupt_skipped
    FROM agg ORDER BY priority
    """,
)
def p_tfrecord_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> 8 TFRecord shards (one planted bit-rot record each)
    -> distributed decode with CRC verification -> census. The oracle
    predicts counts, bit-exact price sums, payload byte totals, AND
    that exactly one corrupt record per shard was detected+skipped."""
    import pandas as pd

    from pyspark import cloudpickle as _cp
    import hive_clone_spark.sources.tfrecord as _mod

    _cp.register_pickle_by_value(_mod)

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    sharded = o.withColumn(
        "shard", (F.col("o_orderkey") % _TF_SHARDS).cast("int")
    )

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        rows = sorted(
            zip(
                (int(k) for k in pdf["o_orderkey"]),
                (float(p) for p in pdf["o_totalprice"]),
                pdf["o_orderpriority"],
            )
        )
        return pd.DataFrame(
            {
                "shard": [shard],
                "payload": [encode_tfrecord(rows, corrupt_extra=True)],
            }
        )

    files = sharded.groupBy("shard").applyInPandas(
        encode_group, "shard INT, payload BINARY"
    )

    def decode_batches(batches):
        for pdf in batches:
            out = []
            for shard, payload in zip(pdf["shard"], pdf["payload"]):
                rows, skipped = decode_tfrecord(bytes(payload))
                out.extend(
                    (int(shard), k, pr, pc, skipped) for k, pc, pr in rows
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "shard",
                    "o_orderkey",
                    "o_orderpriority",
                    "o_totalprice",
                    "skipped_in_shard",
                ],
            )

    decoded = files.mapInPandas(
        decode_batches,
        "shard INT, o_orderkey BIGINT, o_orderpriority STRING, "
        "o_totalprice DOUBLE, skipped_in_shard BIGINT",
    )
    ns = (
        decoded.groupBy("shard")
        .agg(F.first("skipped_in_shard").alias("s"))
        .agg(F.sum("s").cast("long").alias("n_corrupt_skipped"))
    )
    agg = decoded.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").cast("bigint").alias("n_records"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.sum(16 + F.length("o_orderpriority"))
        .cast("bigint")
        .alias("payload_bytes"),
    )
    return agg.crossJoin(F.broadcast(ns)).orderBy("priority")
