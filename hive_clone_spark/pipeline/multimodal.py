"""Multimodal binary-column operators (M5).

Images/audio/video are modeled as opaque `binary` columns plus typed
metadata. The container has no image/audio libs, so the decode step is
a STUB (deterministic fake decoder) — but the Spark-side plumbing is
real: binary columns from built-in `encode`, typed metadata extraction
as column expressions (oracle-checked), and an Arrow-batched
`mapInPandas` decode pass with a real output schema (rows-only check).

At 100 TB the mapInPandas stage is the pattern that matters: Arrow
batches of (id, bytes) flow into Python once, per-batch decode happens
vectorized, and the narrow typed output (not the bytes) flows back.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_clone_spark.catalog import table
from hive_clone_spark.registry import register

# ---------------------------------------------------------------------------
# binary metadata extraction — pure column expressions, oracle-checked
# ---------------------------------------------------------------------------
@register(
    "p_multimodal_meta",
    oracle="""
    SELECT doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      md5(text) AS content_md5,
      CAST(1 + (('0x' || substr(md5(text), 1, 7))::BIGINT % 1920) AS INT) AS fake_width,
      CAST(1 + (('0x' || substr(md5(text), 9, 7))::BIGINT % 1080) AS INT) AS fake_height
    FROM documents ORDER BY doc_id
    """,
)
def p_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat utf-8 text bytes as an opaque payload; extract typed
    metadata (size, checksum, fake decoded dimensions) JVM-side."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    md5 = F.md5(F.col("text"))
    width = (
        F.lit(1)
        + F.conv(F.substring(md5, 1, 7), 16, 10).cast("long") % 1920
    ).cast("int")
    height = (
        F.lit(1)
        + F.conv(F.substring(md5, 9, 7), 16, 10).cast("long") % 1080
    ).cast("int")
    return (
        d.select(
            "doc_id",
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            md5.alias("content_md5"),
            width.alias("fake_width"),
            height.alias("fake_height"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# decode / feature-extract via mapInPandas — the real scale plumbing
# with a stubbed decoder (rows-only driver check: no oracle entry)
# ---------------------------------------------------------------------------
DECODE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, fake_width INT, fake_height INT, "
    "n_frames INT, mean_byte DOUBLE"
)


def decode_binary(payload: bytes) -> dict:
    """STUB decoder: a real deployment would call PIL / ffmpeg here.
    Deterministic fake: dimensions from the payload hash, frame count
    from length, mean byte value as the 'feature'.

    NOTE: worker-side closures must NOT reference this module-level
    function — cloudpickle would serialize it by reference and the
    executors' Python workers don't have this repo on sys.path (the
    driver harness imports `__spark_entry__.py` by file path). The
    mapInPandas closure below carries its own nested copy.
    """
    import hashlib

    h = hashlib.md5(payload).hexdigest()
    return {
        "fake_width": 1 + int(h[:7], 16) % 1920,
        "fake_height": 1 + int(h[8:15], 16) % 1080,
        "n_frames": 1 + len(payload) % 32,
        "mean_byte": (sum(payload) / len(payload)) if payload else 0.0,
    }


@register("p_multimodal_decode")  # no oracle: Python-stub decode path
def p_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode pass: binary payload column → typed feature
    columns through mapInPandas (batch-shaped, not per-row)."""
    import pandas as pd

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        # self-contained twin of decode_binary (see its NOTE on pickling)
        def decode(payload: bytes) -> dict:
            h = hashlib.md5(payload).hexdigest()
            return {
                "fake_width": 1 + int(h[:7], 16) % 1920,
                "fake_height": 1 + int(h[8:15], 16) % 1080,
                "n_frames": 1 + len(payload) % 32,
                "mean_byte": (sum(payload) / len(payload)) if payload else 0.0,
            }

        for pdf in batches:
            metas = [decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "fake_width": [m["fake_width"] for m in metas],
                    "fake_height": [m["fake_height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "mean_byte": [m["mean_byte"] for m in metas],
                }
            )
            yield out

    return d.mapInPandas(decode_batches, DECODE_SCHEMA).orderBy("doc_id")
