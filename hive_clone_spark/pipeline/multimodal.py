"""Multimodal binary-column operators (M5) — STUB-codec (oracle) mode.

Images/audio/video are modeled as opaque `binary` columns plus typed
metadata. The entries in THIS module run the deterministic stub codec:
binary columns from built-in `encode`, typed metadata extraction as
column expressions, and an Arrow-batched `mapInPandas` decode pass
whose "decoder" derives features from the payload hash. Because the
stub is deterministic, every entry carries a FULL value-hash oracle —
the SQL recomputes the hash-derived dims/features — so the Arrow
round-trip itself is correctness-gated.

REAL decoding lives in `pipeline/imagecodec.py`: pure-numpy byte-level
parsers for 24-bit BMP and P6 PPM behind a `decode_image` codec
interface, exercised by the `p_image_decode` / `p_image_resize`
entries over genuine encoded files — also under full value-hash
oracles (the synthesis rule is SQL-predictable). The stub here remains
the codec of record for opaque non-image payloads; the real codec is
the dispatch target when magic bytes identify the container.

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
    mapInPandas closure below carries its own nested copy. (The real
    codec modules — imagecodec/audiocodec/videocodec — instead ship
    themselves to workers via cloudpickle register_pickle_by_value,
    which is the pattern to prefer for multi-function codecs.)
    """
    import hashlib

    h = hashlib.md5(payload).hexdigest()
    return {
        "fake_width": 1 + int(h[:7], 16) % 1920,
        "fake_height": 1 + int(h[8:15], 16) % 1080,
        "n_frames": 1 + len(payload) % 32,
        "mean_byte": (sum(payload) / len(payload)) if payload else 0.0,
    }


@register(
    "p_multimodal_decode",
    # The decoder is a STUB, but a DETERMINISTIC one (hash-derived
    # dims, byte-mean feature), so the whole Arrow round-trip is
    # value-hash-checkable: the oracle recomputes every fake-decoded
    # column in SQL (documents.text is ASCII, so byte values ≡ ord).
    # A real PIL/ffmpeg decoder would drop back to rows-only.
    oracle="""
    SELECT doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      CAST(1 + (('0x' || substr(md5(text), 1, 7))::BIGINT % 1920) AS INT)
        AS fake_width,
      CAST(1 + (('0x' || substr(md5(text), 9, 7))::BIGINT % 1080) AS INT)
        AS fake_height,
      CAST(1 + octet_length(encode(text)) % 32 AS INT) AS n_frames,
      CASE WHEN length(text) = 0 THEN 0.0
        ELSE CAST(list_sum(list_transform(generate_series(1, length(text)),
                                          i -> ord(text[i]))) AS DOUBLE)
             / length(text) END AS mean_byte
    FROM documents ORDER BY doc_id
    """,
)
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


# ---------------------------------------------------------------------------
# frame sampling — uniform-stride selection of ≤4 frames per "video"
# (frame count derived deterministically from the payload, as in the
# decode stub). The sampling arithmetic and schema are the real thing;
# only the frame payload itself is fake (a keyed digest). Fully
# JVM-side, so this one IS oracle-checked.
#
# Scale design: sequence+explode multiplies rows by ≤4 — a narrow
# generate, no shuffle; the per-frame digest is codegen. At 100 TB the
# explode column order matters: select only (doc_id, n_frames) into
# the generate, never the payload bytes.
# ---------------------------------------------------------------------------
@register(
    "p_multimodal_framesample",
    oracle="""
    WITH v AS (
      SELECT doc_id,
        CAST(1 + octet_length(encode(text)) % 32 AS INT) AS n_frames,
        md5(text) AS content_md5
      FROM documents),
    s AS (
      SELECT doc_id, n_frames, content_md5,
        CAST(CEIL(CAST(n_frames AS DOUBLE) / 4) AS INT) AS stride
      FROM v)
    SELECT doc_id, n_frames,
      CAST(f AS INT) AS frame_idx,
      md5(content_md5 || ':' || CAST(f AS VARCHAR)) AS frame_key
    FROM s, unnest(generate_series(0, n_frames - 1, stride)) AS t(f)
    ORDER BY doc_id, frame_idx
    """,
)
def p_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    v = d.select(
        "doc_id",
        (F.lit(1) + F.octet_length(F.encode(F.col("text"), "UTF-8")) % 32)
        .cast("int")
        .alias("n_frames"),
        F.md5(F.col("text")).alias("content_md5"),
    )
    stride = F.ceil(F.col("n_frames").cast("double") / 4).cast("int")
    frames = v.withColumn("stride", stride).select(
        "doc_id",
        "n_frames",
        "content_md5",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.col("stride"))
        ).alias("frame_idx"),
    )
    return frames.select(
        "doc_id",
        "n_frames",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.md5(
            F.concat(F.col("content_md5"), F.lit(":"), F.col("frame_idx").cast("string"))
        ).alias("frame_key"),
    ).orderBy("doc_id", "frame_idx")


# ---------------------------------------------------------------------------
# resize — the remaining stubbed Pandas-UDF pass: target-box scaling
# arithmetic is real (aspect-preserving fit into 256×256), the pixel
# resample is fake (keyed digest). Same Arrow-batch plumbing and
# closure-pickling discipline as the decode pass (rows-only check).
# ---------------------------------------------------------------------------
RESIZE_SCHEMA = (
    "doc_id BIGINT, src_width INT, src_height INT, "
    "dst_width INT, dst_height INT, resized_key STRING"
)


@register(
    "p_multimodal_resize",
    # Same deal as the decode entry: the resample is fake but
    # deterministic, so the aspect-preserving box-fit arithmetic and
    # the Arrow round-trip both sit under the full value-hash gate.
    oracle="""
    WITH v AS (
      SELECT doc_id,
        CAST(1 + (('0x' || substr(md5(text), 1, 7))::BIGINT % 1920) AS INT)
          AS src_width,
        CAST(1 + (('0x' || substr(md5(text), 9, 7))::BIGINT % 1080) AS INT)
          AS src_height
      FROM documents),
    s AS (
      SELECT doc_id, src_width, src_height,
        LEAST(256.0 / src_width, 256.0 / src_height, 1.0) AS scale
      FROM v),
    d AS (
      SELECT doc_id, src_width, src_height,
        GREATEST(1, CAST(TRUNC(src_width * scale) AS INT)) AS dst_width,
        GREATEST(1, CAST(TRUNC(src_height * scale) AS INT)) AS dst_height
      FROM s)
    SELECT doc_id, src_width, src_height, dst_width, dst_height,
      md5(CAST(doc_id AS VARCHAR) || ':' || CAST(dst_width AS VARCHAR)
          || 'x' || CAST(dst_height AS VARCHAR)) AS resized_key
    FROM d ORDER BY doc_id
    """,
)
def p_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: F401

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def resize_batches(batches):
        import hashlib

        import pandas as pd

        # self-contained (no module-global refs — executor workers
        # don't have this repo on sys.path)
        def dims(payload: bytes):
            h = hashlib.md5(payload).hexdigest()
            return 1 + int(h[:7], 16) % 1920, 1 + int(h[8:15], 16) % 1080

        BOX = 256
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h = dims(bytes(p))
                scale = min(BOX / w, BOX / h, 1.0)
                dw, dh = max(1, int(w * scale)), max(1, int(h * scale))
                key = hashlib.md5(f"{doc_id}:{dw}x{dh}".encode()).hexdigest()
                rows.append((doc_id, w, h, dw, dh, key))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_width", "src_height",
                    "dst_width", "dst_height", "resized_key",
                ],
            )

    return d.mapInPandas(resize_batches, RESIZE_SCHEMA).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Format sniffing / dispatch: the FIRST operator of any multimodal
# ingest — a crawled payload arrives as anonymous bytes, and the
# pipeline must route it to the right decoder by its magic numbers
# (file(1)'s core, reduced to the formats this repo actually decodes).
# The fixture synthesizes REAL container bytes via the five codec
# families (doc_id % 5 routes jpeg / image(bmp|ppm|png) / gif / wav /
# y4m), the sniffer re-identifies them from leading bytes alone, and
# the oracle predicts the full format census from the synthesis rule —
# plus an every-row match flag, so one mis-sniffed container (e.g. a
# RIFF that is not WAVE, or PNG's 8-byte signature cut short) fails
# the hash.
#
# Scale design: sniffing reads a BOUNDED PREFIX (12 bytes here) — at
# 100 TB the dispatcher never touches payload bodies; spread() pins
# the synth/sniff stages to core count past the 1-split scan.
# ---------------------------------------------------------------------------
_SNIFF_SCHEMA = "doc_id BIGINT, expected STRING, detected STRING"


def sniff_format(prefix: bytes) -> str:
    """Identify a container by magic bytes (public magics: JFIF/T.81,
    W3C PNG, GIF87a/89a, BMP, netpbm P6, RIFF/WAVE, YUV4MPEG2)."""
    if prefix[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if prefix[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if prefix[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if prefix[:2] == b"BM":
        return "bmp"
    if prefix[:2] == b"P6":
        return "ppm"
    if prefix[:4] == b"RIFF" and prefix[8:12] == b"WAVE":
        return "wav"
    if prefix[:9] == b"YUV4MPEG2":
        return "y4m"
    return "unknown"


@register(
    "p_format_sniff",
    oracle="""
    WITH expect AS (
      SELECT doc_id,
        CASE doc_id % 5
          WHEN 0 THEN 'jpeg'
          WHEN 1 THEN CASE doc_id % 3
                        WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
                        ELSE 'png' END
          WHEN 2 THEN 'gif'
          WHEN 3 THEN 'wav'
          ELSE 'y4m' END AS fmt
      FROM documents)
    SELECT fmt AS detected, CAST(COUNT(*) AS BIGINT) AS n_docs,
      TRUE AS all_match
    FROM expect GROUP BY fmt ORDER BY detected
    """,
)
def p_format_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from pyspark import cloudpickle as _cp
    import hive_clone_spark.pipeline.multimodal as _mmod
    import hive_clone_spark.pipeline.audiocodec as _amod
    import hive_clone_spark.pipeline.gifcodec as _gmod
    import hive_clone_spark.pipeline.imagecodec as _imod
    import hive_clone_spark.pipeline.jpegcodec as _jmod
    import hive_clone_spark.pipeline.videocodec as _vmod

    # ship every codec module by value: workers don't have the repo on
    # sys.path (driver imports __spark_entry__ by file path), so the
    # synth functions must ride in the closure, not be re-imported
    for _m in (_mmod, _amod, _gmod, _imod, _jmod, _vmod):
        _cp.register_pickle_by_value(_m)
    synth_wav = _amod.synth_wav
    synth_gif = _gmod.synth_gif
    synth_image = _imod.synth_image
    synth_jpeg = _jmod.synth_jpeg
    synth_y4m = _vmod.synth_y4m

    from hive_clone_spark.pipeline.common import spread

    ids = spread(table(spark, sf_dir, "documents").select("doc_id"))

    def synth_and_sniff(batches: Iterator) -> Iterator:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                m = i % 5
                if m == 0:
                    expected, payload = "jpeg", synth_jpeg(i)
                elif m == 1:
                    kind, payload = synth_image(i)
                    expected = "png" if kind.startswith("png") else kind
                elif m == 2:
                    expected, payload = "gif", synth_gif(i)
                elif m == 3:
                    expected, payload = "wav", synth_wav(i)
                else:
                    expected, payload = "y4m", synth_y4m(i)
                # the dispatcher sees ONLY a bounded prefix
                rows.append((i, expected, sniff_format(payload[:12])))
            yield pd.DataFrame(
                rows, columns=["doc_id", "expected", "detected"]
            )

    sniffed = ids.mapInPandas(synth_and_sniff, _SNIFF_SCHEMA)
    return (
        sniffed.groupBy("detected")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min(F.col("detected") == F.col("expected")).alias("all_match"),
        )
        .orderBy("detected")
    )
