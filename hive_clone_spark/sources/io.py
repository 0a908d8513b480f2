"""Source/sink connectors (SURVEY.md §2b "Source/sink" + driver
north-star warehouse surface).

The reference has no file IO at all (save/load is roadmap-only,
README.md:103); this module is the warehouse-side surface: columnar
(parquet/orc), text (csv/json), partitioned layouts for pruning, and
bucketed tables for shuffle-free joins.

Scale notes (100 TB):
  * partitioned writes (`partition_by`) put the partition column into
    the directory layout, so `WHERE part = x` prunes at file-listing
    time — zero IO for excluded partitions;
  * bucketed writes (`bucket_by`) pre-shuffle data by join key at write
    time; two tables bucketed the same way join with NO exchange —
    the write-once/join-many trade every warehouse makes for big facts;
  * csv/json are ingest formats: schema must be declared (inference is
    a full extra pass over 100 TB) and values round-trip through
    strings, so they're read-validate-convert paths, never the storage
    format. Parquet/ORC carry types, stats, and pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "csv", "json")

_READ_DEFAULTS: dict[str, dict[str, str]] = {
    # declared-schema ingest: no inference pass, strict types
    "csv": {"header": "true", "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"},
    "json": {"timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"},
}
_WRITE_DEFAULTS: dict[str, dict[str, str]] = {
    "csv": {"header": "true", "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"},
    "json": {"timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"},
}


def read(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read `path` in `fmt`. Text formats require a declared schema —
    schema inference over a 100 TB ingest directory is a full extra
    scan, so refusing it here is a feature."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; known: {FORMATS}")
    if fmt in ("csv", "json") and schema is None:
        raise ValueError(f"{fmt} reads require an explicit schema (no inference pass)")
    reader = spark.read.format(fmt).options(**{**_READ_DEFAULTS.get(fmt, {}), **options})
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write `df` to `path`; `partition_by` produces the pruning-friendly
    directory layout (one dir per partition value)."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; known: {FORMATS}")
    writer = df.write.format(fmt).mode(mode).options(
        **{**_WRITE_DEFAULTS.get(fmt, {}), **options}
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    path: str | None = None,
) -> None:
    """Bucketed table: co-locates rows by hash(bucket_cols) at
    write time so equi-joins/aggregations on those columns run with no
    exchange. (Bucketing requires saveAsTable — buckets live in the
    catalog, not the directory layout.) With `path` the table is
    external: files land at the given location instead of the session
    warehouse dir (which follows the caller's cwd)."""
    writer = df.write.format(fmt).mode("overwrite")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 10,
    fmt: str = "parquet",
    bounds: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Z-order-clustered write: cluster the layout on MULTIPLE columns
    at once so parquet min/max stats stay tight on every listed column
    and point/range predicates on ANY of them skip most files.

    A single-column sort gives perfect skipping on that column and none
    on the others; the Z-order curve trades a little of each for
    usable skipping on all. Mechanism: each column is bucketized into
    2^bits fixed-width buckets from its global [min, max] (one cheap
    agg pass — the same two-pass shape Delta/Iceberg OPTIMIZE ZORDER
    uses, which sample instead of scanning), the bucket indices'
    bits are interleaved into one z-value, and the write is
    repartitionByRange(z) + sortWithinPartitions(z): contiguous curve
    segments per file, so each file covers a small hyper-rectangle of
    the value space.

    At 100 TB this is the layout move that makes a multi-tenant scan
    workload cheap: the write pays one extra range shuffle; every
    later query on any z-column reads a fraction of the files.

    Bounds come from one of two places:

      * `bounds={col: (lo, hi)}` — caller-supplied (from table
        metadata, parquet footer stats, or a prior profile). This is
        the 100 TB path: NO pre-pass at all, and because the bucketized
        z-space is then fully known up front, files are cut by
        DETERMINISTIC equal-width z-slices instead of
        repartitionByRange (whose RangePartitioner runs its own
        sampling job over the input) — the whole write is a SINGLE
        scan of the data. Values outside the declared bounds clamp
        into the edge buckets, so stale/approximate bounds cost layout
        balance, never correctness. Slice→file assignment is by hash,
        so two z-slices can share a file (slightly looser per-file
        stats); exact mode below trades a scan for perfect balance.
      * `bounds=None` — exact mode (fallback): one min/max aggregate
        pre-pass (column-pruned, but still a second read of the
        input) + sampled range repartition, as before.
    """
    from pyspark.sql import functions as F

    if not 2 <= len(cols) <= 4:
        raise ValueError("z-ordering needs 2-4 columns")
    single_scan = bounds is not None
    if bounds is None:
        row = df.agg(
            *[F.min(c).cast("double").alias(f"min_{c}") for c in cols],
            *[F.max(c).cast("double").alias(f"max_{c}") for c in cols],
        ).collect()[0]
        bounds = {c: (row[f"min_{c}"], row[f"max_{c}"]) for c in cols}
    missing = [c for c in cols if c not in bounds]
    if missing:
        raise ValueError(f"bounds missing for z-order columns {missing}")
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        lo, hi = bounds[c]
        if lo is None or hi is None:
            raise ValueError(
                f"z-order column {c!r} is entirely NULL — no [min, max] to bucketize"
            )
        span = (hi - lo) or 1.0
        # NULL cells: F.least IGNORES null arguments — least(1023, NULL)
        # is 1023 — so a plain least/floor chain silently drops NULLs
        # into the TOP bucket. Branch on the null explicitly and cluster
        # NULLs at bucket 0 (NULLS FIRST semantics). greatest(0, ...)
        # clamps below-bounds values (possible with supplied bounds)
        # into the bottom bucket the same way least caps the top.
        bucket = (
            F.when(F.col(c).isNull(), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(2**bits - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (F.col(c).cast("double") - F.lit(lo))
                            / F.lit(span)
                            * (2**bits)
                        ),
                    ),
                )
            )
            .cast("long")
        )
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, b).bitwiseAND(F.lit(1)),
                    b * len(cols) + ci,
                )
            )
    zdf = df.withColumn("__z", z)
    if single_scan:
        # z ranges over [0, 2^(bits*ncols)); cut it into n_files
        # equal-width slices — no data-dependent boundaries, no
        # sampling job. Hash-repartition on the slice id colocates
        # each slice; sortWithinPartitions keeps the curve order
        # inside every file.
        z_cells = 2 ** (bits * len(cols))
        slice_id = F.floor(F.col("__z") * n_files / F.lit(z_cells)).cast("int")
        parted = zdf.withColumn("__slice", slice_id).repartition(
            n_files, "__slice"
        )
        out = parted.sortWithinPartitions("__slice", "__z").drop("__slice", "__z")
    else:
        out = (
            zdf.repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    out.write.format(fmt).mode("overwrite").save(path)
