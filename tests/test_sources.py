"""Source/sink tests: format round-trips preserve values exactly,
partitioned writes prune at file-listing time, bucketed joins plan
without an exchange on the bucketed side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_clone_spark.catalog import table
from hive_clone_spark.sources import io


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return table(spark, sf_dir, "orders")


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip_exact(spark, orders, tmp_path, fmt):
    path = str(tmp_path / fmt)
    # csv can't carry nested/binary; orders is flat+typed — the ingest case
    io.write(orders, path, fmt=fmt)
    back = io.read(
        spark,
        path,
        fmt=fmt,
        schema=orders.schema if fmt in ("csv", "json") else None,
    )
    assert back.schema == orders.schema
    assert _rows(back) == _rows(orders)


def test_text_formats_require_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        io.read(spark, str(tmp_path), fmt="csv")


def test_partitioned_write_prunes(spark, orders, tmp_path):
    path = str(tmp_path / "orders_by_status")
    io.write(orders, path, partition_by=["o_orderstatus"])
    scan = io.read(spark, path).where(F.col("o_orderstatus") == "F")
    # pruning is physical: the scan node carries the partition filter
    # (inputFiles() can't show it — it lists the pre-pruning FileIndex)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan[:1500]
    # and the data still matches
    want = orders.where(F.col("o_orderstatus") == "F").count()
    assert scan.count() == want


def test_bucketed_join_has_no_exchange_on_bucketed_sides(spark, orders):
    # bucketed tables must live in the session catalog (warehouse.dir is
    # a static conf) — drop them when done
    io.write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b",
        bucket_cols=["o_custkey"],
        n_buckets=8,
    )
    io.write_bucketed(
        orders.select("o_custkey", "o_orderstatus"),
        "cust_status_b",
        bucket_cols=["o_custkey"],
        n_buckets=8,
    )
    try:
        a = spark.table("orders_b")
        b = spark.table("cust_status_b")
        joined = a.join(b, "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides bucketed by the join key with equal bucket counts:
        # the join must not re-shuffle either side
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS cust_status_b")


def test_schema_evolution_merge_on_read(spark, orders, tmp_path):
    """Ingest directories accumulate files written under evolving
    schemas; mergeSchema reconciles them at read time — old files get
    NULL for columns they predate, and no rows are lost. The
    at-scale caveat: mergeSchema reads every file footer, so
    production tables pin the merged schema in a catalog instead of
    re-deriving it per read."""
    path = str(tmp_path / "evolving")
    v1 = orders.select("o_orderkey", "o_totalprice").limit(50)
    v1.write.mode("append").parquet(path)
    v2 = (
        orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .limit(40)
        .withColumn("ingest_version", F.lit(2))
    )
    v2.write.mode("append").parquet(path)

    back = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(back.columns) == {
        "o_orderkey", "o_totalprice", "o_orderpriority", "ingest_version"
    }
    assert back.count() == 90
    # rows from the v1 files carry NULLs for the late-added columns
    assert back.where(F.col("ingest_version").isNull()).count() == 50
    assert back.where(F.col("ingest_version") == 2).count() == 40


def test_zordered_write_skips_files_on_both_columns(spark, orders, tmp_path):
    """Z-order layout: parquet file-level min/max must be selective on
    BOTH clustered columns (a point predicate touches a strict subset
    of files on each), whereas a single-column sort is selective only
    on its own column."""
    import glob

    import pyarrow.parquet as pq

    def files_matching(path, col, value):
        paths = sorted(glob.glob(f"{path}/part-*.parquet"))
        hit = 0
        for p in paths:
            md = pq.ParquetFile(p).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            if lo <= value <= hi:
                hit += 1
        return hit, len(paths)

    zpath = str(tmp_path / "orders_z")
    io.write_zordered(orders, zpath, ["o_custkey", "o_totalprice"], n_files=8)
    assert io.read(spark, zpath).count() == orders.count()

    # probe values from the middle of each domain
    mid = orders.agg(
        F.expr("percentile(o_custkey, 0.5)").alias("ck"),
        F.expr("percentile(o_totalprice, 0.5)").alias("tp"),
    ).collect()[0]

    for col, val in (("o_custkey", int(mid.ck)), ("o_totalprice", float(mid.tp))):
        hit, total = files_matching(zpath, col, val)
        assert total >= 4, "need several files for skipping to be observable"
        assert hit < total, f"z-order gave no skipping on {col}"

    # contrast: sort by o_custkey only → o_totalprice stats are useless
    spath = str(tmp_path / "orders_s")
    (
        orders.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(spath)
    )
    hit, total = files_matching(spath, "o_totalprice", float(mid.tp))
    assert hit == total, "single-column sort should not cluster the other column"


def test_zordered_write_with_bounds_scans_input_once(spark, tmp_path):
    """Caller-supplied bounds: the write must read the input exactly
    once — no min/max pre-pass, no RangePartitioner sampling job. The
    input is an accumulator-instrumented RDD, so every materialization
    of a partition is counted."""
    acc = spark.sparkContext.accumulator(0)
    n_parts = 4

    def counting(it):
        acc.add(1)
        return it

    rows = [(i, float(i % 100), float(i % 7)) for i in range(1000)]
    rdd = spark.sparkContext.parallelize(rows, n_parts).mapPartitions(counting)
    df = spark.createDataFrame(rdd, "k INT, a DOUBLE, b DOUBLE")

    zpath = str(tmp_path / "z_once")
    io.write_zordered(
        df, zpath, ["a", "b"], n_files=4,
        bounds={"a": (0.0, 99.0), "b": (0.0, 6.0)},
    )
    assert acc.value == n_parts, (
        f"input scanned {acc.value / n_parts:.1f}x with explicit bounds"
    )
    assert io.read(spark, zpath).count() == 1000

    # contrast: exact mode pays extra passes (agg pre-scan + range sampling)
    acc2 = spark.sparkContext.accumulator(0)

    def counting2(it):
        acc2.add(1)
        return it

    rdd2 = spark.sparkContext.parallelize(rows, n_parts).mapPartitions(counting2)
    df2 = spark.createDataFrame(rdd2, "k INT, a DOUBLE, b DOUBLE")
    io.write_zordered(df2, str(tmp_path / "z_exact"), ["a", "b"], n_files=4)
    assert acc2.value > n_parts


def test_zordered_bounds_clamp_out_of_range(spark, tmp_path):
    """Approximate/stale bounds must cost balance only, never rows:
    values outside [lo, hi] clamp into the edge buckets and the
    written data round-trips completely."""
    rows = [(i, float(i - 500), float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k INT, a DOUBLE, b DOUBLE")
    zpath = str(tmp_path / "z_clamp")
    # declared bounds cover only the middle of each domain
    io.write_zordered(
        df, zpath, ["a", "b"], n_files=4,
        bounds={"a": (-100.0, 100.0), "b": (200.0, 800.0)},
    )
    back = io.read(spark, zpath)
    assert back.count() == 1000
    assert back.agg(F.sum("k")).collect()[0][0] == sum(range(1000))
    with pytest.raises(ValueError, match="bounds missing"):
        io.write_zordered(df, zpath, ["a", "b"], bounds={"a": (0.0, 1.0)})


def test_zordered_write_null_handling(spark, orders, tmp_path):
    """All-NULL z-column: clean ValueError, not a TypeError from
    None arithmetic. Partial NULLs: the write succeeds, keeps every
    row, and NULL cells cluster at the LOW end of the curve (bucket
    0), not silently in the top bucket."""
    all_null = orders.withColumn("o_nullcol", F.lit(None).cast("double"))
    with pytest.raises(ValueError, match="entirely NULL"):
        io.write_zordered(
            all_null, str(tmp_path / "z_allnull"), ["o_custkey", "o_nullcol"]
        )

    # constant second column ⇒ the z-value depends ONLY on o_sparse, so
    # bucket placement of NULLs is directly observable in the file order
    some_null = orders.withColumn(
        "o_sparse",
        F.when(F.col("o_orderkey") % 10 == 0, None).otherwise(
            F.col("o_totalprice")
        ),
    ).withColumn("o_const", F.lit(1.0))
    zpath = str(tmp_path / "z_partial")
    io.write_zordered(some_null, zpath, ["o_const", "o_sparse"], n_files=4)
    back = io.read(spark, zpath)
    assert back.count() == orders.count()
    n_null = back.where(F.col("o_sparse").isNull()).count()
    assert n_null == orders.where(F.col("o_orderkey") % 10 == 0).count()
    # NULLs cluster at the LOW end of the curve (bucket 0 ≡ the files
    # holding the domain minimum), never the top bucket
    import glob

    import pyarrow.parquet as pq

    paths = sorted(glob.glob(f"{zpath}/part-*.parquet"))
    null_files = {
        i
        for i, p in enumerate(paths)
        if pq.read_table(p, columns=["o_sparse"]).column(0).null_count > 0
    }
    assert null_files == {0}, f"NULLs not clustered in the lowest-z file: {null_files}"


def test_q67_driver_entry_join_is_colocated(spark, sf_dir):
    """The driver-visible bucketed-join entry must actually get the
    shuffle-free plan the bucketing paid for: no hash Exchange on
    either side of the sort-merge join."""
    from hive_clone_spark.sources.queries import bucketed_tables

    o, c = bucketed_tables(spark, sf_dir)
    joined = o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:2000]
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert joined.count() > 0


def test_corrupt_feed_failfast_rejects(spark, tmp_path):
    """q121's PERMISSIVE quarantine twin: the SAME corrupted feed under
    FAILFAST must throw — the two ingestion contracts are distinct."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    feed = tmp_path / "feed"
    lines = ['{"doc_id": 1, "n": 10}', "definitely not json"]
    feed.mkdir()
    (feed / "part.txt").write_text("\n".join(lines))
    with _pytest.raises(Py4JJavaError):
        (
            spark.read.schema("doc_id BIGINT, n BIGINT")
            .option("mode", "FAILFAST")
            .json(str(feed))
            .collect()
        )


def test_q216_plan_has_dynamic_pruning(spark, sf_dir):
    """DPP must actually fire: the fact scan carries a dynamicpruning
    subquery fed by the filtered dimension. A config regression that
    silently disables it would leave results right but scans full."""
    from hive_clone_spark.sources.queries import dpp_plan

    plan = dpp_plan(spark, sf_dir)
    assert "dynamicpruning" in plan.lower()


def test_register_views_memoized_per_sf_dir(spark):
    """register_views skips re-registration for the same (session,
    sf_dir) — ~30 SQL-text entries call it per invocation and paid
    ~1 s each re-creating ten temp views — but MUST re-register when
    the sf_dir changes, or a bench at sf0.1 would silently read the
    views a prior sf0.01 call left behind."""
    from hive_clone_spark.catalog import register_views

    register_views(spark, "/root/testdata/sf0.001")
    n1 = spark.sql("SELECT COUNT(*) AS n FROM orders").first()["n"]
    register_views(spark, "/root/testdata/sf0.01")
    n2 = spark.sql("SELECT COUNT(*) AS n FROM orders").first()["n"]
    assert n2 > n1  # sf switch re-registered
    marker = spark.conf.get("hive_clone_spark.registered_sf_dir")
    assert marker == "/root/testdata/sf0.01"
    # idempotent second call: marker unchanged, views still correct
    register_views(spark, "/root/testdata/sf0.01")
    assert spark.sql("SELECT COUNT(*) AS n FROM orders").first()["n"] == n2


def test_parquet_bloom_rowgroup_pruning_mechanism(spark):
    """q255's full oracle pins the RESULTS; this pins the MECHANISM via
    parquet-mr: the written file has many row groups with a bloom
    filter on k only; an absent in-range probe passes ZERO per-row-
    group bloom tests; the filtered reader keeps 0 row groups for it
    (vs every row group for a no-bloom control file of the same data,
    whose min/max can never exclude a scrambled in-range key); and a
    present probe's filtered read keeps exactly the row groups its
    bloom admits."""
    from hive_clone_spark.sources.queries import (
        _BLOOM_N,
        _bloom_key,
        write_bloom_table,
    )

    sf = "/root/testdata/sf0.001"
    dest = write_bloom_table(spark, sf)
    import glob

    data_file = glob.glob(dest + "/*.parquet")[0]
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(data_file), conf
    )
    present, absent = _bloom_key(5), _bloom_key(_BLOOM_N + 7)

    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    blocks = reader.getFooter().getBlocks()
    n_groups = blocks.size()
    assert n_groups >= 2, "need multiple row groups to prove skipping"
    pass_present = pass_absent = 0
    for i in range(n_groups):
        b = blocks.get(i)
        cols = {
            b.getColumns().get(j).getPath().toDotString(): b.getColumns().get(j)
            for j in range(b.getColumns().size())
        }
        assert cols["k"].getBloomFilterOffset() >= 0
        assert cols["v"].getBloomFilterOffset() == -1
        bf = reader.getBloomFilterDataReader(b).readBloomFilter(cols["k"])
        pass_present += int(bf.findHash(bf.hash(present)))
        pass_absent += int(bf.findHash(bf.hash(absent)))
    reader.close()
    assert pass_present >= 1
    assert pass_absent == 0  # deterministic for this fixed corpus/probe

    FilterApi = jvm.org.apache.parquet.filter2.predicate.FilterApi
    FilterCompat = jvm.org.apache.parquet.filter2.compat.FilterCompat

    def filtered_groups(in_f, key):
        pred = FilterApi.eq(FilterApi.longColumn("k"), key)
        opts = (
            jvm.org.apache.parquet.ParquetReadOptions.builder()
            .withRecordFilter(FilterCompat.get(pred))
            .build()
        )
        r = jvm.org.apache.parquet.hadoop.ParquetFileReader(in_f, opts)
        try:
            return r.getRowGroups().size()
        finally:
            r.close()

    assert filtered_groups(infile, absent) == 0
    assert filtered_groups(infile, present) == pass_present

    # no-bloom control: same data, same scrambled key, no dictionary —
    # nothing can exclude the absent probe, so every row group survives
    import pyspark.sql.functions as F

    ctl = dest + "-ctl"
    (
        spark.read.parquet(dest)
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.enable.dictionary#k", "false")
        .option("parquet.block.size", str(256 * 1024))
        .parquet(ctl)
    )
    ctl_file = glob.glob(ctl + "/*.parquet")[0]
    ctl_in = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(ctl_file), conf
    )
    ctl_reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(ctl_in)
    ctl_groups = ctl_reader.getFooter().getBlocks().size()
    ctl_reader.close()
    assert filtered_groups(ctl_in, absent) == ctl_groups
