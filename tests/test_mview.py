"""Materialized-view rewrite engine (operators/mview.py): the rewrite
must be physically real (the plan reads the MV files, never the fact
table) and structurally sound (underivable requests are refused, not
answered wrong)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_clone_spark.operators import mview

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_rewritten_plan_reads_mv_never_fact(spark):
    from hive_clone_spark.registry import QUERIES

    df = QUERIES["q161_matview_rewrite"](spark, SF_DIR)
    plan = _plan(df)
    assert "mview" in plan, "rewritten plan does not scan the MV files"
    assert "lineitem.parquet" not in plan, (
        "rewrite claimed, but the plan still scans the fact table"
    )


def test_rewrite_refuses_group_col_outside_mv(spark):
    path = mview.build_mv(spark, SF_DIR, mview._MV_Q161)
    out = mview.rewrite(
        spark,
        mview._MV_Q161,
        path,
        ["l_suppkey"],  # not in the MV grouping
        {"n": ("count",)},
    )
    assert out is None


def test_rewrite_refuses_missing_partial(spark):
    path = mview.build_mv(spark, SF_DIR, mview._MV_Q161)
    out = mview.rewrite(
        spark,
        mview._MV_Q161,
        path,
        ["l_returnflag"],
        {"s": ("sum", "l_discount")},  # no sum_l_discount partial state
    )
    assert out is None


def test_rollup_matches_direct_aggregation(spark):
    """SUM/COUNT/AVG rolled up from partial states == aggregating the
    fact table directly (the algebra the rewrite relies on)."""
    from hive_clone_spark.catalog import table

    path = mview.build_mv(spark, SF_DIR, mview._MV_Q161)
    got = (
        mview.rewrite(
            spark,
            mview._MV_Q161,
            path,
            ["l_returnflag"],
            {
                "sum_qty": ("sum", "l_quantity"),
                "n": ("count",),
                "avg_price": ("avg", "l_extendedprice"),
            },
        )
        .orderBy("l_returnflag")
        .collect()
    )
    want = (
        table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "decimal(28,8)"
                )
                / F.count(F.lit(1)).cast("decimal(28,8)")
            ).alias("avg_price"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
