"""Plan tests for the stats-driven join planner (operators/cbo.py):
the decision must be PHYSICALLY real — small estimate plans a
BroadcastHashJoin, large (or inflated) estimate plans a SortMergeJoin
— and the estimator itself must be exact integer arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_clone_spark.catalog import table
from hive_clone_spark.operators.cbo import (
    _CBO_THRESHOLD,
    estimate_build_side,
    stats_driven_join,
)

SF_DIR = "/root/testdata/sf0.01"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_small_build_side_broadcasts(spark):
    li = table(spark, SF_DIR, "lineitem")
    supp = table(spark, SF_DIR, "supplier").select("s_suppkey", "s_name")
    joined, strategy, n, est = stats_driven_join(
        li, supp, li["l_suppkey"] == supp["s_suppkey"]
    )
    assert strategy == "broadcast" and est < _CBO_THRESHOLD
    plan = _physical(joined)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_large_build_side_sort_merges(spark):
    li = table(spark, SF_DIR, "lineitem")
    ords = table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    joined, strategy, n, est = stats_driven_join(
        li, ords, li["l_orderkey"] == ords["o_orderkey"]
    )
    assert strategy == "sort_merge" and est >= _CBO_THRESHOLD
    plan = _physical(joined)
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_inflated_stats_flip_the_same_join(spark):
    """The SAME build side flips strategy when the threshold implies
    its stats no longer fit — the decision is driven by the estimate,
    not by table identity."""
    li = table(spark, SF_DIR, "lineitem")
    supp = table(spark, SF_DIR, "supplier").select("s_suppkey", "s_name")
    cond = li["l_suppkey"] == supp["s_suppkey"]
    _, strat_small, _, est = stats_driven_join(li, supp, cond)
    joined, strat_big, _, _ = stats_driven_join(li, supp, cond, threshold=est)
    assert (strat_small, strat_big) == ("broadcast", "sort_merge")
    assert "SortMergeJoin" in _physical(joined)


def test_estimator_is_exact_integer_arithmetic(spark):
    df = spark.createDataFrame(
        [(1, "ab", 2.0), (2, "cdef", 3.0)], "k BIGINT, s STRING, v DOUBLE"
    )
    n, est = estimate_build_side(df)
    # 2 rows * (8 bigint + 8 double + 4 varchar overhead) + len("ab"+"cdef")
    assert (n, est) == (2, 2 * 20 + 6)


def test_estimator_handles_all_null_strings(spark):
    df = spark.createDataFrame([(1, None)], "k BIGINT, s STRING")
    n, est = estimate_build_side(df)
    assert (n, est) == (1, 12)  # sum(length) coalesces to 0


def test_estimate_handles_date_decimal_boolean(spark, sf_dir):
    """ADVICE r7: non-string columns outside the original width map
    (date, decimal, boolean) must estimate, not KeyError."""
    from pyspark.sql import functions as F

    from hive_clone_spark.operators.cbo import estimate_build_side

    df = spark.range(10).select(
        F.col("id").cast("int").alias("k"),
        F.lit("2000-01-01").cast("date").alias("d"),
        F.lit(1.5).cast("decimal(18,2)").alias("m"),
        F.lit(True).alias("b"),
    )
    n, est = estimate_build_side(df)
    assert n == 10
    assert est == 10 * (4 + 4 + 16 + 1)


def test_estimate_unknown_type_raises_clearly(spark, sf_dir):
    from pyspark.sql import functions as F

    from hive_clone_spark.operators.cbo import estimate_build_side

    df = spark.range(3).select(F.array(F.col("id")).alias("a"))
    try:
        estimate_build_side(df)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "no width estimate" in str(e) and "'a'" in str(e)
