"""Cost-based join planning: the consumer side of q89's ANALYZE stats.

q89_analyze_stats (operators/extended.py) produces the statistics a
cost-based optimizer keeps; this module CLOSES that loop — it collects
the same class of stats (row count + estimated in-memory width) for a
join's build side, picks the physical strategy from them (broadcast
hash join under the size threshold, sort-merge above it — the exact
decision `spark.sql.autoBroadcastJoinThreshold` encodes), executes the
join under the chosen hint, and reports the decision next to the join
result so the oracle verifies BOTH.

Width estimation is deliberately integer-exact and engine-portable:
fixed per-type widths (8 bytes for BIGINT/DOUBLE/TIMESTAMP, 4 for INT)
plus actual string lengths with a 4-byte overhead — the same shape
Spark's SizeEstimator / Catalyst statistics use, reduced to arithmetic
DuckDB reproduces bit-for-bit, so the STRATEGY CHOICE itself is under
the value hash (an engine whose stats pass over- or under-counts flips
the strategy column and fails).

Scale notes (100 TB): the stats pass is one map-side-combined
aggregate over the build side only — the probe side (the 100 TB fact
table) is never scanned for planning. The decision is made once on the
driver from a 1-row result, exactly like a real CBO reading catalog
stats; the threshold is configurable and the demo pins it at 256 KiB
so BOTH branches are exercised on the test data (supplier broadcasts,
an orders-derived build side sort-merges from sf0.01 up). The plan
audit (tests/test_cbo_plan.py) asserts the flip is physically real:
BroadcastHashJoin in one plan, SortMergeJoin in the other.

Reference parity: no optimizer exists in the reference (1.4k-line
game engine, SURVEY.md §0); this is warehouse surface mandated by the
driver contract's north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_clone_spark.catalog import table
from hive_clone_spark.registry import register

# Demo threshold: 256 KiB (production: spark.sql.autoBroadcastJoinThreshold,
# default 10 MiB). Chosen so the testdata exercises both branches.
_CBO_THRESHOLD = 256 * 1024

_TYPE_WIDTH = {
    "bigint": 8,
    "double": 8,
    "timestamp": 8,
    "timestamp_ntz": 8,
    "date": 4,
    "int": 4,
    "integer": 4,
    "smallint": 2,
    "tinyint": 1,
    "boolean": 1,
    "float": 4,
}
_VARCHAR_OVERHEAD = 4


def estimate_build_side(build: DataFrame) -> tuple[int, int]:
    """One aggregate over the build side -> (n_rows, est_bytes).

    Fixed widths per numeric/temporal column, length + overhead per
    string column — integer arithmetic throughout so an external
    engine predicts the estimate exactly."""
    exprs = [F.count(F.lit(1)).alias("n")]
    fixed = 0
    for f in build.schema.fields:
        t = f.dataType.simpleString()
        if t == "string":
            exprs.append(
                F.coalesce(F.sum(F.length(f.name)), F.lit(0)).alias(f"len_{f.name}")
            )
            fixed += _VARCHAR_OVERHEAD
        elif t.startswith("decimal"):
            fixed += 16  # Spark's unscaled-long/Int128 layout upper bound
        elif t in _TYPE_WIDTH:
            fixed += _TYPE_WIDTH[t]
        else:
            raise ValueError(
                f"cbo: no width estimate for column {f.name!r} of type {t!r}"
            )
    row = build.agg(*exprs).collect()[0]
    n = int(row["n"])
    est = n * fixed + sum(int(v) for k, v in row.asDict().items() if k != "n")
    return n, est


def stats_driven_join(
    probe: DataFrame, build: DataFrame, on, threshold: int = _CBO_THRESHOLD
) -> tuple[DataFrame, str, int, int]:
    """Plan probe JOIN build by estimated build size: broadcast hash
    join under the threshold, sort-merge join above it. Returns
    (joined, strategy, build_rows, est_bytes)."""
    n, est = estimate_build_side(build)
    if est < threshold:
        return probe.join(F.broadcast(build), on), "broadcast", n, est
    return probe.join(build.hint("merge"), on), "sort_merge", n, est


@register(
    "q93_stats_driven_join",
    oracle=f"""
    WITH s_stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS build_rows,
        CAST(COUNT(*) * (8 + 4 + 4) + SUM(length(s_name)) AS BIGINT)
          AS est_bytes
      FROM supplier),
    j1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_join_rows,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_metric
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
    o_stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS build_rows,
        CAST(COUNT(*) * (8 + 8 + 8) AS BIGINT) AS est_bytes
      FROM orders),
    j2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_join_rows,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_metric
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT 'orders_fact' AS join_name, o_stats.build_rows, o_stats.est_bytes,
      CASE WHEN o_stats.est_bytes < {_CBO_THRESHOLD}
           THEN 'broadcast' ELSE 'sort_merge' END AS strategy,
      j2.n_join_rows, j2.sum_metric
    FROM o_stats, j2
    UNION ALL
    SELECT 'supplier_dim', s_stats.build_rows, s_stats.est_bytes,
      CASE WHEN s_stats.est_bytes < {_CBO_THRESHOLD}
           THEN 'broadcast' ELSE 'sort_merge' END,
      j1.n_join_rows, j1.sum_metric
    FROM s_stats, j1
    ORDER BY join_name
    """,
)
def q93_stats_driven_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CBO loop, end to end: estimate each build side from a stats
    pass, choose broadcast vs sort-merge from the estimate, run the
    join under that strategy, and emit (decision, estimate, result)
    together — all under the oracle. q89 produces this class of stats;
    this entry is the plan decision that CONSUMES them."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    ords = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    def one(join_name, probe, build, probe_key, build_key, metric):
        joined, strategy, n, est = stats_driven_join(
            probe, build, probe[probe_key] == build[build_key]
        )
        return joined.agg(
            F.count(F.lit(1)).alias("n_join_rows"),
            F.sum(F.col(metric).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_metric"),
        ).select(
            F.lit(join_name).alias("join_name"),
            F.lit(n).cast("long").alias("build_rows"),
            F.lit(est).cast("long").alias("est_bytes"),
            F.lit(strategy).alias("strategy"),
            "n_join_rows",
            "sum_metric",
        )

    a = one("supplier_dim", li, supp, "l_suppkey", "s_suppkey", "l_quantity")
    b = one("orders_fact", li, ords, "l_orderkey", "o_orderkey", "l_extendedprice")
    return a.unionAll(b).orderBy("join_name")
