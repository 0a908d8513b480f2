"""SQL-text entry point: run ANSI SQL strings directly against the
catalog via `spark.sql`, with every TESTDATA table registered as a
view. This is the migration surface for users arriving from a
SQL-first engine — the same query text a DuckDB/warehouse user types
runs unchanged, Catalyst-planned (predicate pushdown, AQE, broadcast
selection all apply, exactly as with the DataFrame API).

The registered query below is written in the dialect intersection of
Spark SQL and DuckDB, and the SAME string is both the Spark query and
the oracle — the strongest possible passthrough check: one text, two
engines, hash-identical results.

Scale design: `spark.sql` is a front-end only — the plan is the same
Catalyst plan the DataFrame API yields (verified by explain_audit),
so every scale property (pushdown, pruning, AQE join selection)
carries over; there is no interpretation overhead per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_clone_spark.catalog import register_views
from hive_clone_spark.registry import register


def run_sql(spark: SparkSession, sf_dir: str, sql_text: str) -> DataFrame:
    """Register all tables as views, then evaluate the SQL text."""
    register_views(spark, sf_dir)
    return spark.sql(sql_text)


# One text, two engines: ANSI join + aggregate + HAVING + expression
# arithmetic, restricted to the Spark∩DuckDB dialect.
_Q43_SQL = """
SELECT
  r_name AS region_name,
  n_name AS nation_name,
  COUNT(*) AS n_orders,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price,
  CAST(MIN(YEAR(o_orderdate)) AS INT) AS first_year,
  CAST(MAX(YEAR(o_orderdate)) AS INT) AS last_year
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderstatus <> 'F'
GROUP BY r_name, n_name
HAVING COUNT(*) > 10
ORDER BY region_name, nation_name
"""


@register("q43_sql_passthrough", oracle=_Q43_SQL)
def q43_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, _Q43_SQL)
