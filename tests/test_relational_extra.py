"""Extra relational checks that the generic oracle harness can't
express: approximation accuracy bounds and salted-join plan shape."""

from __future__ import annotations

from hive_clone_spark import registry

registry.load_all_modules()


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = registry.QUERIES["q38_approx_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # rsd=0.02 → generous 3-sigma-ish bound
        assert abs(r.approx_customers - r.exact_customers) <= max(
            5, 0.06 * r.exact_customers
        ), r


def test_salted_join_broadcasts_replicated_dim(spark, sf_dir):
    df = registry.QUERIES["q37_salted_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:1500]
