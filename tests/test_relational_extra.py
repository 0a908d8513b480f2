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


def test_stratified_sample_partition_independent(spark, sf_dir):
    """The hash gate must select the SAME docs regardless of physical
    partitioning — the property that makes it a dataset definition
    rather than a sample. Recompute the gate over pathological
    repartitionings and compare membership."""
    from pyspark.sql import functions as F

    from hive_clone_spark.catalog import table
    from hive_clone_spark.pipeline.common import portable_hash

    from hive_clone_spark.pipeline.sampling import _DEFAULT_RATE, _RATES

    want = {
        r.doc_id
        for r in registry.QUERIES["p_stratified_sample"](spark, sf_dir).collect()
    }
    assert want
    d = table(spark, sf_dir, "documents")
    gate = (
        portable_hash(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))) % 100
    )
    rate = F.lit(_DEFAULT_RATE)
    for k, v in _RATES.items():
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    for n in (1, 13):
        got = {
            r.doc_id
            for r in d.repartition(n, "lang")
            .where(gate < rate)
            .select("doc_id")
            .collect()
        }
        assert got == want, f"membership changed under repartition({n})"
    # contrast: Spark's own sample() is layout-dependent and therefore
    # NOT a dataset definition (documents why the hash gate exists)
    s1 = {r.doc_id for r in d.repartition(1).sample(0.5, seed=42).select("doc_id").collect()}
    s2 = {r.doc_id for r in d.repartition(13).sample(0.5, seed=42).select("doc_id").collect()}
    assert s1 != s2


def test_approx_percentile_close_to_exact(spark, sf_dir):
    """GK-sketch percentiles must land within a small relative error of
    the exact per-group values (accuracy=10000 → ~1e-4 rank error)."""
    rows = registry.QUERIES["q53_approx_percentile"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        for a, e in zip(r.approx_pcts, r.exact_pcts):
            assert abs(a - e) <= max(1.0, 0.01 * abs(e)), (r.l_returnflag, a, e)
