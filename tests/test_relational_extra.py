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
    assert len(rows) == 12  # 3 return flags x 4 percentiles, scalar rows
    for r in rows:
        a, e = r.approx_value, r.exact_value
        assert abs(a - e) <= max(1.0, 0.01 * abs(e)), (r.l_returnflag, r.pct, a, e)


def test_pandas_path_catches_hugeint_drift(spark, sf_dir):
    """The oracle replica must flag DuckDB HUGEINT->float64 dtype drift
    (round 1's q50 driver hash failure): a windowed SUM(BIGINT) left
    uncast returns HUGEINT, which pandas materializes as float64 while
    Spark returns int64. fetchall() hid this (both sides gave Python
    ints); the fetchdf() path must not."""
    from tests.oracle_utils import compare

    good = registry.ORACLE["q50_rolling_time_window"]
    uncast = good.replace(
        "CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) OVER w AS BIGINT)",
        "SUM(CAST(FLOOR(value * 1000) AS BIGINT)) OVER w",
    )
    assert uncast != good, "q50 oracle no longer matches the expected shape"
    df = registry.QUERIES["q50_rolling_time_window"](spark, sf_dir)
    ok, msg = compare(df, good, sf_dir)
    assert ok, msg
    ok_uncast, _ = compare(df, uncast, sf_dir)
    assert not ok_uncast, "pandas-path replica failed to catch HUGEINT drift"


def test_embed_quantize_error_bound(spark, sf_dir):
    """Symmetric int8 quantization: every reconstruction error must be
    <= 0.5/scale (half a quantization step; the max element hits the
    clamp boundary exactly, so no clamp-induced excess). Both output
    columns are rounded to 6 dp, so the bound carries a 1e-6 slack."""
    rows = registry.QUERIES["p_embed_quantize"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.max_err <= 0.5 / r.scale + 1e-6, (r.vec_id, r.max_err, r.scale)


def test_inverted_index_postings_bounded(spark, sf_dir):
    """Posting heads must stay bounded (the window cap runs BEFORE
    collect_list) and df must never be smaller than the head length."""
    rows = registry.QUERIES["p_inverted_index"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        head = r.postings_head.split(",")
        assert len(head) <= 20
        assert r.df >= len(head)
        assert head == sorted(head, key=int)


def test_ngram_lm_probabilities_valid(spark, sf_dir):
    """Smoothed P(w2|w1) must be a probability and counts positive."""
    rows = registry.QUERIES["p_ngram_lm"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.prob <= 1.0 and r.n >= 1


def test_quality_filter_rates_consistent(spark, sf_dir):
    """pass_rate in [0,1], n_pass <= n_docs, kept_tokens 0 iff no pass."""
    rows = registry.QUERIES["p_quality_filter"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.pass_rate <= 1.0
        assert r.n_pass <= r.n_docs
        if r.n_pass == 0:
            assert r.kept_tokens == 0
