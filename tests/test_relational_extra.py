"""Extra relational checks that the generic oracle harness can't
express: approximation accuracy bounds and salted-join plan shape."""

from __future__ import annotations

import pytest

from hive_clone_spark import registry

registry.load_all_modules()


def test_approx_distinct_within_rsd(spark, sf_dir):
    from hive_clone_spark.operators.extended import _approx_distinct_raw

    rows = _approx_distinct_raw(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # rsd=0.02 → generous 3-sigma-ish bound
        assert abs(r.approx_customers - r.exact_customers) <= max(
            5, 0.06 * r.exact_customers
        ), r
    # the registered entry reduces the sketch to the oracle-checkable flag
    flags = registry.QUERIES["q38_approx_distinct"](spark, sf_dir).collect()
    assert all(r.approx_ok for r in flags)


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
    from hive_clone_spark.operators.extended import _approx_percentile_raw

    rows = _approx_percentile_raw(spark, sf_dir).collect()
    assert len(rows) == 12  # 3 return flags x 4 percentiles, scalar rows
    for r in rows:
        a, e = r.approx_value, r.exact_value
        assert abs(a - e) <= max(1.0, 0.01 * abs(e)), (r.l_returnflag, r.pct, a, e)
    # the registered entry reduces the sketch to the oracle-checkable flag
    flags = registry.QUERIES["q53_approx_percentile"](spark, sf_dir).collect()
    assert len(flags) == 12 and all(r.approx_ok for r in flags)


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


def test_repetition_score_fracs_bounded(spark, sf_dir):
    """All three repetition fractions are valid fractions, and the
    most-frequent-bigram count implied by top_bigram_frac matches a
    direct Python recount for the worst-scoring document."""
    from collections import Counter

    from hive_clone_spark.catalog import table

    rows = registry.QUERIES["p_repetition_score"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        for frac in (r.dup_word_frac, r.rep_pair_frac, r.top_bigram_frac):
            assert 0.0 <= frac <= 1.0, r
        assert r.repetitive == (
            r.dup_word_frac > 0.9 or r.rep_pair_frac > 0.1 or r.top_bigram_frac > 0.1
        )
    worst = max(rows, key=lambda r: r.top_bigram_frac)
    text = (
        table(spark, sf_dir, "documents")
        .where(f"doc_id = {worst.doc_id}")
        .collect()[0]
        .text
    )
    ws = text.lower().split()
    bigrams = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    top = Counter(bigrams).most_common(1)[0][1]
    assert abs(worst.top_bigram_frac - top / len(bigrams)) < 1e-6


def test_lm_score_positive_and_split_covering(spark, sf_dir):
    """Every document scores a finite positive NLL; both the train and
    held-out splits are represented (the LM is trained on ~80%)."""
    import math

    rows = registry.QUERIES["p_lm_score"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_bigrams >= 1
        assert math.isfinite(r.avg_nll) and r.avg_nll > 0.0, r
    split = {r.in_train for r in rows}
    assert split == {True, False}


def test_domain_mix_flattens_shares(spark, sf_dir):
    """Temperature resampling must (a) keep the smallest source at
    rate 100, (b) never keep more than it saw, and (c) flatten the
    mixture: the dominant source's share shrinks, shares still sum
    to 1."""
    rows = registry.QUERIES["p_domain_mix"](spark, sf_dir).collect()
    assert rows
    smallest = min(rows, key=lambda r: r.n_docs)
    assert smallest.keep_rate == 100
    for r in rows:
        assert 0 < r.keep_rate <= 100
        assert r.kept_docs <= r.n_docs
        assert r.kept_tokens <= r.n_tokens
    assert abs(sum(r.share_before for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.share_after for r in rows) - 1.0) < 1e-4
    dominant = max(rows, key=lambda r: r.share_before)
    assert dominant.share_after <= dominant.share_before + 1e-6


def test_shard_assign_checksum_partition_independent(spark, sf_dir):
    """The shard/position assignment is a dataset definition: the
    per-shard order checksum must be identical when recomputed over a
    pathologically repartitioned input."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from hive_clone_spark.catalog import table
    from hive_clone_spark.pipeline.common import portable_hash, words_col
    from hive_clone_spark.pipeline.selection import _CK_MOD, _N_SHARDS

    want = {
        r.shard_id: (r.n_docs, r.pos_checksum)
        for r in registry.QUERIES["p_shard_assign"](spark, sf_dir).collect()
    }
    assert want
    d = table(spark, sf_dir, "documents").repartition(13, "lang")
    keyed = d.select(
        "doc_id",
        F.size(words_col(F.col("text"))).cast("bigint").alias("n_tokens"),
        portable_hash(
            F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string"))
        ).alias("skey"),
    ).withColumn("shard_id", (F.col("skey") % _N_SHARDS).cast("int"))
    w = Window.partitionBy("shard_id").orderBy("skey", "doc_id")
    got = {
        r.shard_id: (r.n_docs, r.pos_checksum)
        for r in keyed.withColumn("position", F.row_number().over(w))
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            (
                F.sum(
                    ((F.col("position") * 31 + F.col("doc_id")) % _CK_MOD).cast(
                        "decimal(38,0)"
                    )
                )
                % _CK_MOD
            )
            .cast("bigint")
            .alias("pos_checksum"),
        )
        .collect()
    }
    assert got == want


def test_ivf_train_improves_on_seed_centroids(spark, sf_dir):
    """Lloyd's guarantee: inertia after (update centroids -> reassign)
    must not exceed the inertia of the seed-centroid assignment. The
    seed-side value is recomputed independently in numpy; 6-dp
    distance rounding earns a small slack."""
    import numpy as np

    from hive_clone_spark.catalog import table
    from hive_clone_spark.pipeline.similarity import CENTROID_IDS

    rows = registry.QUERIES["p_ivf_train"](spark, sf_dir).collect()
    assert rows and sum(r.n_assigned for r in rows) == table(
        spark, sf_dir, "embeddings"
    ).count()
    trained = sum(r.inertia for r in rows)
    assert trained > 0

    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in table(spark, sf_dir, "embeddings").collect()
    }
    cents = np.stack([vecs[i] for i in CENTROID_IDS])
    seed = sum(
        round(float(((cents - x) ** 2).sum(axis=1).min()), 6)
        for x in vecs.values()
    )
    assert trained <= seed + 1e-3, (trained, seed)


def test_tokenize_apply_checksum_recomputed(spark, sf_dir):
    """The id-sequence checksum must match an independent Python
    re-encoding of a sample document against the built vocabulary."""
    from pyspark.sql import functions as F

    from hive_clone_spark.catalog import table

    rows = {r.doc_id: r for r in registry.QUERIES["p_tokenize_apply"](spark, sf_dir).collect()}
    assert rows
    vocab = {
        r.word: r.vocab_id
        for r in registry.QUERIES["p_vocab_build"](spark, sf_dir).collect()
    }
    doc = table(spark, sf_dir, "documents").orderBy(F.desc("doc_id")).limit(1).collect()[0]
    words = [w.lower() for w in doc.text.split()]
    mod = 2147483647
    ck = sum((pos * 31 + vocab.get(w, -1) + 1) % mod for pos, w in enumerate(words, 1)) % mod
    got = rows[doc.doc_id]
    assert got.n_tokens == len(words)
    assert got.ids_checksum == ck
    assert got.n_oov == sum(1 for w in words if w not in vocab)


def test_semantic_dedup_cluster_cap_and_corpus_scaled_k(spark, sf_dir):
    """The two SemDeDup scale knobs: (a) a hard per-cluster cap bounds
    the quadratic pair stage no matter how skewed a cluster gets —
    with cap=c, a cluster can contribute at most c*(c-1)/2 pairs and
    c-1 removals — while n_vectors still reports the UNCAPPED size;
    (b) k grows with the corpus via target_cluster, so cluster count
    is a function of data volume, not a literal."""
    from hive_clone_spark.pipeline.dedup import _semantic_dedup

    cap = 5
    capped = _semantic_dedup(spark, sf_dir, cap=cap).orderBy("cent_id").collect()
    assert capped
    assert any(r.n_vectors > cap for r in capped), "cap never binds — weak test"
    for r in capped:
        assert r.n_dup_pairs <= cap * (cap - 1) // 2, r
        assert r.n_removed <= cap - 1, r

    full = _semantic_dedup(spark, sf_dir).orderBy("cent_id").collect()
    # capping the pair stage must not change the cluster report itself
    assert [(r.cent_id, r.n_vectors) for r in capped] == [
        (r.cent_id, r.n_vectors) for r in full
    ]

    coarse = _semantic_dedup(spark, sf_dir, target_cluster=250).collect()
    fine = _semantic_dedup(spark, sf_dir, target_cluster=50).collect()
    assert len(fine) > len(coarse), (len(fine), len(coarse))


def test_asof_join_semantics(spark):
    """Generic as-of contract: greatest right ts <= left ts per key,
    equal-ts rows match, keys with no prior right row get NULLs."""
    from hive_clone_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (2, 50, "c"), (3, 10, "d")],
        "k INT, ts INT, tag STRING",
    )
    right = spark.createDataFrame(
        [(1, 100, 11), (1, 200, 12), (1, 300, 13), (2, 60, 21)],
        "k INT, ts INT, payload INT",
    )
    rows = {
        (r.k, r.ts): (r.r_payload, r["r_ts"])
        for r in asof_join(left, right, on="k").collect()
    }
    assert rows[(1, 100)] == (11, 100)  # equal ts matches (<=)
    assert rows[(1, 205)] == (12, 200)  # greatest ts <= 205
    assert rows[(2, 50)] == (None, None)  # right exists but only later
    assert rows[(3, 10)] == (None, None)  # no right rows for key


def test_asof_join_rejects_reserved_name_collisions(spark):
    """Left columns that collide with the r_*/__* output namespace raise
    a clear error instead of silently producing ambiguous columns."""
    import pytest

    from hive_clone_spark.operators.asof import asof_join

    right = spark.createDataFrame([(1, 10, 5)], "k INT, ts INT, payload INT")
    bad_left = spark.createDataFrame(
        [(1, 20, 7)], "k INT, ts INT, r_payload INT"
    )
    with pytest.raises(ValueError, match="r_payload"):
        asof_join(bad_left, right, on="k")
    dunder_left = spark.createDataFrame([(1, 20, 7)], "k INT, ts INT, __side INT")
    with pytest.raises(ValueError, match="__side"):
        asof_join(dunder_left, right, on="k")
    dunder_right = spark.createDataFrame([(1, 10, 5)], "k INT, ts INT, __ts INT")
    ok_left = spark.createDataFrame([(1, 20)], "k INT, ts INT")
    with pytest.raises(ValueError, match="__ts"):
        asof_join(ok_left, dunder_right, on="k")


def test_asof_join_null_payload_row_wins(spark):
    """A matched right row with a NULL payload yields (its ts, NULL) —
    never that ts composited with an older row's non-null payload."""
    from hive_clone_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 300, "a")], "k INT, ts INT, tag STRING")
    right = spark.createDataFrame(
        [(1, 100, 11), (1, 200, None)], "k INT, ts INT, payload INT"
    )
    [row] = asof_join(left, right, on="k").collect()
    assert (row.r_ts, row.r_payload) == (200, None)


def test_asof_join_matches_bruteforce_property(spark):
    """Property: for random keyed time series, asof_join equals the
    brute-force per-row 'greatest right ts <= left ts' computation.
    Right side is deduped per (key, ts) to the max payload, mirroring
    the determinism contract q61 relies on."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from hive_clone_spark.operators.asof import asof_join

    row = st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=20),  # ts
        # payload may be NULL: a null-payload right row must still WIN the
        # as-of race (its ts is the match), not let an older row's payload
        # leak through — the composite-row bug a per-column
        # last(ignorenulls) carry would produce.
        st.one_of(st.none(), st.integers(min_value=0, max_value=99)),
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        lrows=st.lists(row, min_size=1, max_size=12),
        rrows=st.lists(row, min_size=0, max_size=12),
    )
    def check(lrows, rrows):
        rdedup = {}
        for k, ts, p in rrows:
            # NULL sorts below any int for the max-payload dedup tiebreak
            rdedup[(k, ts)] = max(
                -1 if p is None else p, rdedup.get((k, ts), -2)
            )
        rdedup = {kt: (None if v == -1 else v) for kt, v in rdedup.items()}
        left = spark.createDataFrame(
            [(k, ts, i) for i, (k, ts, _) in enumerate(lrows)],
            "k INT, ts INT, lid INT",
        )
        if rdedup:
            right = spark.createDataFrame(
                [(k, ts, p) for (k, ts), p in rdedup.items()],
                "k INT, ts INT, payload INT",
            )
        else:
            right = spark.createDataFrame([], "k INT, ts INT, payload INT")
        got = {
            r.lid: (r.r_payload, r.r_ts)
            for r in asof_join(left, right, on="k").collect()
        }
        for i, (k, ts, _) in enumerate(lrows):
            cand = [(rts, p) for (rk, rts), p in rdedup.items() if rk == k and rts <= ts]
            want = (None, None) if not cand else (max(cand)[1], max(cand)[0])
            assert got[i] == want, (i, k, ts, got[i], want)

    check()


@pytest.mark.parametrize(
    "hint,operator",
    [
        ("broadcast", "BroadcastHashJoin"),
        ("merge", "SortMergeJoin"),
        ("shuffle_hash", "ShuffledHashJoin"),
    ],
)
def test_q209_hint_selects_physical_join(spark, sf_dir, hint, operator):
    """Each q209 hint must actually flip the physical join strategy —
    a silently ignored hint is a perf regression CI should catch."""
    from hive_clone_spark.operators.extended import hinted_join_plan

    plan = hinted_join_plan(spark, sf_dir, hint)
    assert operator in plan, f"{hint}: expected {operator} in plan"
