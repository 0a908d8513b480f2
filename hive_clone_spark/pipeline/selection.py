"""Data-selection / curation operators over `documents` (M5
extension): repetition scoring, LM-based quality scoring, domain
mixture rebalancing, and deterministic output sharding — the four
corpus-curation moves a pre-training data pipeline runs between "raw
corpus" and "training batches".

The reference (a C++ Hive-board-game clone, SURVEY.md §0) has none of
this; the surface comes from the driver contract's LLM-pipeline
north star (BASELINE.json).

Shared determinism rules (see registry.py docstring): portable_hash
gates, decimal-cast exact sums for anything accumulated across rows,
per-term rounding before transcendental sums so both engines fold the
same values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_clone_spark.catalog import table
from hive_clone_spark.pipeline.common import (
    SQL_WORDS,
    portable_hash,
    spread,
    sql_portable_hash,
    words_col,
)
from hive_clone_spark.registry import register

# ---------------------------------------------------------------------------
# repetition scoring: the Gopher/MassiveText-style repetitiousness
# signals — duplicate-word fraction, consecutive-repeat fraction, and
# the fraction of all bigrams taken by the single most frequent bigram.
# Heavily repetitive documents (boilerplate, keyword stuffing, broken
# scrapes) score high and get filtered before training.
#
# Scale design: ALL three signals are pure array expressions — narrow,
# codegen'd, zero shuffle, so the whole query runs at scan speed. The
# non-obvious one is top_bigram_frac: the count of the most frequent
# bigram within a document equals the longest run of equal elements in
# the SORTED bigram array — computed as run boundaries (positions
# where sbg[i] != sbg[i-1]) → diffs of consecutive boundaries → max.
# That per-row array_sort + O(n) index pass replaces the obvious
# explode → groupBy(doc, bigram) → max/sum → join-back plan (measured
# 2.8 s → sub-second at sf0.1: two doc-keyed exchanges removed).
# ---------------------------------------------------------------------------


@register(
    "p_repetition_score",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {SQL_WORDS.format(expr="lower(text)")} AS ws FROM documents),
    b AS (
      SELECT doc_id, ws,
        list_sort(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
                                 i -> ws[i] || ' ' || ws[i + 1])) AS sbg
      FROM w),
    m AS (
      SELECT doc_id, len(ws) AS n_words,
        ROUND(CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE)
              / greatest(len(ws), 1), 6) AS dup_word_frac,
        ROUND(CAST(len(list_filter(generate_series(1, greatest(len(ws) - 1, 0)),
                                   i -> ws[i] = ws[i + 1])) AS DOUBLE)
              / greatest(len(ws) - 1, 1), 6) AS rep_pair_frac,
        ROUND(CAST(COALESCE(list_max(list_transform(
                generate_series(1, len(starts)),
                j -> starts_plus[j + 1] - starts_plus[j])), 0) AS DOUBLE)
              / greatest(len(sbg), 1), 6) AS top_bigram_frac
      FROM (
        SELECT *, list_append(starts, len(sbg) + 1) AS starts_plus
        FROM (
          SELECT *, list_filter(generate_series(1, len(sbg)),
                                i -> i = 1 OR sbg[i] <> sbg[i - 1]) AS starts
          FROM b)))
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
      dup_word_frac, rep_pair_frac, top_bigram_frac,
      (dup_word_frac > 0.9 OR rep_pair_frac > 0.1 OR top_bigram_frac > 0.1)
        AS repetitive
    FROM m
    ORDER BY doc_id
    """,
)
def p_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    # project ws/n/sbg to columns first: HOF lambdas re-evaluate
    # captured outer EXPRESSIONS per element (column refs are fine)
    w = d.select("doc_id", words_col(F.lower(F.col("text"))).alias("ws"))
    w = w.withColumn("n", F.size("ws"))
    tail = F.greatest(F.col("n") - 1, F.lit(0))
    w = w.withColumn(
        "sbg",
        F.array_sort(
            F.zip_with(
                F.slice(F.col("ws"), 1, tail),
                F.slice(F.col("ws"), 2, tail),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ),
    )
    rep_pairs = F.when(F.col("n") < 2, F.lit(0)).otherwise(
        F.size(
            F.filter(
                F.sequence(F.lit(1), F.greatest(F.col("n") - 1, F.lit(1))),
                lambda i: F.element_at(F.col("ws"), i)
                == F.element_at(F.col("ws"), i + 1),
            )
        )
    )
    # longest equal-run in the sorted bigram array == count of the most
    # frequent bigram: run boundaries → diffs → max, all row-local
    w = w.withColumn(
        "starts",
        F.when(F.size("sbg") < 1, F.array().cast("array<int>")).otherwise(
            F.filter(
                F.sequence(F.lit(1), F.greatest(F.size("sbg"), F.lit(1))),
                # CASE guard, not OR: element_at(.., 0) raises under ANSI
                lambda i: F.when(i == 1, F.lit(True)).otherwise(
                    F.element_at(F.col("sbg"), i)
                    != F.element_at(F.col("sbg"), i - 1)
                ),
            )
        ),
    ).withColumn(
        "starts_plus", F.concat(F.col("starts"), F.array(F.size("sbg") + 1))
    )
    top_bg = F.coalesce(
        F.array_max(
            F.when(F.size("starts") < 1, F.array().cast("array<int>")).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size("starts"), F.lit(1))),
                    lambda j: F.element_at(F.col("starts_plus"), j + 1)
                    - F.element_at(F.col("starts_plus"), j),
                )
            )
        ),
        F.lit(0),
    )
    m = w.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_words"),
        F.round(
            (F.col("n") - F.size(F.array_distinct("ws"))).cast("double")
            / F.greatest(F.col("n"), F.lit(1)),
            6,
        ).alias("dup_word_frac"),
        F.round(
            rep_pairs.cast("double") / F.greatest(F.col("n") - 1, F.lit(1)), 6
        ).alias("rep_pair_frac"),
        F.round(
            top_bg.cast("double") / F.greatest(F.size("sbg"), F.lit(1)), 6
        ).alias("top_bigram_frac"),
    )
    return m.withColumn(
        "repetitive",
        (F.col("dup_word_frac") > 0.9)
        | (F.col("rep_pair_frac") > 0.1)
        | (F.col("top_bigram_frac") > 0.1),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# LM-based document scoring (CCNet-style data selection): train an
# add-one-smoothed bigram LM on the TRAIN split only (same hash gate
# as p_stratified_sample, so the split definition can never drift),
# then score EVERY document's average negative log-likelihood under
# its language's LM. Low-scoring documents look like the corpus;
# high-scoring ones are outliers — the standard perplexity filter.
#
# Scale design: the LM tables are groupBy aggregates with map-side
# partial counts; scoring is an equi join of the corpus bigram stream
# against (lang, w1, w2) counts — shuffle-partitioned on the bigram
# key, uniform by construction. The per-document fold sums
# decimal-cast per-bigram NLL (each term rounded to 6 dp first) so
# both engines accumulate identical values in any order.
# ---------------------------------------------------------------------------


def _sql_bigrams(src: str) -> str:
    return f"""
      SELECT doc_id, lang,
        unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
                              i -> ws[i] || ' ' || ws[i + 1])) AS bgm
      FROM (SELECT doc_id, lang, {SQL_WORDS.format(expr="lower(text)")} AS ws
            FROM {src})"""


@register(
    "p_lm_score",
    oracle=f"""
    WITH bg AS (
      SELECT doc_id, lang, split_part(bgm, ' ', 1) AS w1,
             split_part(bgm, ' ', 2) AS w2
      FROM ({_sql_bigrams("documents")})),
    train AS (
      SELECT * FROM bg
      WHERE {sql_portable_hash("'split:' || CAST(doc_id AS VARCHAR)")} % 10 >= 2),
    c12 AS (SELECT lang, w1, w2, COUNT(*) AS n FROM train GROUP BY lang, w1, w2),
    c1 AS (SELECT lang, w1, COUNT(*) AS n1 FROM train GROUP BY lang, w1),
    v AS (SELECT lang, COUNT(DISTINCT w2) AS v FROM train GROUP BY lang),
    scored AS (
      SELECT bg.doc_id, bg.lang,
        CAST(ROUND(-ln(CAST(COALESCE(c12.n, 0) + 1 AS DOUBLE)
                       / (COALESCE(c1.n1, 0) + v.v)), 6) AS DECIMAL(28,6)) AS nll
      FROM bg
      LEFT JOIN c12 ON bg.lang = c12.lang AND bg.w1 = c12.w1 AND bg.w2 = c12.w2
      LEFT JOIN c1 ON bg.lang = c1.lang AND bg.w1 = c1.w1
      JOIN v ON bg.lang = v.lang)
    SELECT doc_id, lang, COUNT(*) AS n_bigrams,
      CAST(SUM(nll) AS DOUBLE) / COUNT(*) AS avg_nll,
      ({sql_portable_hash("'split:' || CAST(doc_id AS VARCHAR)")} % 10 >= 2)
        AS in_train
    FROM scored GROUP BY doc_id, lang
    ORDER BY doc_id
    """,
)
def p_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    t = d.select("doc_id", "lang", words_col(F.lower(F.col("text"))).alias("ws"))
    tail = F.greatest(F.size("ws") - 1, F.lit(0))
    bg = t.select(
        "doc_id",
        "lang",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ws"), 1, tail).alias("w1"),
                F.slice(F.col("ws"), 2, tail).alias("w2"),
            )
        ).alias("b"),
    ).select("doc_id", "lang", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    split_bucket = (
        portable_hash(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 10
    )
    train = bg.where(split_bucket >= 2)
    c12 = train.groupBy("lang", "w1", "w2").agg(F.count("*").alias("n"))
    c1 = train.groupBy("lang", "w1").agg(F.count("*").alias("n1"))
    v = train.groupBy("lang").agg(F.countDistinct("w2").alias("v"))
    prob = (F.coalesce(F.col("n"), F.lit(0)) + 1).cast("double") / (
        F.coalesce(F.col("n1"), F.lit(0)) + F.col("v")
    )
    scored = (
        bg.join(c12, ["lang", "w1", "w2"], "left")
        .join(c1, ["lang", "w1"], "left")
        .join(v, "lang")
        .select(
            "doc_id",
            "lang",
            F.round(-F.log(prob), 6).cast("decimal(28,6)").alias("nll"),
        )
    )
    return (
        scored.groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_bigrams"),
            (F.sum("nll").cast("double") / F.count("*")).alias("avg_nll"),
        )
        .withColumn("in_train", split_bucket >= 2)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# domain mixture rebalancing: temperature resampling across sources
# (the multilingual/multi-domain rebalancing move: keep-rate per
# source ∝ count^(α−1), α=0.5, normalized so the smallest source
# keeps 100%). Emits the before/after mixture dashboard.
#
# Scale design: documents are scanned ONCE, aggregated straight to
# (source, hash-bucket%100) cells — ~100 rows per source — and every
# subsequent step (per-source totals, the global min, the rate
# formula, the kept-share re-aggregation) runs on that tiny aggregate.
# No second corpus scan, no join back against the full table; the
# acceptance set is defined purely by bucket < rate, which a writer
# would apply as a scan-stage predicate.
# ---------------------------------------------------------------------------
_MIX_ALPHA = 0.5  # documented; the formula below hard-codes sqrt = ^0.5


@register(
    "p_domain_mix",
    oracle=f"""
    WITH g AS (
      SELECT source,
        {sql_portable_hash("'mix:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
        COUNT(*) AS n_docs,
        CAST(SUM(len({SQL_WORDS.format(expr="text")})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source, bucket),
    totals AS (
      SELECT source, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
      FROM g GROUP BY source),
    rated AS (
      SELECT *,
        CAST(floor(100 * sqrt(CAST(MIN(n_docs) OVER () AS DOUBLE) / n_docs))
             AS INT) AS keep_rate
      FROM totals),
    kept AS (
      SELECT g.source,
        CAST(SUM(g.n_docs) AS BIGINT) AS kept_docs,
        CAST(SUM(g.n_tokens) AS BIGINT) AS kept_tokens
      FROM g JOIN rated ON g.source = rated.source
      WHERE g.bucket < rated.keep_rate
      GROUP BY g.source)
    SELECT rated.source, rated.n_docs, rated.n_tokens, keep_rate,
      COALESCE(kept_docs, 0) AS kept_docs,
      COALESCE(kept_tokens, 0) AS kept_tokens,
      ROUND(CAST(rated.n_docs AS DOUBLE)
            / SUM(rated.n_docs) OVER (), 6) AS share_before,
      ROUND(CAST(COALESCE(kept_docs, 0) AS DOUBLE)
            / SUM(COALESCE(kept_docs, 0)) OVER (), 6) AS share_after
    FROM rated LEFT JOIN kept ON rated.source = kept.source
    ORDER BY rated.source
    """,
)
def p_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    bucket = portable_hash(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % 100
    g = (
        d.select(
            "source",
            bucket.alias("bucket"),
            F.size(words_col(F.col("text"))).alias("toks"),
        )
        .groupBy("source", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("toks").cast("bigint").alias("n_tokens"),
        )
    )
    g = g.localCheckpoint(eager=False)  # consumed twice below (totals + kept)
    totals = g.groupBy("source").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )
    wall = Window.partitionBy()
    rated = totals.withColumn(
        "keep_rate",
        F.floor(
            100
            * F.sqrt(F.min("n_docs").over(wall).cast("double") / F.col("n_docs"))
        ).cast("int"),
    )
    kept = (
        g.join(rated.select("source", "keep_rate"), "source")
        .where(F.col("bucket") < F.col("keep_rate"))
        .groupBy("source")
        .agg(
            F.sum("n_docs").cast("bigint").alias("kept_docs"),
            F.sum("n_tokens").cast("bigint").alias("kept_tokens"),
        )
    )
    out = (
        rated.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "keep_rate",
            F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
        )
    )
    return out.select(
        "source",
        "n_docs",
        "n_tokens",
        "keep_rate",
        "kept_docs",
        "kept_tokens",
        F.round(F.col("n_docs").cast("double") / F.sum("n_docs").over(wall), 6).alias(
            "share_before"
        ),
        F.round(
            F.col("kept_docs").cast("double") / F.sum("kept_docs").over(wall), 6
        ).alias("share_after"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# deterministic output sharding ("global shuffle" for training): every
# document gets a content-independent shuffle key, shard =
# key % N_SHARDS, and an exact position within its shard (row_number
# over the shard ordered by key). The emitted per-shard summary
# carries a position checksum — an order-independent exact sum over
# (position, doc_id) terms — that changes if ANY document's shard or
# position changes, so two runs (any partitioning, any cluster size)
# provably produce the same training order.
#
# Scale design: one shuffle on shard_id (uniform hash key). N_SHARDS
# here is 64 for a checkable output; a real run sizes N to the
# cluster (the key math is unchanged) and writes with
# partitionBy(shard). The checksum terms are decimal-cast before
# summing: exact, order-independent, no int64 overflow at any corpus
# size.
# ---------------------------------------------------------------------------
_N_SHARDS = 64
_CK_MOD = 2147483647


@register(
    "p_shard_assign",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
        CAST(len({SQL_WORDS.format(expr="text")}) AS BIGINT) AS n_tokens,
        {sql_portable_hash("'shuffle:' || CAST(doc_id AS VARCHAR)")} AS skey
      FROM documents),
    pos AS (
      SELECT *, skey % {_N_SHARDS} AS shard_id,
        ROW_NUMBER() OVER (PARTITION BY skey % {_N_SHARDS}
                           ORDER BY skey, doc_id) AS position
      FROM keyed)
    SELECT CAST(shard_id AS INT) AS shard_id,
      COUNT(*) AS n_docs,
      CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
      CAST(SUM(CAST((position * 31 + doc_id) % {_CK_MOD} AS DECIMAL(38,0)))
           % {_CK_MOD} AS BIGINT) AS pos_checksum
    FROM pos GROUP BY shard_id
    ORDER BY shard_id
    """,
)
def p_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.size(words_col(F.col("text"))).cast("bigint").alias("n_tokens"),
        portable_hash(
            F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string"))
        ).alias("skey"),
    ).withColumn("shard_id", (F.col("skey") % _N_SHARDS).cast("int"))
    w = Window.partitionBy("shard_id").orderBy("skey", "doc_id")
    pos = keyed.withColumn("position", F.row_number().over(w))
    return (
        pos.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
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
        .orderBy("shard_id")
    )


# ---------------------------------------------------------------------------
# temperature-scaled domain mixing (XLM-R / mC4 style): resampling
# weights w_s ∝ p_s^α with α = 0.3 flatten the source distribution —
# high-resource domains are downsampled, low-resource ones upsampled —
# and a fixed token budget is split by the tempered shares. This is
# the *planning* half of domain mixing (p_domain_mix is the
# *execution* half: hash-bucket admission at a computed rate).
#
# Scale design: everything after the first aggregation runs on one row
# per source (a handful), so the unpartitioned window is bounded by
# the domain count, never the corpus (the p_domain_mix precedent). The
# corpus-sized work is exactly one groupBy(source) with map-side
# partial sums.
#
# Determinism: p^α terms are rounded at 6 dp and decimal-cast before
# the cross-source sum (both engines fold identical decimals — the
# p_lm_score rule); every derived ratio divides two already-identical
# doubles.
# ---------------------------------------------------------------------------
_MIX_ALPHA = 0.3
_MIX_BUDGET = 100_000  # tokens per epoch to allocate


@register(
    "p_mix_temperature",
    oracle=f"""
    WITH totals AS (
      SELECT source,
        CAST(SUM(len({SQL_WORDS.format(expr="text")})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    shared AS (
      SELECT *,
        CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS share,
        CAST(ROUND(pow(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (),
                       {_MIX_ALPHA}), 6) AS DECIMAL(18,6)) AS temp_term
      FROM totals)
    SELECT source, n_tokens,
      ROUND(share, 6) AS share,
      ROUND(CAST(temp_term AS DOUBLE)
            / CAST(SUM(temp_term) OVER () AS DOUBLE), 6) AS temp_share,
      ROUND((CAST(temp_term AS DOUBLE)
             / CAST(SUM(temp_term) OVER () AS DOUBLE)) / share, 6)
        AS epoch_mult,
      CAST(floor(ROUND(CAST(temp_term AS DOUBLE)
                       / CAST(SUM(temp_term) OVER () AS DOUBLE), 6)
                 * {_MIX_BUDGET}) AS BIGINT) AS budget_tokens
    FROM shared ORDER BY source
    """,
)
def p_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    totals = (
        d.select("source", F.size(words_col(F.col("text"))).alias("toks"))
        .groupBy("source")
        .agg(F.sum("toks").cast("bigint").alias("n_tokens"))
    )
    wall = Window.partitionBy()  # one row per source — bounded by domain count
    share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(wall)
    shared = totals.select(
        "source",
        "n_tokens",
        share.alias("share"),
        F.round(F.pow(share, F.lit(_MIX_ALPHA)), 6)
        .cast("decimal(18,6)")
        .alias("temp_term"),
    )
    temp_share = F.col("temp_term").cast("double") / F.sum("temp_term").over(
        wall
    ).cast("double")
    return shared.select(
        "source",
        "n_tokens",
        F.round("share", 6).alias("share"),
        F.round(temp_share, 6).alias("temp_share"),
        F.round(temp_share / F.col("share"), 6).alias("epoch_mult"),
        F.floor(F.round(temp_share, 6) * _MIX_BUDGET).cast("bigint").alias(
            "budget_tokens"
        ),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Model-based quality scoring with the HASHING TRICK (the
# fastText-linear-classifier shape behind DCLM / FineWeb-style corpus
# filters): every unigram and word-bigram is hashed into a fixed
# feature space (_QC_BUCKETS), each bucket carries a weight from the
# shipped model, and the document's score is the mean feature weight —
# here the decision is the sign of the integer weight SUM (identical
# information, no division). The weight table is derived from the
# bucket id by a fixed Knuth-multiplicative rule instead of being
# learned — the honest part under test is the SERVING path (hash,
# lookup, accumulate, threshold), which is what the engine owns; swap
# the rule for learned weights and nothing else changes.
#
# At 100 TB: pure scan-stage array HOFs (hash + arithmetic per token,
# integer sum per doc) — zero shuffle, zero Python, no weight table to
# broadcast because the rule IS the table.
# ---------------------------------------------------------------------------
_QC_BUCKETS = 1024
_QC_KNUTH = 2654435761


def _qc_wgt_sql(tok_list: str) -> str:
    return (
        f"list_sum(list_transform({tok_list}, t -> "
        f"((({sql_portable_hash('t')} % {_QC_BUCKETS}) * {_QC_KNUTH}) % 1001)"
        f" - 500))"
    )


@register(
    "p_quality_classifier",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
        {SQL_WORDS.format(expr="lower(text)")} AS ws
      FROM documents),
    feats AS (
      SELECT doc_id,
        ws || list_transform(
          generate_series(1, greatest(len(ws) - 1, 0)),
          i -> ws[i] || '_' || ws[i + 1]) AS fs
      FROM toks)
    SELECT doc_id,
      CAST(len(fs) AS BIGINT) AS n_feats,
      CAST(COALESCE({_qc_wgt_sql("fs")}, 0) AS BIGINT) AS score_sum,
      (COALESCE({_qc_wgt_sql("fs")}, 0) >= 0) AS keep
    FROM feats ORDER BY doc_id
    """,
)
def p_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread(): the fixture documents table is ONE parquet split, so the
    # per-token md5 scoring (interpreted HOF eval, the dominant cost) ran
    # as a single task — measured 1.8-2.8 s at sf0.1; spreading the scan
    # across cores cuts it to ~0.85 s. At 100 TB the scan has natural
    # splits and the repartition is a no-op-cost redundancy (common.py
    # spread() docstring); the scoring itself stays zero-shuffle HOFs.
    d = spread(table(spark, sf_dir, "documents").select("doc_id", "text"))
    ws = words_col(F.lower(F.col("text")))
    t = d.select("doc_id", ws.alias("ws"))
    # guard: Spark sequence(1, 0) is DESCENDING [1, 0] (NOTES gotcha),
    # so single-word/empty docs need the explicit empty-array branch
    bigrams = F.when(
        F.size("ws") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - 1),
            lambda i: F.concat(
                F.element_at(F.col("ws"), i),
                F.lit("_"),
                F.element_at(F.col("ws"), i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    f = t.select("doc_id", F.concat(F.col("ws"), bigrams).alias("fs"))
    wgt = F.aggregate(
        F.transform(
            F.col("fs"),
            lambda tok: (portable_hash(tok) % _QC_BUCKETS) * _QC_KNUTH % 1001 - 500,
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return f.select(
        "doc_id",
        F.size("fs").cast("long").alias("n_feats"),
        wgt.alias("score_sum"),
        (wgt >= 0).alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Preference-pair mining: build (chosen, rejected) document pairs for
# DPO/RLHF-style training — within each (source, bucket) stratum the
# highest-scoring document is paired against the lowest. The score is
# the shipped linear model p_quality_classifier serves (same hash/
# weight rule), so the pipeline composes: score -> stratify -> pair.
# Tie-breaks are total (score, then doc_id), making the pair table
# deterministic.
#
# At 100 TB: one scan computes scores (zero-shuffle HOFs), one
# groupBy (source, bucket) with MAP-SIDE max/min-of-struct partial
# aggregation — the n-row corpus collapses to 4x|sources| rows before
# the shuffle. No window over the corpus, no sort.
# ---------------------------------------------------------------------------
_PP_BUCKETS = 4


@register(
    "p_pref_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
        {SQL_WORDS.format(expr="lower(text)")} AS ws
      FROM documents),
    feats AS (
      SELECT doc_id, source,
        ws || list_transform(
          generate_series(1, greatest(len(ws) - 1, 0)),
          i -> ws[i] || '_' || ws[i + 1]) AS fs
      FROM toks),
    scored AS (
      SELECT doc_id, source, doc_id % {_PP_BUCKETS} AS bucket,
        CAST(COALESCE({_qc_wgt_sql("fs")}, 0) AS BIGINT) AS score
      FROM feats),
    ranked AS (
      SELECT *,
        ROW_NUMBER() OVER (PARTITION BY source, bucket
                           ORDER BY score DESC, doc_id) AS rc,
        ROW_NUMBER() OVER (PARTITION BY source, bucket
                           ORDER BY score ASC, doc_id) AS rr
      FROM scored)
    SELECT c.source, CAST(c.bucket AS BIGINT) AS bucket,
      c.doc_id AS chosen_id, r.doc_id AS rejected_id,
      c.score AS chosen_score, r.score AS rejected_score,
      c.score - r.score AS margin
    FROM (SELECT * FROM ranked WHERE rc = 1) c
    JOIN (SELECT * FROM ranked WHERE rr = 1) r USING (source, bucket)
    WHERE c.doc_id <> r.doc_id
    ORDER BY source, bucket
    """,
)
def p_pref_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    ws = words_col(F.lower(F.col("text")))
    t = d.select("doc_id", "source", ws.alias("ws"))
    bigrams = F.when(
        F.size("ws") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - 1),
            lambda i: F.concat(
                F.element_at(F.col("ws"), i),
                F.lit("_"),
                F.element_at(F.col("ws"), i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    f = t.select("doc_id", "source", F.concat(F.col("ws"), bigrams).alias("fs"))
    wgt = F.aggregate(
        F.transform(
            F.col("fs"),
            lambda tok: (portable_hash(tok) % _QC_BUCKETS) * _QC_KNUTH % 1001 - 500,
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = f.select(
        "doc_id",
        "source",
        (F.col("doc_id") % _PP_BUCKETS).alias("bucket"),
        wgt.alias("score"),
    )
    # arg-max/min as max/min-of-struct: partial-aggregates map-side, so
    # the shuffle carries 4x|sources| rows, not the corpus
    agg = scored.groupBy("source", "bucket").agg(
        F.max(
            F.struct(F.col("score").alias("s"), (-F.col("doc_id")).alias("nid"))
        ).alias("c"),
        F.min(
            F.struct(F.col("score").alias("s"), F.col("doc_id").alias("id"))
        ).alias("r"),
    )
    return (
        agg.select(
            "source",
            F.col("bucket").cast("long").alias("bucket"),
            (-F.col("c.nid")).alias("chosen_id"),
            F.col("r.id").alias("rejected_id"),
            F.col("c.s").alias("chosen_score"),
            F.col("r.s").alias("rejected_score"),
            (F.col("c.s") - F.col("r.s")).alias("margin"),
        )
        .where(F.col("chosen_id") != F.col("rejected_id"))
        .orderBy("source", "bucket")
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing: the classic corpus triage — score
# every document under the train-split LM (p_lm_score, composed
# directly), then split each language into head/middle/tail tertiles
# by avg NLL. "Head" (lowest perplexity) is the cleanest slice; CCNet
# trains on head+middle and drops tail. NTILE over a per-language
# total order (avg_nll, doc_id) is deterministic because both engines
# compute bit-identical avg_nll doubles (decimal-summed rounded terms
# / count).
#
# At 100 TB: the per-language sort NTILE implies is the one expensive
# step — production replaces it with approximate tertile THRESHOLDS
# (percentile sketch, one pass) and a threshold filter; the tertile
# CONTRACT here stays exact so the oracle can pin membership.
# ---------------------------------------------------------------------------
def _register_lm_buckets() -> None:
    from hive_clone_spark import registry as _reg

    lm_oracle = _reg.ORACLE["p_lm_score"]

    @register(
        "p_lm_buckets",
        oracle=f"""
        WITH base AS ({lm_oracle}),
        tiled AS (
          SELECT *, NTILE(3) OVER (PARTITION BY lang
                                   ORDER BY avg_nll, doc_id) AS tile
          FROM base)
        SELECT lang,
          CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
               ELSE 'tail' END AS bucket,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
          ROUND(MIN(avg_nll), 6) AS min_nll,
          ROUND(MAX(avg_nll), 6) AS max_nll
        FROM tiled
        GROUP BY lang, tile
        ORDER BY lang, MIN(tile)
        """,
    )
    def p_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql.window import Window

        scored = _reg.QUERIES["p_lm_score"](spark, sf_dir)
        w = Window.partitionBy("lang").orderBy("avg_nll", "doc_id")
        tiled = scored.withColumn("tile", F.ntile(3).over(w))
        return (
            tiled.groupBy("lang", "tile")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_bigrams").alias("n_bigrams"),
                F.round(F.min("avg_nll"), 6).alias("min_nll"),
                F.round(F.max("avg_nll"), 6).alias("max_nll"),
            )
            .select(
                "lang",
                F.when(F.col("tile") == 1, "head")
                .when(F.col("tile") == 2, "middle")
                .otherwise("tail")
                .alias("bucket"),
                "n_docs",
                "n_bigrams",
                "min_nll",
                "max_nll",
            )
            .orderBy("lang", "bucket")
        )


_register_lm_buckets()


# ---------------------------------------------------------------------------
# p_quantile_normalize — sketch-based score normalization: mixing
# corpora means mixing score SCALES (one quality model emits 0-80,
# another 40-990); selection wants percentile ranks, and the exact
# answer is a global sort. This entry normalizes through the q157
# HdrHistogram instead: one map-side-combinable pass builds the
# <=130-cell log-linear histogram of the score (documents.n_chars),
# the cumulative table broadcasts, and every row maps to its
# estimated permille rank with a broadcast equi-join on its bucket
# key — zero shuffles of the data, rank error bounded by bucket
# population exactly as q157 proves. The decile ledger (count + score
# range per decile) is the verifiable outcome: quantile-normalized
# deciles hold ~10% of rows each whatever the input distribution.
#
# Scale design: this is how percentile features are actually computed
# at 100 TB — sketch once, broadcast the quantile table, map rows;
# the alternative (rank = global sort) is the exact antipattern the
# plan audit exists to catch.
# ---------------------------------------------------------------------------
@register(
    "p_quantile_normalize",
    oracle="""
    WITH vals AS (
      SELECT doc_id, GREATEST(n_chars, 32) AS v FROM documents),
    hist AS (
      SELECT CAST(length(bin(v)) AS INT) AS e,
        (v >> (CAST(length(bin(v)) AS INT) - 5)) & 15 AS sub,
        CAST(COUNT(*) AS BIGINT) AS cnt
      FROM vals GROUP BY 1, 2),
    cum AS (
      SELECT e, sub,
        SUM(cnt) OVER (ORDER BY e, sub
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cnt
      FROM hist),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM vals),
    mapped AS (
      SELECT t.doc_id, t.v, c.cum_cnt * 1000 // n.n_rows AS permille
      FROM (SELECT doc_id, v, CAST(length(bin(v)) AS INT) AS e,
              (v >> (CAST(length(bin(v)) AS INT) - 5)) & 15 AS sub
            FROM vals) t
      JOIN cum c ON c.e = t.e AND c.sub = t.sub
      CROSS JOIN n)
    SELECT CAST(permille // 100 AS BIGINT) AS decile,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(MIN(v) AS BIGINT) AS min_score,
      CAST(MAX(v) AS BIGINT) AS max_score
    FROM mapped GROUP BY decile ORDER BY decile
    """,
)
def p_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    vals = docs.select(
        "doc_id", F.greatest(F.col("n_chars"), F.lit(32)).alias("v")
    )
    e = "CAST(length(bin(v)) AS INT)"
    keyed = vals.select(
        "doc_id",
        "v",
        F.expr(e).alias("e"),
        F.expr(f"(v >> ({e} - 5)) & 15").alias("sub"),
    )
    hist = keyed.groupBy("e", "sub").agg(F.count("*").alias("cnt"))
    # <= ~130 cells by construction (q157): sorts buckets, never data
    cum = hist.withColumn(
        "cum_cnt",
        F.sum("cnt").over(
            Window.orderBy("e", "sub").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    ).select("e", "sub", "cum_cnt")
    n = vals.agg(F.count("*").alias("n_rows"))
    mapped = (
        keyed.join(F.broadcast(cum), ["e", "sub"])
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "v",
            F.expr("cum_cnt * 1000 div n_rows").alias("permille"),
        )
    )
    return (
        mapped.groupBy(F.expr("permille div 100").alias("decile"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("v").cast("long").alias("min_score"),
            F.max("v").cast("long").alias("max_score"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# reciprocal-rank fusion: combine three independent document rankings
# (length, lexical diversity, stopword-cleanliness) into one list via
# RRF — score(d) = sum over rankings of 1e6 // (60 + rank_r(d)) — the
# standard way retrieval stacks merge heterogeneous scorers WITHOUT
# calibrating their score scales (only ranks enter, so a scorer with
# wild magnitudes can't dominate). The 60-offset is the canonical
# RRF damping; integer micro-credits keep the fusion exact on both
# engines. Rankings are computed WITHIN each language shard — the
# scalable formulation: a corpus-global rank needs a single-partition
# sort (the global-window class this repo's plan audit bans), while
# per-shard ranks partition cleanly and are what a multilingual
# pipeline fuses anyway. Every ranking carries a doc_id tie-break.
#
# Scale design: three windows, all partitioned by lang over one
# per-doc metric row; the fusion is arithmetic on the three rank
# columns of that same row (no join at all — the windows share one
# pass); output is top-3 per shard via one more partitioned window.
# ---------------------------------------------------------------------------
@register(
    "p_rrf_fusion",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, lang,
        len({SQL_WORDS.format(expr="text")}) AS n_words,
        len(list_distinct({SQL_WORDS.format(expr="text")})) AS n_distinct,
        len(list_filter({SQL_WORDS.format(expr="text")},
          w -> w IN ('a', 'the'))) AS n_stop
      FROM documents),
    r AS (
      SELECT doc_id, lang,
        ROW_NUMBER() OVER (PARTITION BY lang
          ORDER BY n_words DESC, doc_id) AS r_len,
        ROW_NUMBER() OVER (PARTITION BY lang
          ORDER BY n_distinct * 1000 // GREATEST(n_words, 1) DESC,
          doc_id) AS r_div,
        ROW_NUMBER() OVER (PARTITION BY lang
          ORDER BY n_stop * 1000 // GREATEST(n_words, 1) ASC,
          doc_id) AS r_clean
      FROM m),
    sc AS (
      SELECT doc_id, lang,
        CAST(r_len AS BIGINT) AS r_len,
        CAST(r_div AS BIGINT) AS r_div,
        CAST(r_clean AS BIGINT) AS r_clean,
        CAST(1000000 // (60 + r_len) + 1000000 // (60 + r_div)
          + 1000000 // (60 + r_clean) AS BIGINT) AS rrf_micros
      FROM r),
    top AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
        ORDER BY rrf_micros DESC, doc_id) AS rk
      FROM sc)
    SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id,
      r_len, r_div, r_clean, rrf_micros
    FROM top WHERE rk <= 3
    ORDER BY lang, rk
    """,
)
def p_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from hive_clone_spark.pipeline.common import words_col

    d = table(spark, sf_dir, "documents")
    ws = words_col(F.col("text"))
    m = d.select(
        "doc_id",
        "lang",
        F.size(ws).alias("n_words"),
        F.size(F.array_distinct(ws)).alias("n_distinct"),
        F.size(
            F.filter(ws, lambda w: w.isin("a", "the"))
        ).alias("n_stop"),
    )
    by = Window.partitionBy("lang")
    r = m.select(
        "doc_id",
        "lang",
        F.row_number()
        .over(by.orderBy(F.desc("n_words"), "doc_id"))
        .cast("long")
        .alias("r_len"),
        F.row_number()
        .over(
            by.orderBy(
                F.expr("n_distinct * 1000 div greatest(n_words, 1)").desc(),
                F.col("doc_id"),
            )
        )
        .cast("long")
        .alias("r_div"),
        F.row_number()
        .over(
            by.orderBy(
                F.expr("n_stop * 1000 div greatest(n_words, 1)").asc(),
                F.col("doc_id"),
            )
        )
        .cast("long")
        .alias("r_clean"),
    )
    sc = r.withColumn(
        "rrf_micros",
        F.expr(
            "1000000 div (60 + r_len) + 1000000 div (60 + r_div) "
            "+ 1000000 div (60 + r_clean)"
        ).cast("long"),
    )
    top = sc.withColumn(
        "rk",
        F.row_number()
        .over(by.orderBy(F.desc("rrf_micros"), "doc_id"))
        .cast("long"),
    ).where(F.col("rk") <= 3)
    return top.select(
        "lang", "rk", "doc_id", "r_len", "r_div", "r_clean", "rrf_micros"
    ).orderBy("lang", "rk")


# ---------------------------------------------------------------------------
# p_train_test_split — deterministic corpus splitting, the first
# decision of every training run: doc -> split by PORTABLE HASH of a
# salted key (80/10/10), which gives the three properties random
# splits lose: (1) STABILITY — a re-run, a different machine, or a
# grown corpus never reassigns an existing doc; (2) DISJOINTNESS by
# construction; (3) auditability — both engines compute the same
# assignment, so the split itself sits under the value hash. The
# salt string is the experiment id: changing it is a NEW split, not
# a perturbed one.
#
# Census + proof columns: per-split doc counts, word mass, overlap=0
# (anti-join evidence between train and the eval splits), and the
# exact hash-bucket boundaries used. At 100 TB the assignment is a
# scan-stage expression — no shuffle, no sampling pass, no state.
# ---------------------------------------------------------------------------
_SPLIT_SALT = "exp-r8"


@register(
    "p_train_test_split",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id,
        {sql_portable_hash(f"CAST(doc_id AS VARCHAR) || ':{_SPLIT_SALT}'")}
          % 10 AS b,
        len(list_filter(str_split_regex(text, '\\s+'), w -> w <> ''))
          AS n_words
      FROM documents),
    labeled AS (
      SELECT doc_id, n_words,
        CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'valid'
             ELSE 'test' END AS split
      FROM assigned)
    SELECT split,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_words) AS BIGINT) AS n_words,
      CAST(MIN(doc_id) AS BIGINT) AS first_doc,
      CAST(0 AS BIGINT) AS n_overlap_with_train
    FROM labeled GROUP BY split ORDER BY split
    """,
)
def p_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_clone_spark.pipeline.common import portable_hash, words_col

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    b = (
        portable_hash(
            F.concat(F.col("doc_id").cast("string"), F.lit(f":{_SPLIT_SALT}"))
        )
        % 10
    )
    labeled = d.select(
        "doc_id",
        F.size(words_col(F.col("text"))).cast("long").alias("n_words"),
        F.when(b < 8, "train").when(b == 8, "valid").otherwise("test").alias(
            "split"
        ),
    ).localCheckpoint(eager=True)  # reused by census + overlap proof
    train_ids = labeled.where(F.col("split") == "train").select("doc_id")
    overlap = (
        labeled.where(F.col("split") != "train")
        .join(train_ids, "doc_id", "left_semi")
        .count()
    )
    return (
        labeled.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.min("doc_id").alias("first_doc"),
        )
        .withColumn("n_overlap_with_train", F.lit(overlap).cast("long"))
        .orderBy("split")
    )
