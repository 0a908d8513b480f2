"""64-merge property test for the delta-maintained BPE trainer
(pipeline/text.py::bpe_train_merges, round-6 rewrite).

The Spark implementation maintains the pair-count and symbol-census
tables INCREMENTALLY (only words containing the merged pair are
re-counted each round). This test pins its exactness: every merge
decision (pair, count) and every post-merge symbol census over 64
rounds must equal a deliberately naive pure-Python reference that
re-counts ALL pairs from scratch each round — the same full-recount
semantics the round-5 implementation had, and the same greedy two-pass
non-overlapping replace + (count desc, left, right) tie-break both
engines document. Any drift in the delta bookkeeping (a stale pair row
surviving, a missed decrement, a census leak) changes a merge decision
within 64 rounds and fails the element-wise comparison.
"""

from __future__ import annotations

import random

from hive_clone_spark.pipeline.text import bpe_train_merges

N_MERGES = 64


def _ref_bpe(words: dict[str, int], n_merges: int):
    """Full-recount reference: same semantics, zero incrementality."""
    vocab = [[f"|{'|'.join(word)}|", n] for word, n in words.items()]
    merges = []
    for it in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for s, n in vocab:
            cs = [c for c in s.split("|") if c]
            for a, b in zip(cs, cs[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        pat, rep = f"|{a}|{b}|", f"|{a}{b}|"
        # two-pass non-overlapping left-to-right replace (the documented
        # merge semantics shared with Spark's F.replace chain)
        vocab = [[s.replace(pat, rep).replace(pat, rep), n] for s, n in vocab]
        ns = len({c for s, _ in vocab for c in s.split("|") if c})
        merges.append((it, a, b, cnt, ns))
    return merges


def _synth_words(seed: int = 6, n_words: int = 120) -> dict[str, int]:
    rng = random.Random(seed)
    alphabet = "abcde"
    words: dict[str, int] = {}
    while len(words) < n_words:
        word = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(2, 14))
        )
        words.setdefault(word, rng.randint(1, 9))
    return words


def test_delta_bpe_matches_full_recount_over_64_merges(spark):
    words = _synth_words()
    ref = _ref_bpe(words, N_MERGES)
    assert len(ref) == N_MERGES, "fixture too small to sustain 64 merges"
    vocab = spark.createDataFrame(
        list(words.items()), "word STRING, n BIGINT"
    )
    # the maintained tables are a few hundred rows; default shuffle
    # partitioning would spend the whole test on empty-task overhead
    # across 64 rounds
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        got = bpe_train_merges(spark, vocab, N_MERGES)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert got == ref


def test_bpe_stops_when_pairs_exhausted(spark):
    # two tiny words -> pairs run out long before the merge budget
    vocab = spark.createDataFrame([("ab", 3), ("ab", 0)][:1], "word STRING, n BIGINT")
    got = bpe_train_merges(spark, vocab, 10)
    # "|a|b|" has exactly one pair; after merging it nothing remains
    assert got == [(1, "a", "b", 3, 1)]
