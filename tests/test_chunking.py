"""Content-defined chunking: the boundary-resync property that makes
CDC superior to fixed-size blocking for dedup — an edit near the start
of a document perturbs only the chunks that overlap it; every later
boundary (and therefore every later chunk hash) re-synchronizes.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from hive_clone_spark.pipeline.chunking import W, chunk_arrays
from hive_clone_spark.registry import QUERIES, load_all_modules

load_all_modules()

_VOCAB = [
    "spark", "query", "table", "join", "scan", "merge", "batch", "row",
    "value", "key", "sort", "window", "agg", "filter", "stream", "part",
]


def _chashes(spark, docs: dict[int, str]) -> dict[int, list[int]]:
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    toks = df.select(
        "doc_id",
        F.filter(F.split("text", r"\s+"), lambda w: w != F.lit("")).alias("ws"),
    )
    rows = chunk_arrays(toks).orderBy("doc_id").collect()
    return {r["doc_id"]: list(r["chashes"]) for r in rows}


def test_prefix_edit_resynchronizes(spark):
    rng = random.Random(7)
    orig = " ".join(rng.choice(_VOCAB) for _ in range(120))
    edited = "inserted token " + orig  # 2-token prefix insertion
    ch = _chashes(spark, {0: orig, 1: edited})
    # every chunk of the original after the first W-window of the edit
    # must reappear verbatim in the edited doc's chunk stream
    tail = ch[0][1:]
    assert len(tail) >= 3, "fixture too short to exercise resync"
    pos = [ch[1].index(h) for h in tail if h in ch[1]]
    assert len(pos) == len(tail), (
        f"CDC failed to resync: {len(tail) - len(pos)} of {len(tail)} "
        "post-edit chunks changed"
    )
    assert pos == sorted(pos), "resynced chunks out of order"


def test_mid_edit_leaves_prefix_and_suffix(spark):
    rng = random.Random(11)
    words = [rng.choice(_VOCAB) for _ in range(150)]
    mid = len(words) // 2
    edited = words[:mid] + ["novel", "tokens", "here"] + words[mid:]
    ch = _chashes(spark, {0: " ".join(words), 1: " ".join(edited)})
    shared = set(ch[0]) & set(ch[1])
    # chunks away from the edit site survive on BOTH sides of it
    assert len(shared) >= len(ch[0]) - 3, (
        f"only {len(shared)}/{len(ch[0])} chunks survived a 3-token "
        "mid-document insertion"
    )


def test_identical_content_identical_chunks(spark):
    text = " ".join(_VOCAB * 8)
    ch = _chashes(spark, {0: text, 1: text})
    assert ch[0] == ch[1]


def test_short_docs_single_chunk(spark):
    # below the rolling window there can be no divisor boundary: one
    # chunk spanning the whole document
    ch = _chashes(spark, {0: "a b", 1: " ".join(["w"] * (W - 1))})
    assert all(len(v) == 1 for v in ch.values())
