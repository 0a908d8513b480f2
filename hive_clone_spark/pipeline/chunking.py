"""Content-defined chunking (CDC) over `documents` — the rolling-hash
chunker a dedup/storage pipeline runs before chunk-level dedup
(FastCDC / rsync / LBFS lineage): a boundary is declared wherever a
rolling hash of the last W tokens hits a divisor condition, so chunk
boundaries depend only on LOCAL content. Inserting text shifts at most
the chunk containing the edit — every later boundary re-synchronizes —
which is exactly what makes chunk-level dedup robust where fixed-size
blocking is not (the property test pins this resync behavior).

Two registered entries:
  * `p_cdc_chunk` — per-document chunking census (boundary counts,
    chunk-size distribution, chunk-stream checksum);
  * `p_dedup_chunk` — the chunk-level dedup that CDC exists for:
    explode every chunk hash, find hashes occurring more than once
    across the corpus (sub-document duplication that document-level
    dedup can NEVER see — boilerplate headers, quoted passages,
    shared templates).

The reference (a C++ Hive-board-game clone, SURVEY.md §0) has none of
this; the surface comes from the driver contract's LLM-pipeline north
star (BASELINE.json).

Scale design: chunking itself is a single scan-stage projection —
per-document array HOFs (token hash, rolling window hash, boundary
filter, per-chunk fold), zero shuffles, zero joins — embarrassingly
parallel at 100 TB. The dedup step is one hash-groupBy on chunk hash
(map-side partial counts) followed by a bounded top-k, the same shape
as p_dedup_exact.

Determinism: all integer arithmetic (portable_hash % M, base-31
polynomial window, fold checksums) — bit-identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_clone_spark.catalog import table
from hive_clone_spark.pipeline.common import MOD, SQL_WORDS, portable_hash, words_col
from hive_clone_spark.registry import register

W = 4        # rolling window: tokens per hash
BASE = 31    # polynomial base (31^3 * 2^31 stays well inside int64)
DIV = 16     # boundary when window hash % DIV == 0 → ~16-token chunks

_POWS = [BASE**j for j in range(W)]  # 1, 31, 961, 29791


def _window_hash_spark(hs, i):
    """Base-31 polynomial over token hashes at positions i-W+1..i
    (1-based; caller guarantees i >= W so every index is valid)."""
    acc = None
    for j, p in enumerate(_POWS):
        term = F.element_at(hs, i - j) * F.lit(p)
        acc = term if acc is None else acc + term
    return acc % MOD


def _sql_window_hash(i: str) -> str:
    terms = " + ".join(f"hs[{i} - {j}] * {p}" for j, p in enumerate(_POWS))
    return f"(({terms}) % {MOD})"


# shared oracle CTE chain: documents → per-doc chunk arrays
# `arrs(doc_id, n_tok, n_chunks, chashes, clens)`
_SQL_ARRS = f"""
    toks AS (
      SELECT doc_id, {SQL_WORDS.format(expr="text")} AS ws FROM documents),
    hashed AS (
      SELECT doc_id, len(ws) AS n_tok,
        list_transform(ws,
          t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % {MOD}) AS hs
      FROM toks),
    hits AS (
      SELECT doc_id, n_tok, hs,
        CASE WHEN n_tok >= {W}
             THEN list_filter(generate_series({W}, n_tok),
                              i -> {_sql_window_hash("i")} % {DIV} = 0)
             ELSE [] END AS b
      FROM hashed),
    bounds AS (
      -- forced end-of-doc boundary, appended only if the divisor did
      -- not already land there (b[len(b)] is NULL on empty lists)
      SELECT doc_id, n_tok, hs,
        CASE WHEN b[len(b)] = n_tok THEN b
             ELSE list_append(b, CAST(n_tok AS BIGINT)) END AS ends
      FROM hits),
    chunked AS (
      SELECT doc_id, n_tok,
        list_transform(generate_series(1, len(ends)),
          k -> {{'s': CASE WHEN k = 1 THEN 1 ELSE ends[k-1] + 1 END,
                 'e': ends[k]}}) AS cks,
        hs
      FROM bounds),
    arrs AS (
      SELECT doc_id, n_tok,
        len(cks) AS n_chunks,
        list_transform(cks,
          c -> list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_slice(hs, struct_extract(c, 's'),
                              struct_extract(c, 'e'))),
                 (a, x) -> (a * 31 + x) % {MOD})) AS chashes,
        list_transform(cks,
          c -> CAST(struct_extract(c, 'e') - struct_extract(c, 's') + 1
                    AS BIGINT)) AS clens
      FROM chunked)"""


@register(
    "p_cdc_chunk",
    oracle=f"""
    WITH {_SQL_ARRS}
    SELECT doc_id, n_tok, n_chunks,
      ROUND(CAST(n_tok AS DOUBLE) / n_chunks, 6) AS mean_chunk_len,
      list_max(clens) AS max_chunk_len,
      list_reduce(list_prepend(CAST(0 AS BIGINT), chashes),
                  (a, x) -> (a * 31 + x) % {MOD}) AS chunks_checksum
    FROM arrs ORDER BY doc_id
    """,
)
def p_cdc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", words_col(F.col("text")).alias("ws"))
    stats = chunk_arrays(toks)
    return stats.select(
        "doc_id",
        "n_tok",
        "n_chunks",
        F.round(F.col("n_tok").cast("double") / F.col("n_chunks"), 6).alias(
            "mean_chunk_len"
        ),
        F.array_max("clens").alias("max_chunk_len"),
        F.aggregate(
            F.col("chashes"),
            F.lit(0).cast("long"),
            lambda a, x: (a * 31 + x) % MOD,
        ).alias("chunks_checksum"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# chunk-level dedup: the top duplicated chunks across the corpus (by
# occurrence count, ties by hash) — finds repeated sub-document
# content (boilerplate, quoted passages) invisible to whole-document
# dedup. One shuffle on chunk hash; the top-k is a bounded window
# after the aggregate has collapsed the corpus to one row per
# distinct chunk.
# ---------------------------------------------------------------------------
_DUP_TOP = 20


@register(
    "p_dedup_chunk",
    oracle=f"""
    WITH {_SQL_ARRS},
    ex AS (
      SELECT doc_id, unnest(list_zip(chashes, clens)) AS z FROM arrs),
    g AS (
      SELECT struct_extract(z, 1) AS chunk_hash,
        COUNT(*) AS n_occ,
        COUNT(DISTINCT doc_id) AS n_docs,
        MIN(struct_extract(z, 2)) AS chunk_len
      FROM ex GROUP BY chunk_hash)
    SELECT chunk_hash, chunk_len, n_occ, n_docs, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY n_occ DESC, chunk_hash) AS rnk
      FROM g WHERE n_occ > 1)
    WHERE rnk <= {_DUP_TOP}
    ORDER BY rnk
    """,
)
def p_dedup_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", words_col(F.col("text")).alias("ws"))
    ex = chunk_arrays(toks).select(
        "doc_id", F.explode(F.arrays_zip("chashes", "clens")).alias("z")
    )
    g = (
        ex.select(
            "doc_id",
            F.col("z.chashes").alias("chunk_hash"),
            F.col("z.clens").alias("clen"),
        )
        .groupBy("chunk_hash")
        .agg(
            F.count("*").alias("n_occ"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("clen").alias("chunk_len"),
        )
        .where(F.col("n_occ") > 1)
    )
    # limit FIRST (TakeOrdered — distributed per-partition top-k then a
    # k-row driver merge), rank over the <= _DUP_TOP survivors only.
    # The duplicated-chunk set is unbounded at corpus scale; ranking it
    # directly with an unpartitioned window would single-partition-sort
    # every duplicated chunk. Same shape as p_vocab_build (text.py).
    top = g.orderBy(F.desc("n_occ"), "chunk_hash").limit(_DUP_TOP)
    w = Window.orderBy(F.desc("n_occ"), "chunk_hash")
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("int"))
        .select("chunk_hash", "chunk_len", "n_occ", "n_docs", "rnk")
        .orderBy("rnk")
    )


def chunk_arrays(toks: DataFrame) -> DataFrame:
    """(doc_id, ws: array<string>) → per-doc chunking arrays
    (n_tok, n_chunks, chashes, clens). Split out so p_dedup_chunk and
    the boundary-resync property test can consume per-chunk hashes."""
    hashed = toks.select(
        "doc_id",
        F.size("ws").alias("n_tok"),
        F.transform(F.col("ws"), lambda t: portable_hash(t) % MOD).alias("hs"),
    )
    # boundary positions: window-hash divisor hits over W..n_tok
    bpos = F.when(
        F.col("n_tok") >= W,
        F.filter(
            F.sequence(F.lit(W), F.col("n_tok")),
            lambda i: _window_hash_spark(F.col("hs"), i) % DIV == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    hits = hashed.select("doc_id", "n_tok", "hs", bpos.alias("b"))
    # forced end-of-doc boundary, appended only if the divisor did not
    # already land there (try_element_at is NULL on empty arrays)
    ends = F.when(
        F.try_element_at(F.col("b"), F.lit(-1)) == F.col("n_tok"), F.col("b")
    ).otherwise(F.concat(F.col("b"), F.array(F.col("n_tok"))))
    bounds = hits.select("doc_id", "n_tok", "hs", ends.alias("ends"))
    cks = F.transform(
        F.sequence(F.lit(1), F.size("ends")),
        lambda k: F.struct(
            F.when(k == 1, F.lit(1))
            .otherwise(F.element_at(F.col("ends"), k - 1) + 1)
            .alias("s"),
            F.element_at(F.col("ends"), k).alias("e"),
        ),
    )
    chunked = bounds.select("doc_id", "n_tok", "hs", cks.alias("cks"))
    chashes = F.transform(
        F.col("cks"),
        lambda c: F.aggregate(
            F.slice(F.col("hs"), c["s"], c["e"] - c["s"] + 1),
            F.lit(0).cast("long"),
            lambda a, x: (a * 31 + x) % MOD,
        ),
    )
    clens = F.transform(
        F.col("cks"), lambda c: (c["e"] - c["s"] + 1).cast("long")
    )
    return chunked.select(
        "doc_id",
        "n_tok",
        F.size("cks").alias("n_chunks"),
        chashes.alias("chashes"),
        clens.alias("clens"),
    )


# ---------------------------------------------------------------------------
# p_chunk_sliding — fixed-size sliding-window chunking with overlap
# (window 32 tokens, stride 24 -> 8-token overlap; sized to the
# 10-99-token fixture docs so every document exercises the multi-chunk
# path — production uses 128/96 with identical plumbing): the RAG /
# retrieval-index chunker, complementing CDC. Fixed windows give
# uniform embedding inputs; the overlap keeps answers that straddle a
# boundary findable. Chunk identity is a portable hash of the joined
# token slice, so downstream chunk-level dedup (p_dedup_chunk's plan)
# composes directly.
#
# Scale design: pure scan-stage array HOFs — split once, explode the
# per-document chunk index range, slice + join + hash per chunk; zero
# joins, zero pre-aggregation shuffles (the explode multiplies rows
# ~n_tok/96x, the embedding fan-out every RAG pipeline pays by
# design). Ordering is the only shuffle and belongs to the oracle
# comparison, not the operator.
# ---------------------------------------------------------------------------
_CHUNK_W = 32
_CHUNK_STRIDE = 24


@register(
    "p_chunk_sliding",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {SQL_WORDS.format(expr="text")} AS ws FROM documents),
    dims AS (
      SELECT doc_id, ws, len(ws) AS n_tok,
        1 + (CASE WHEN len(ws) > {_CHUNK_W}
              THEN (len(ws) - {_CHUNK_W} + {_CHUNK_STRIDE} - 1)
                   // {_CHUNK_STRIDE}
              ELSE 0 END) AS n_chunks
      FROM toks WHERE len(ws) > 0),
    chunks AS (
      SELECT doc_id, n_tok, n_chunks,
        unnest(generate_series(0, n_chunks - 1)) AS ci
      FROM dims),
    sliced AS (
      SELECT c.doc_id, c.ci, c.n_chunks,
        list_slice(t.ws, c.ci * {_CHUNK_STRIDE} + 1,
                   c.ci * {_CHUNK_STRIDE} + {_CHUNK_W}) AS body
      FROM chunks c JOIN toks t ON c.doc_id = t.doc_id)
    SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
      CAST(ci * {_CHUNK_STRIDE} AS BIGINT) AS start_tok,
      CAST(len(body) AS INT) AS n_tok,
      (('0x' || substr(md5(array_to_string(body, ' ')), 1, 15))::BIGINT)
        AS chunk_hash
    FROM sliced
    ORDER BY doc_id, chunk_idx
    """,
)
def p_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = d.select("doc_id", words_col(F.col("text")).alias("ws")).where(
        F.size("ws") > 0
    )
    n_chunks = F.lit(1) + F.when(
        F.size("ws") > _CHUNK_W,
        F.floor(
            (F.size("ws") - _CHUNK_W + _CHUNK_STRIDE - 1) / _CHUNK_STRIDE
        ).cast("int"),
    ).otherwise(F.lit(0))
    exploded = ws.select(
        "doc_id",
        "ws",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    body = F.slice(
        F.col("ws"), F.col("chunk_idx") * _CHUNK_STRIDE + 1, _CHUNK_W
    )
    return (
        exploded.select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            (F.col("chunk_idx").cast("long") * _CHUNK_STRIDE).alias(
                "start_tok"
            ),
            F.size(body).alias("n_tok"),
            portable_hash(F.array_join(body, " ")).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )
