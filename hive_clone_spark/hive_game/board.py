"""Board views & hex-geometry column expressions.

The reference's board is `unordered_map<Axial, stack>` (engine.hpp:51);
here every view is derived from the single `pieces` DataFrame
(SURVEY.md §1). Direction arithmetic uses literal arrays instead of a
join where possible — constant-folded by Catalyst, no shuffle.

All occupancy logic is "after-lift"-aware: move generation treats the
moving piece's start cell as empty (rules.cpp:201-203), which we express
as an adjustment term instead of materializing a per-mover board copy —
the same delta trick the reference uses (rules.cpp:76-91).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Hex directions in reference order (engine.hpp:25-28); index arithmetic
# (i±1)%6 gives the corridor flanks (rules.cpp:54-55).
DQS = [1, 1, 0, -1, -1, 0]
DRS = [0, -1, -1, 0, 1, 1]

def dir_dq(idx_col):
    """dq of direction idx (0-based col) via literal array lookup.
    (Built lazily — F.lit needs an active SparkContext.)"""
    return F.element_at(F.array(*[F.lit(v) for v in DQS]), idx_col + 1)


def dir_dr(idx_col):
    return F.element_at(F.array(*[F.lit(v) for v in DRS]), idx_col + 1)


def occupancy(pieces: DataFrame) -> DataFrame:
    """(q, r, cnt): stack size per occupied cell (R2, rules.cpp:12-15)."""
    return (
        pieces.where(F.col("on_board"))
        .groupBy("q", "r")
        .agg(F.count("*").alias("cnt"))
    )


def tops(pieces: DataFrame) -> DataFrame:
    """Top-of-stack piece per cell (`st.back()`, ui_app.cpp:541):
    row_number over (q, r) ordered by height desc — the reference's
    single most-reused window idiom (SURVEY.md §2a P4/E1/E2)."""
    w = Window.partitionBy("q", "r").orderBy(F.desc("height"), F.desc("piece_id"))
    return (
        pieces.where(F.col("on_board"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def neighbor_occ_counts(occ: DataFrame, directions: DataFrame) -> DataFrame:
    """(q, r, nbr_cnt): for every cell adjacent to at least one occupied
    cell, how many occupied neighbors it has. This is the reference's
    perimeter/"bright set" core (rules.cpp:205-212, ui_app.cpp:266-299).
    """
    return (
        occ.join(F.broadcast(directions))
        .select(
            (F.col("q") + F.col("dq")).alias("q"),
            (F.col("r") + F.col("dr")).alias("r"),
        )
        .groupBy("q", "r")
        .agg(F.count("*").alias("nbr_cnt"))
    )


def adjacent_expr(cq, cr, fq, fr):
    """True iff cell (cq,cr) is hex-adjacent to (fq,fr) — unrolled over
    the 6 direction offsets, no join."""
    cond = F.lit(False)
    for dq, dr in zip(DQS, DRS):
        cond = cond | ((fq - cq == dq) & (fr - cr == dr))
    return cond


def with_occ_after_lift(
    df: DataFrame,
    occ: DataFrame,
    x: str,
    y: str,
    out: str,
    suffix: str,
) -> DataFrame:
    """Add boolean `out`: is cell (x, y) occupied after lifting the
    mover off (from_q, from_r)? Implemented as a left join against the
    occupancy view plus the delta adjustment (the mover contributes
    exactly 1 to its own cell's count)."""
    o = occ.select(
        F.col("q").alias(f"_oq{suffix}"),
        F.col("r").alias(f"_or{suffix}"),
        F.col("cnt").alias(f"_cnt{suffix}"),
    )
    df = df.join(
        o,
        (F.col(x) == F.col(f"_oq{suffix}")) & (F.col(y) == F.col(f"_or{suffix}")),
        "left",
    )
    lift = F.when(
        (F.col(x) == F.col("from_q")) & (F.col(y) == F.col("from_r")), 1
    ).otherwise(0)
    return df.withColumn(
        out, (F.coalesce(F.col(f"_cnt{suffix}"), F.lit(0)) - lift) > 0
    ).drop(f"_oq{suffix}", f"_or{suffix}", f"_cnt{suffix}")


def corridor_ok_cols(df: DataFrame, occ: DataFrame, cq: str, cr: str, suffix: str) -> DataFrame:
    """Freedom-to-move rule (R5, rules.cpp:50-59) for a step from
    (cq, cr) along `dir_idx`: legal unless BOTH flanking cells of the
    shared edge are occupied (after lift). Adds boolean `corridor_ok`.

    Flanks: from + dir((i+5)%6) and from + dir((i+1)%6), rules.cpp:54-55.
    """
    left_i = (F.col("dir_idx") + 5) % 6
    right_i = (F.col("dir_idx") + 1) % 6
    df = df.withColumn(f"_f1q{suffix}", F.col(cq) + dir_dq(left_i))
    df = df.withColumn(f"_f1r{suffix}", F.col(cr) + dir_dr(left_i))
    df = df.withColumn(f"_f2q{suffix}", F.col(cq) + dir_dq(right_i))
    df = df.withColumn(f"_f2r{suffix}", F.col(cr) + dir_dr(right_i))
    df = with_occ_after_lift(df, occ, f"_f1q{suffix}", f"_f1r{suffix}", f"_occ_f1{suffix}", f"L{suffix}")
    df = with_occ_after_lift(df, occ, f"_f2q{suffix}", f"_f2r{suffix}", f"_occ_f2{suffix}", f"R{suffix}")
    df = df.withColumn(
        "corridor_ok", ~(F.col(f"_occ_f1{suffix}") & F.col(f"_occ_f2{suffix}"))
    )
    return df.drop(
        f"_f1q{suffix}", f"_f1r{suffix}", f"_f2q{suffix}", f"_f2r{suffix}",
        f"_occ_f1{suffix}", f"_occ_f2{suffix}",
    )


def pack_cell(q, r):
    """(q<<32) | uint32(r) — the reference's scalar cell key (F4,
    rules.cpp:68-71). Only needed as a stable label; Spark composite
    keys make it otherwise unnecessary (SURVEY.md §2a F4)."""
    return F.shiftleft(q.cast("bigint"), 32).bitwiseOR(
        r.cast("bigint").bitwiseAND(F.lit(4294967295))
    )
