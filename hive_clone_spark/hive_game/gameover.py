"""Queen-surrounded & game-over evaluation (R3/R4, rules.cpp:17-47)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_clone_spark.hive_game.board import occupancy
from hive_clone_spark.hive_game.fixtures import directions_df


def queens_surrounded(spark: SparkSession, pieces: DataFrame) -> DataFrame:
    """(color, surrounded): for each on-board queen, whether all 6
    neighbors are occupied. Reference counts ANY piece — own color
    included — as surrounding (rules.cpp:33-37, quirk preserved).

    Plan: queen rows × 6-direction broadcast → left-semi join occupied
    cells → count == 6 (the reference's dir-loop become a join,
    SURVEY.md §1)."""
    occ = occupancy(pieces)
    queens = pieces.where(
        F.col("on_board") & (F.col("bug") == "Queen")
    ).select("color", "q", "r")
    probes = (
        queens.join(F.broadcast(directions_df(spark)))
        .select(
            "color",
            (F.col("q") + F.col("dq")).alias("q"),
            (F.col("r") + F.col("dr")).alias("r"),
        )
    )
    hits = probes.join(occ.select("q", "r"), ["q", "r"], "left_semi")
    return (
        queens.select("color")
        .join(
            hits.groupBy("color").agg(F.count("*").alias("n_occ")), ["color"], "left"
        )
        .select("color", (F.coalesce(F.col("n_occ"), F.lit(0)) == 6).alias("surrounded"))
    )


def evaluate_game_over(spark: SparkSession, pieces: DataFrame) -> DataFrame:
    """1-row (verdict): Draw / WhiteWins / BlackWins / None —
    the reference's CASE cascade (rules.cpp:40-47)."""
    s = queens_surrounded(spark, pieces)
    agg = s.agg(
        F.max(F.when(F.col("color") == "White", F.col("surrounded"))).alias("w"),
        F.max(F.when(F.col("color") == "Black", F.col("surrounded"))).alias("b"),
    )
    return agg.select(
        F.when(F.coalesce(F.col("w"), F.lit(False)) & F.coalesce(F.col("b"), F.lit(False)), "Draw")
        .when(F.coalesce(F.col("w"), F.lit(False)), "BlackWins")
        .when(F.coalesce(F.col("b"), F.lit(False)), "WhiteWins")
        .otherwise("None")
        .alias("verdict")
    )
