"""One-Hive rule (R6, rules.cpp:61-133) as set-oriented connectivity.

The reference runs a full BFS per candidate move. Per SURVEY.md §4 we
redesign (same results, better complexity): compute connected-component
labels of the lifted board ONCE per mover, then gate every candidate
with a pure join — the post-move hive `base ∪ {to}` is connected iff
every component of `base` touches (or contains) `to`.

The component labeling is an iterative min-label propagation fixpoint —
the one genuinely iterative operator Spark lacks built-in. Each
iteration is a self-join on the (piece_id, cell) key; `localCheckpoint`
keeps lineage bounded (SURVEY.md §7 M3). At hypertable scale the
frontier stays hash-partitioned on the same key across iterations, so
iterations are co-partitioned joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_clone_spark.hive_game.board import DQS, DRS, pack_cell


def base_cells(movers: DataFrame, occ: DataFrame) -> DataFrame:
    """(piece_id, q, r): occupied cells after lifting each mover —
    the reference's delta-occupancy view (rules.cpp:76-96) keyed by
    mover so a batched call generates for many pieces at once."""
    lift = F.when(
        (F.col("q") == F.col("from_q")) & (F.col("r") == F.col("from_r")), 1
    ).otherwise(0)
    return (
        movers.select("piece_id", "from_q", "from_r")
        .join(occ)  # cross join: per-mover copy of the occupancy view
        .where((F.col("cnt") - lift) > 0)
        .select("piece_id", "q", "r")
    )


def component_labels(base: DataFrame, max_iterations: int = 64) -> DataFrame:
    """(piece_id, q, r, label): connected-component label per cell via
    min-label propagation over hex adjacency."""
    labels = base.withColumn("label", pack_cell(F.col("q"), F.col("r"))).localCheckpoint()
    for _ in range(max_iterations):
        # propagate each cell's label to its 6 neighbors (that exist)
        prop = None
        for dq, dr in zip(DQS, DRS):
            shifted = labels.select(
                "piece_id",
                (F.col("q") + dq).alias("q"),
                (F.col("r") + dr).alias("r"),
                "label",
            )
            prop = shifted if prop is None else prop.unionByName(shifted)
        new_labels = (
            labels.unionByName(prop)
            .groupBy("piece_id", "q", "r")
            .agg(F.min("label").alias("label"))
            .join(base, ["piece_id", "q", "r"], "left_semi")
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(
                labels.alias("o"),
                (F.col("n.piece_id") == F.col("o.piece_id"))
                & (F.col("n.q") == F.col("o.q"))
                & (F.col("n.r") == F.col("o.r"))
                & (F.col("n.label") != F.col("o.label")),
                "left_semi",
            )
            .isEmpty()
        )
        labels = new_labels
        if changed:
            return labels
    raise RuntimeError("component_labels did not converge")


def filter_hive_connected(cands: DataFrame, movers: DataFrame, occ: DataFrame) -> DataFrame:
    """Keep candidates (piece_id, from_q, from_r, to_q, to_r, ...) whose
    move keeps the hive one component (R6). `to` merges every component
    it touches; legality ⇔ it touches all of them."""
    base = base_cells(movers, occ)
    labels = component_labels(base)
    n_comp = labels.groupBy("piece_id").agg(
        F.countDistinct("label").alias("n_comp")
    )

    # probe cells: to itself + its 6 neighbors
    probes = F.array(
        F.struct(F.col("to_q").alias("pq"), F.col("to_r").alias("pr")),
        *[
            F.struct(
                (F.col("to_q") + dq).alias("pq"), (F.col("to_r") + dr).alias("pr")
            )
            for dq, dr in zip(DQS, DRS)
        ],
    )
    probe = (
        cands.select("piece_id", "to_q", "to_r")
        .dropDuplicates(["piece_id", "to_q", "to_r"])
        .select("piece_id", "to_q", "to_r", F.explode(probes).alias("p"))
        .select("piece_id", "to_q", "to_r", F.col("p.pq").alias("pq"), F.col("p.pr").alias("pr"))
    )
    adj = (
        probe.join(
            labels,
            (probe.piece_id == labels.piece_id)
            & (probe.pq == labels.q)
            & (probe.pr == labels.r),
        )
        .groupBy(probe.piece_id, "to_q", "to_r")
        .agg(F.countDistinct("label").alias("adj_comp"))
    )
    out = (
        cands.join(adj, ["piece_id", "to_q", "to_r"], "left")
        .join(n_comp, ["piece_id"], "left")
        .where(
            F.coalesce(F.col("adj_comp"), F.lit(0))
            == F.coalesce(F.col("n_comp"), F.lit(0))
        )
        .drop("adj_comp", "n_comp")
    )
    return out
