"""Generic iterative-fixpoint runner (SURVEY.md §7 M3).

The reference's BFS/connectivity computations (R6 keepsHiveConnectedAfter,
rules.cpp:61-133; R10 antMoves, rules.cpp:196-264) are iterative queries
Spark has no single built-in for. This module provides the driver-side
loop machinery they share: each iteration is one Spark job over a
frontier DataFrame, with `localCheckpoint()` every few iterations so the
lineage (and thus task-serialization cost) stays bounded — the classic
failure mode of naive iterative Spark.

On a cluster the frontier stays partitioned by its join key across
iterations, so each step is a co-partitioned join, not a full reshuffle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def fixpoint(
    seed: DataFrame,
    step: Callable[[DataFrame, DataFrame], DataFrame],
    max_iterations: int = 64,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Iterate ``frontier = step(frontier, visited)`` until the frontier
    is empty; return the accumulated ``visited`` DataFrame.

    ``step`` receives (frontier, visited) and must return the *new*
    frontier — rows not yet in ``visited`` (the runner does not dedup
    for you; deduplication belongs inside ``step`` where the join keys
    are known, typically a ``left_anti`` against ``visited``).
    """
    visited = seed.localCheckpoint(eager=True)
    frontier = visited
    for i in range(max_iterations):
        frontier = step(frontier, visited)
        if i % checkpoint_every == checkpoint_every - 1:
            frontier = frontier.localCheckpoint(eager=True)
        if frontier.isEmpty():
            return visited
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
    raise RuntimeError(f"fixpoint did not converge in {max_iterations} iterations")
