"""Game-domain queries registered with the driver harness.

Populated in M2/M3 (SURVEY.md §7): board model, predicates, move
generation, placement, game-over — each as a (spark, sf_dir) callable
over literal fixture tables (FIXTURES.md §A) with VALUES-CTE DuckDB
oracles where SQL-expressible.
"""
