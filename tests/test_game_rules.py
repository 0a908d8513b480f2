"""Reference-parity property tests (SURVEY.md §5): the same assertions
the reference's gtest suite makes, on the same fixtures, against the
Spark implementation. The oracle tests check value-equality with
DuckDB; these check the reference's *semantic* contracts directly."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hive_clone_spark.hive_game import geometry
from hive_clone_spark.hive_game.fixtures import FIXTURES, pieces_df
from hive_clone_spark.hive_game.movegen import legal_moves, legal_moves_all
from hive_clone_spark.hive_game.state import add_piece


def _moves(spark, fixture, pid):
    return legal_moves(spark, pieces_df(spark, fixture), pid).collect()


def _occupied_cells(fixture):
    return {(q, r) for _, _, _, q, r, _ in FIXTURES[fixture]}


def _adjacent_to_any(cell, cells):
    q, r = cell
    neigh = [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]
    return any((q + dq, r + dr) in cells for dq, dr in neigh)


def test_queen_moves_one_step(spark):
    # test_rules.cpp:20-25
    moves = _moves(spark, "f1_lone_queen", 0)
    assert len(moves) >= 1
    assert all(m.steps == 1 and m.kind == "Slide" for m in moves)


def test_grasshopper_jump(spark):
    # test_rules.cpp:28-37
    moves = _moves(spark, "f2_grasshopper", 0)
    assert any(m.kind == "Jump" for m in moves)


def test_ant_slides_any_distance(spark):
    # test_rules.cpp:39-57
    moves = _moves(spark, "f3_ant", 0)
    assert len(moves) >= 4
    occ = _occupied_cells("f3_ant")
    for m in moves:
        assert (m.to_q, m.to_r) not in occ  # incl. the ant's own start
        assert m.kind == "Slide"


def test_ant_perimeter_bounded(spark):
    # test_rules.cpp:59-92
    moves = _moves(spark, "f4_ant_perimeter", 0)
    assert 0 < len(moves) < 300
    occ = _occupied_cells("f4_ant_perimeter")
    dests = [(m.to_q, m.to_r) for m in moves]
    assert len(dests) == len(set(dests))  # unique
    for m in moves:
        assert (m.to_q, m.to_r) not in occ
        assert m.kind == "Slide"
        assert _adjacent_to_any((m.to_q, m.to_r), occ)  # perimeter


def test_spider_exactly_three_steps(spark):
    # test_rules.cpp:94-124
    moves = _moves(spark, "f5_spider", 0)
    assert moves
    occ = _occupied_cells("f5_spider")
    dests = [(m.to_q, m.to_r) for m in moves]
    assert len(dests) == len(set(dests))
    for m in moves:
        assert m.steps == 3 and m.kind == "Slide"
        assert (m.to_q, m.to_r) not in occ


def test_beetle_climbs_onto_occupied_neighbor(spark):
    # test_rules.cpp:126-139
    moves = _moves(spark, "f6_beetle_climb", 0)
    assert any(m.kind == "Climb" and (m.to_q, m.to_r) == (1, 0) for m in moves)


def test_beetle_ignores_corridor_when_on_top(spark):
    # test_rules.cpp:141-162
    moves = _moves(spark, "f7_beetle_on_top", 1)
    assert any(m.kind == "Slide" and (m.to_q, m.to_r) == (1, 0) for m in moves)


def test_add_and_stack(spark):
    # test_engine.cpp:12-18 (E1 stacking + height renumbering)
    pieces = pieces_df(spark, "f1_lone_queen")
    stacked = add_piece(spark, pieces, 1, "Beetle", "Black", 0, 0)
    cell = stacked.where((F.col("q") == 0) & (F.col("r") == 0)).collect()
    assert len(cell) == 2
    assert sorted(r.height for r in cell) == [0, 1]


def test_add_at_explicit_height_displaces_incumbent(spark):
    # engine.cpp:13 inserts AT the requested index and shifts the
    # incumbent up — even when the new piece's id is larger (the
    # (height, piece_id) renumber tie-break must not bury the insert
    # ABOVE the incumbent it displaces).
    pieces = pieces_df(spark, "f1_lone_queen")  # piece 0 at (0,0) h=0
    stacked = add_piece(spark, pieces, 5, "Beetle", "Black", 0, 0, height=0)
    cell = {r.piece_id: r.height for r in
            stacked.where((F.col("q") == 0) & (F.col("r") == 0)).collect()}
    assert cell == {5: 0, 0: 1}  # insert lands at 0, queen shifted up


def test_add_negative_height_clamps_to_top(spark):
    # engine.cpp:12: height < 0 clamps to stack.size() — i.e. the new
    # piece lands ON TOP, exactly like an omitted height, never at the
    # bottom of the stack.
    pieces = pieces_df(spark, "f1_lone_queen")  # piece 0 at (0,0) h=0
    stacked = add_piece(spark, pieces, 5, "Beetle", "Black", 0, 0, height=-1)
    cell = {r.piece_id: r.height for r in
            stacked.where((F.col("q") == 0) & (F.col("r") == 0)).collect()}
    assert cell == {0: 0, 5: 1}  # queen stays at 0, insert clamped to top


def test_pixel_mapping_deterministic(spark):
    # test_engine.cpp:5-10 (F9): Δ between (1,0) and (0,0) at size 40
    df = spark.createDataFrame([(0, 0), (1, 0)], "q INT, r INT")
    px, py = geometry.axial_to_pixel(F.col("q"), F.col("r"), 40.0)
    rows = {r.q: (r.x, r.y) for r in df.select("q", px.alias("x"), py.alias("y")).collect()}
    dx = rows[1][0] - rows[0][0]
    dy = rows[1][1] - rows[0][1]
    assert math.isclose(dx, 69.282, abs_tol=0.01)
    assert math.isclose(dy, 0.0, abs_tol=0.01)


def test_pixel_roundtrip_identity(spark):
    # F6 cube rounding: axial -> pixel -> axial is the identity
    cells = [(q, r) for q in range(-3, 4) for r in range(-3, 4)]
    df = spark.createDataFrame(cells, "q INT, r INT")
    px, py = geometry.axial_to_pixel(F.col("q"), F.col("r"))
    proj = df.select("q", "r", px.alias("px"), py.alias("py"))
    rq, rr = geometry.pixel_to_axial(F.col("px"), F.col("py"))
    bad = proj.select("q", "r", rq.alias("rq"), rr.alias("rr")).where(
        (F.col("q") != F.col("rq")) | (F.col("r") != F.col("rr"))
    )
    assert bad.isEmpty()


def test_legal_moves_all_matches_per_piece(spark):
    # batched generation ≡ per-piece generation (scale path parity)
    pieces = pieces_df(spark, "f4_ant_perimeter")
    batched = {
        (m.piece_id, m.to_q, m.to_r, m.kind, m.steps)
        for m in legal_moves_all(spark, pieces).collect()
    }
    per_piece = set()
    for pid, *_ in FIXTURES["f4_ant_perimeter"]:
        for m in legal_moves(spark, pieces, pid).collect():
            per_piece.add((m.piece_id, m.to_q, m.to_r, m.kind, m.steps))
    assert batched == per_piece
