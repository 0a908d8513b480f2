"""Scripted-opening integration test: plays the first plies of a game
through the domain layer (placement targets → add_piece → move
generation → move_piece → game-over), asserting the reference's rules
at every step. The reference has no end-to-end game test (SURVEY.md §5
gap) — this closes it on our side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_clone_spark.hive_game.fixtures import PIECES_SCHEMA
from hive_clone_spark.hive_game.gameover import evaluate_game_over
from hive_clone_spark.hive_game.movegen import legal_moves
from hive_clone_spark.hive_game.placement import color_status, placement_targets, reserves
from hive_clone_spark.hive_game.state import add_piece, move_piece


def _cells(df):
    cols = [c for c in ("q", "r", "to_q", "to_r") if c in df.columns][:2]
    return {(r[0], r[1]) for r in df.select(*cols).collect()}


def _board_tuples(df):
    return sorted(
        (r.piece_id, r.bug, r.color, r.q, r.r, r.height)
        for r in df.where("on_board").collect()
    )


def test_full_game_to_blackwins(spark):
    """Complete game through the EP1-EP3 lifecycle (place/move gated by
    the rules, game-over re-checked per ply — ui_app.cpp:151-155,
    187-191) ending in a terminal BlackWins; the final board must equal
    the g4 fixture that backs the g_full_game_blackwins driver entry."""
    from hive_clone_spark.hive_game.fixtures import FIXTURES
    from hive_clone_spark.hive_game.game import SCRIPT_BLACKWINS, play_game

    verdict, board, verdicts = play_game(spark, SCRIPT_BLACKWINS)
    assert verdict == "BlackWins"
    # every non-final ply leaves the game live; only the last ends it
    assert verdicts[:-1] == ["None"] * (len(SCRIPT_BLACKWINS) - 1)
    assert verdicts[-1] == "BlackWins"
    want = sorted(FIXTURES["g4_full_game_blackwins"])
    assert _board_tuples(board) == want


def test_full_game_to_draw(spark):
    """Complete game ending in a simultaneous double surround (the last
    ant fills the one cell adjacent to BOTH queens): Draw, with the
    terminal board equal to the g5 fixture behind g_full_game_draw."""
    from hive_clone_spark.hive_game.fixtures import FIXTURES
    from hive_clone_spark.hive_game.game import SCRIPT_DRAW, play_game

    verdict, board, verdicts = play_game(spark, SCRIPT_DRAW)
    assert verdict == "Draw"
    assert verdicts[:-1] == ["None"] * (len(SCRIPT_DRAW) - 1)
    assert _board_tuples(board) == sorted(FIXTURES["g5_full_game_draw"])


def test_play_game_rejects_illegal_plies(spark):
    """The lifecycle gate rejects out-of-turn actions, occupied/\
unreachable targets, pre-queen moves, and post-terminal plies."""
    import pytest

    from hive_clone_spark.hive_game.game import (
        SCRIPT_BLACKWINS,
        IllegalPly,
        play_game,
    )

    # Black tries to open (White moves first)
    with pytest.raises(IllegalPly, match="out of turn"):
        play_game(spark, [("place", 0, "Queen", "Black", 0, 0)])
    # second placement on an occupied cell
    with pytest.raises(IllegalPly, match="not a legal"):
        play_game(
            spark,
            [
                ("place", 0, "Queen", "White", 0, 0),
                ("place", 1, "Queen", "Black", 0, 0),
            ],
        )
    # moving before the queen is placed (P9)
    with pytest.raises(IllegalPly, match="before queen"):
        play_game(
            spark,
            [
                ("place", 0, "Ant", "White", 0, 0),
                ("place", 1, "Queen", "Black", 1, 0),
                ("move", 0, -1, 0),
            ],
        )
    # playing past the terminal ply
    with pytest.raises(IllegalPly, match="already over"):
        play_game(
            spark, SCRIPT_BLACKWINS + [("place", 8, "Spider", "White", -3, 0)]
        )


def test_scripted_opening(spark):
    empty = spark.createDataFrame([], PIECES_SCHEMA)

    # ply 0 — empty board: the only placement is the origin
    assert _cells(placement_targets(spark, empty, "White")) == {(0, 0)}

    # ply 1 — White queen at (0,0)
    board = add_piece(spark, empty, 0, "Queen", "White", 0, 0)

    # ply 2 — Black's FIRST placement may touch the opponent: all six
    # neighbors of (0,0) are legal (ui_app.cpp:576-578 quirk preserved)
    tgts = _cells(placement_targets(spark, board, "Black"))
    assert tgts == {(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)}
    board = add_piece(spark, board, 1, "Queen", "Black", 1, 0)

    # ply 3 — White's second placement must touch White and NOT Black
    tgts = _cells(placement_targets(spark, board, "White"))
    assert tgts, "White must have placements"
    black_adj = {(1 + dq, 0 + dr) for dq, dr in
                 [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]}
    white_adj = {(0 + dq, 0 + dr) for dq, dr in
                 [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]}
    assert tgts <= (white_adj - black_adj)
    board = add_piece(spark, board, 2, "Ant", "White", -1, 0)

    # reserves track placements: White used 1 queen + 1 ant
    res = {(r.color, r.bug): r.remaining for r in reserves(spark, board).collect()}
    assert res[("White", "Queen")] == 0
    assert res[("White", "Ant")] == 2
    assert res[("Black", "Queen")] == 0
    assert res[("Black", "Ant")] == 3

    # both queens are placed (move gate P9 satisfied for both)
    status = {r.color: r for r in color_status(spark, board).collect()}
    assert status["White"].queen_placed and status["Black"].queen_placed

    # one-hive: the white queen at (0,0) is the bridge between (1,0)
    # and (-1,0) — it must have NO legal moves
    assert legal_moves(spark, board, 0).collect() == []

    # the white ant (a leaf of the hive) must have moves, all slides
    # onto empty perimeter cells
    ant_moves = legal_moves(spark, board, 2).collect()
    assert len(ant_moves) >= 4
    occupied = _cells(board.where("on_board"))
    for m in ant_moves:
        assert (m.to_q, m.to_r) not in occupied
        assert m.kind == "Slide"

    # ply 4 — apply one ant move; the board stays connected and the
    # game is not over
    mv = sorted(ant_moves, key=lambda m: (m.to_q, m.to_r))[0]
    board = move_piece(board, 2, mv.to_q, mv.to_r)
    assert board.where("on_board").count() == 3
    assert evaluate_game_over(spark, board).collect()[0].verdict == "None"

    # endgame — surround the black queen at (1,0) with six pieces:
    # game over, White wins
    endgame = board
    ring = [(2, 0), (2, -1), (1, -1), (0, 0), (0, 1), (1, 1)]
    next_id = 10
    for q, r in ring:
        if (q, r) not in _cells(endgame.where("on_board")):
            endgame = add_piece(spark, endgame, next_id, "Beetle", "White", q, r)
            next_id += 1
    assert evaluate_game_over(spark, endgame).collect()[0].verdict == "WhiteWins"
