"""Property-based game-rule tests (SURVEY.md §5 "new engine's test
strategy"): random connected boards → rule invariants, with a plain
Python hex-BFS as an independent oracle (not the Spark implementation
under test).

Invariants checked, per the reference's semantics:
  * one-hive: applying any generated move leaves the occupied cells a
    single connected component (rules.cpp:61-133 gates every move);
  * slide/jump destinations are empty and hive-adjacent; climbs land on
    occupied cells (rules.cpp:136-331);
  * the move set is invariant under piece-id relabeling (ids are
    storage artifacts, not game state).

Spark jobs are expensive, so examples are few but adversarial: boards
are built by random connected attachment, which generates exactly the
thin bridges and pendants where one-hive logic breaks.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hive_clone_spark.hive_game.fixtures import PIECES_SCHEMA
from hive_clone_spark.hive_game.movegen import legal_moves_all

NEIGH = [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]
BUGS = ["Queen", "Beetle", "Spider", "Grasshopper", "Ant"]


def random_board(seed: int, n_pieces: int) -> list[tuple]:
    """Connected board by random attachment: piece k placed on an empty
    cell adjacent to an existing piece. Both colors present; one queen
    each first so the board is game-plausible."""
    rng = random.Random(seed)
    cells = [(0, 0)]
    occupied = {(0, 0)}
    for _ in range(n_pieces - 1):
        frontier = sorted(
            {
                (q + dq, r + dr)
                for q, r in cells
                for dq, dr in NEIGH
                if (q + dq, r + dr) not in occupied
            }
        )
        cell = rng.choice(frontier)
        cells.append(cell)
        occupied.add(cell)
    rows = []
    for i, (q, r) in enumerate(cells):
        color = "White" if i % 2 == 0 else "Black"
        bug = "Queen" if i < 2 else rng.choice(BUGS)
        rows.append((i, bug, color, True, q, r, 0))
    return rows


def is_connected(cells: set[tuple[int, int]]) -> bool:
    if not cells:
        return True
    seen = {next(iter(cells))}
    stack = list(seen)
    while stack:
        q, r = stack.pop()
        for dq, dr in NEIGH:
            n = (q + dq, r + dr)
            if n in cells and n not in seen:
                seen.add(n)
                stack.append(n)
    return seen == cells


def _board_occupancy(rows) -> dict[tuple[int, int], int]:
    occ: dict[tuple[int, int], int] = {}
    for _, _, _, _, q, r, _ in rows:
        occ[(q, r)] = occ.get((q, r), 0) + 1
    return occ


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000), n_pieces=st.integers(3, 7))
def test_moves_preserve_one_hive_and_target_rules(spark, seed, n_pieces):
    rows = random_board(seed, n_pieces)
    pieces = spark.createDataFrame(rows, PIECES_SCHEMA)
    moves = legal_moves_all(spark, pieces).collect()

    occ = _board_occupancy(rows)
    piece_cell = {pid: (q, r) for pid, _, _, _, q, r, _ in rows}
    piece_bug = {pid: bug for pid, bug, *_ in rows}

    for m in moves:
        frm = piece_cell[m.piece_id]
        to = (m.to_q, m.to_r)
        # target rules: climbs land on occupied, everything else on empty
        if m.kind == "Climb":
            assert occ.get(to, 0) > 0, f"climb onto empty {m}"
            assert piece_bug[m.piece_id] == "Beetle"
        else:
            assert occ.get(to, 0) == 0, f"{m.kind} onto occupied {m}"
        # one-hive after the move (flat boards here: heights all 0)
        after = dict(occ)
        after[frm] -= 1
        if after[frm] == 0:
            del after[frm]
        after[to] = after.get(to, 0) + 1
        assert is_connected(set(after)), f"move breaks hive: {m} on {rows}"


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000))
def test_move_set_invariant_under_id_relabeling(spark, seed):
    rows = random_board(seed, 5)
    pieces = spark.createDataFrame(rows, PIECES_SCHEMA)
    base = {
        (m.piece_id, m.to_q, m.to_r, m.kind, m.steps)
        for m in legal_moves_all(spark, pieces).collect()
    }

    rng = random.Random(seed + 1)
    ids = [r[0] for r in rows]
    shuffled = ids[:]
    rng.shuffle(shuffled)
    mapping = dict(zip(ids, shuffled))
    relabeled = [(mapping[r[0]], *r[1:]) for r in rows]
    relabeled_df = spark.createDataFrame(relabeled, PIECES_SCHEMA)
    got = {
        (m.piece_id, m.to_q, m.to_r, m.kind, m.steps)
        for m in legal_moves_all(spark, relabeled_df).collect()
    }
    want = {(mapping[pid], q, r, k, s) for pid, q, r, k, s in base}
    assert got == want


def test_seeded_random_playout_full_lifecycle(spark):
    """Fuzz the WHOLE rules engine through the EP1-EP3 lifecycle: a
    seeded random playout where every ply enumerates ALL legal actions
    for the turn color (placements via placement_targets gated by
    reserves + queen-by-4th; moves via legal_moves_all gated by
    queen-placed), applies one at random, and checks per-ply
    invariants against INDEPENDENT Python-side recomputation:

      * piece count/reserve accounting,
      * per-cell stack heights contiguous from 0,
      * one-hive connectivity of the occupied cells,
      * evaluate_game_over == a brute-force surround check.
    """
    from hive_clone_spark.hive_game.fixtures import DIRECTIONS
    from hive_clone_spark.hive_game.gameover import evaluate_game_over
    from hive_clone_spark.hive_game.placement import (
        color_status,
        placement_targets,
        reserves,
    )
    from hive_clone_spark.hive_game.state import add_piece, move_piece

    dirs = [(dq, dr) for _, dq, dr in DIRECTIONS]
    rng = random.Random(20260814)
    board = spark.createDataFrame([], PIECES_SCHEMA)
    turn, next_id, n_on_board = "White", 0, 0
    for ply in range(8):
        status = {s.color: s for s in color_status(spark, board).collect()}
        st_ = status.get(turn)
        rem = {
            (x.color, x.bug): x.remaining for x in reserves(spark, board).collect()
        }
        must_queen = (
            st_ is not None and not st_.queen_placed and st_.placements_made >= 3
        )
        bugs = [
            b
            for (c, b), n in rem.items()
            if c == turn and n > 0 and (not must_queen or b == "Queen")
        ]
        actions = [
            ("place", rng.choice(sorted(bugs)), t.to_q, t.to_r)
            for t in placement_targets(spark, board, turn).collect()
        ]
        if st_ is not None and st_.queen_placed:
            actions += [
                ("move", m.piece_id, m.to_q, m.to_r)
                for m in legal_moves_all(spark, board, color=turn).collect()
            ]
        assert actions, f"ply {ply}: {turn} has no legal actions on this board"
        act = rng.choice(sorted(actions))
        if act[0] == "place":
            board = add_piece(spark, board, next_id, act[1], turn, act[2], act[3])
            next_id += 1
            n_on_board += 1
        else:
            board = move_piece(board, act[1], act[2], act[3])
        board = board.localCheckpoint(eager=True)

        rows = board.where("on_board").collect()
        assert len(rows) == n_on_board
        # stack heights contiguous per cell
        by_cell: dict[tuple[int, int], list[int]] = {}
        for r in rows:
            by_cell.setdefault((r.q, r.r), []).append(r.height)
        for cell, hs in by_cell.items():
            assert sorted(hs) == list(range(len(hs))), (cell, hs)
        # one-hive connectivity
        assert is_connected(set(by_cell)), f"ply {ply}: hive split"
        # independent game-over check
        occupied = set(by_cell)
        surround = {}
        for r in rows:
            if r.bug == "Queen":
                n_occ = sum(
                    ((r.q + dq, r.r + dr) in occupied) for dq, dr in dirs
                )
                surround[r.color] = n_occ == 6
        w, b = surround.get("White", False), surround.get("Black", False)
        want = (
            "Draw" if w and b else "BlackWins" if w else "WhiteWins" if b else "None"
        )
        got = evaluate_game_over(spark, board).collect()[0].verdict
        assert got == want, f"ply {ply}: verdict {got} != brute-force {want}"
        if got != "None":
            break
        turn = "Black" if turn == "White" else "White"
