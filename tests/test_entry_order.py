"""Rotation integrity for the driver window (__spark_entry__.queries).

The driver checks only the first N entries of queries() per round, so
the emission order IS the coverage strategy: entries with the least
correctness signal (fewest green CORRECTNESS_r* rows) must come
first, ties broken stably, and every registered query must appear
exactly once. These tests pin that contract so a registry change or a
new CORRECTNESS file can't silently starve never-checked entries.
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_spec = importlib.util.spec_from_file_location(
    "__spark_entry__", REPO / "__spark_entry__.py"
)
entry_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(entry_mod)


def _history() -> list[dict]:
    out = []
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        try:
            out.append(json.loads(p.read_text()))
        except (OSError, json.JSONDecodeError):
            continue
    return out


def test_queries_cover_registry_exactly_once():
    from hive_clone_spark import registry

    registry.load_all_modules()
    names = list(entry_mod.queries())
    assert len(names) == len(set(names))
    assert set(names) == set(registry.QUERIES)


def _eff(n, history, registry):
    """The entry's effective (fingerprint-valid) history slice."""
    store = entry_mod._load_fingerprint_store()
    return entry_mod._effective_history(
        n, registry.QUERIES[n], history, store
    )


def _reserve(history, registry):
    """The round's game-refresh reserve set (mirrors queries())."""
    store = entry_mod._load_fingerprint_store()
    return entry_mod._game_reserve(list(registry.QUERIES), history, store)


def _bucket(n, history, registry, reserve=frozenset()):
    """Effective primary key: 0 for never-green, age-floor-stale (the
    floor is preemptive: one round BEFORE breach), or game-reserve
    entries, else rounds-green (mirrors _emit_key, including the
    fingerprint gate on which history rows count)."""
    eff = _eff(n, history, registry)
    green = entry_mod._rounds_green(n, eff, has_oracle=n in registry.ORACLE)
    stale = entry_mod._rounds_stale(n, eff)
    if not any(n in rows for rows in eff):
        stale = len(history) + 1
    return 0 if (n in reserve or stale >= entry_mod._AGE_FLOOR - 1) else green


def test_least_signal_entries_emit_first():
    """Primary sort key: the effective bucket (rounds-green with the
    age floor collapsing stale entries to 0) must be non-decreasing
    across the emitted order, so the driver's fixed-size window always
    lands on the entries with the least / oldest signal."""
    from hive_clone_spark import registry

    registry.load_all_modules()
    history = _history()
    names = list(entry_mod.queries())
    reserve = _reserve(history, registry)
    buckets = [_bucket(n, history, registry, reserve) for n in names]
    assert all(a <= b for a, b in zip(buckets, buckets[1:])), (
        "bucket not monotonic: "
        + str([(n, g) for n, g in zip(names, buckets)][:10])
    )


def test_age_floor_entries_emit_in_head():
    """Any entry whose latest driver row is >= _AGE_FLOOR rounds old
    must emit before every non-stale green entry — the rotation that
    guarantees no signal ages out indefinitely."""
    from hive_clone_spark import registry

    registry.load_all_modules()
    history = _history()
    names = list(entry_mod.queries())
    def _stale(n):
        eff = _eff(n, history, registry)
        if not any(n in rows for rows in eff):
            return len(history) + 1
        return entry_mod._rounds_stale(n, eff)

    reserve = _reserve(history, registry)
    stale_idx = [
        i for i, n in enumerate(names) if _stale(n) >= entry_mod._AGE_FLOOR
    ]
    nonstale_green_idx = [
        i for i, n in enumerate(names) if _bucket(n, history, registry, reserve) > 0
    ]
    if stale_idx and nonstale_green_idx:
        assert max(stale_idx) < min(nonstale_green_idx)


def test_new_entries_outrank_nonstale_green_entries():
    """A freshly registered query (no CORRECTNESS history at all) must
    appear before every NON-STALE entry that has already been green —
    the rotation that earns new operators their first driver row.
    (Age-floor-stale green entries share bucket 0 with new entries, but
    a new entry's staleness of n_rounds+1 still sorts it ahead of any
    previously-recorded entry inside the bucket.)"""
    from hive_clone_spark import registry

    registry.load_all_modules()
    history = _history()
    names = list(entry_mod.queries())
    greens = {
        n: entry_mod._rounds_green(
            n, _eff(n, history, registry), has_oracle=n in registry.ORACLE
        )
        for n in names
    }
    never = [n for n in names if greens[n] == 0]
    if not never:  # every entry green at least once — rotation complete
        return
    reserve = _reserve(history, registry)
    first_nonstale_green_idx = min(
        (i for i, n in enumerate(names) if _bucket(n, history, registry, reserve) > 0),
        default=len(names),
    )
    last_never_idx = max(i for i, n in enumerate(names) if greens[n] == 0)
    assert last_never_idx < first_nonstale_green_idx


def test_stalest_entries_emit_first_within_green_cohort():
    """Secondary sort key: within a same-rounds-green cohort (and same
    r1-flag class), entries the driver has not recorded for more rounds
    must emit earlier, so a green signal can never age indefinitely."""
    from hive_clone_spark import registry

    registry.load_all_modules()
    history = _history()
    names = list(entry_mod.queries())
    reserve = _reserve(history, registry)
    keyed = []
    for n in names:
        b, f, neg_s, _ = entry_mod._emit_key(
            n,
            _eff(n, history, registry),
            has_oracle=n in registry.ORACLE,
            reg_order=0,
            n_rounds=len(history),
            reserved=n in reserve,
        )
        keyed.append((b, f, -neg_s))
    for (g1, f1, s1), (g2, f2, s2) in zip(keyed, keyed[1:]):
        if (g1, f1) == (g2, f2):
            assert s1 >= s2, (g1, f1, s1, s2)


def test_preemptive_age_floor_boundary():
    """The floor is preemptive (round 12): an entry at staleness
    _AGE_FLOOR-1 joins bucket 0 THIS round — re-checking at the floor
    itself would read a signal that already violated the promise. One
    round younger stays in its green bucket."""
    floor = entry_mod._AGE_FLOOR
    green_row = {"x": {"hash_match": True, "err": None}}

    def hist(stale):
        # one green row, then `stale` rounds without a row
        return [green_row] + [{}] * stale

    at_breach_minus_1 = entry_mod._emit_key(
        "x", hist(floor - 1), True, 0, n_rounds=floor
    )
    assert at_breach_minus_1[0] == 0  # preemptive: bucket 0
    younger = entry_mod._emit_key(
        "x", hist(floor - 2), True, 0, n_rounds=floor - 1
    )
    assert younger[0] == 1  # still competes as a green entry


def test_rounds_stale_semantics():
    history = [{"a": {}}, {"b": {}}, {"b": {}, "c": {}}]
    assert entry_mod._rounds_stale("c", history) == 0
    assert entry_mod._rounds_stale("b", history) == 0
    assert entry_mod._rounds_stale("a", history) == 2
    assert entry_mod._rounds_stale("never", history) == 4


def test_fingerprint_store_is_current():
    """tools/entry_fingerprints.json must cover every registered entry
    with its LIVE source fingerprint — a stale store would silently
    void (or worse, wrongly credit) driver history. Re-run
    tools/update_fingerprints.py after editing any entry body."""
    from hive_clone_spark import registry

    registry.load_all_modules()
    store = entry_mod._load_fingerprint_store()
    missing = [n for n in registry.QUERIES if n not in store]
    assert not missing, f"run tools/update_fingerprints.py (missing: {missing[:5]})"
    stale = [
        n
        for n, fn in registry.QUERIES.items()
        if store[n]["fp"] != entry_mod._entry_fingerprint(fn)
    ]
    assert not stale, f"run tools/update_fingerprints.py (changed: {stale[:5]})"
    dangling = sorted(set(store) - set(registry.QUERIES))
    assert not dangling, f"run tools/update_fingerprints.py (dangling: {dangling[:5]})"


def test_rewritten_entry_resorts_into_bucket_zero():
    """A changed source fingerprint (or a valid_from bump) must void
    pre-rewrite driver rows: the entry's effective history goes empty,
    it becomes maximally stale, and _emit_key lands it in bucket 0 like
    a new registration — the round-7 verdict's change-aware rotation."""
    from hive_clone_spark import registry

    registry.load_all_modules()
    name = next(iter(registry.QUERIES))
    fn = registry.QUERIES[name]
    fp = entry_mod._entry_fingerprint(fn)
    history = [{name: {"hash_match": True, "err": None}}] * 5

    # Unchanged fingerprint: full history counts, entry is green+fresh.
    eff = entry_mod._effective_history(
        name, fn, history, {name: {"fp": fp, "valid_from": 0}}
    )
    assert len(eff) == 5
    key_green = entry_mod._emit_key(name, eff, True, 0, n_rounds=5)
    assert key_green[0] == 5  # 5 rounds green

    # Changed fingerprint: history voided, bucket 0, maximally stale.
    eff2 = entry_mod._effective_history(
        name, fn, history, {name: {"fp": "deadbeef", "valid_from": 0}}
    )
    assert eff2 == []
    key_new = entry_mod._emit_key(name, eff2, True, 0, n_rounds=5)
    assert key_new[0] == 0 and key_new[2] == -6

    # valid_from bump voids only earlier rounds.
    eff3 = entry_mod._effective_history(
        name, fn, history, {name: {"fp": fp, "valid_from": 3}}
    )
    assert len(eff3) == 2


def test_r7_rewrites_have_voided_history():
    """q82/q85/q87 were rewritten in round 7 after earning green rows in
    their vacuous forms; their stored valid_from must void those rows so
    the driver re-checks the discriminating rewrites (VERDICT r7 #2)."""
    store = entry_mod._load_fingerprint_store()
    for n in (
        "q82_nested_semijoin",
        "q85_value_share_threshold",
        "q87_idle_customers",
    ):
        assert store[n]["valid_from"] >= 7, (n, store[n])


def test_oracle_keys_subset_of_queries():
    """Every oracle must belong to a registered query (a stray key
    would make the driver compare against nothing)."""
    qs = set(entry_mod.queries())
    assert set(entry_mod.oracle_sql()) <= qs


def test_update_fingerprints_tool_semantics(tmp_path, monkeypatch):
    """tools/update_fingerprints.py: unchanged entries keep their
    valid_from; changed fingerprints bump valid_from to the current
    round count; removed entries drop out."""
    import json
    import subprocess
    import sys

    store = REPO / "tools" / "entry_fingerprints.json"
    before = json.loads(store.read_text())
    # run the tool against the live repo: must be a no-op (the store
    # is committed current — drift test above guarantees it)
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "update_fingerprints.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    assert "~0 changed" in out.stdout and "+0 new" in out.stdout
    after = json.loads(store.read_text())
    assert after == before


def test_escort_and_game_reserve_land_in_window():
    """Round-10 rotation additions: (a) never-green escort entries
    (_ESCORT) must emit ahead of the never-checked cohort instead of
    queueing behind 100+ entries by registration order; (b) the
    game-refresh reserve — at most _GAME_RESERVE_SLOTS previously
    checked g_* entries at/past _GAME_REFRESH_AGE staleness — must
    emit right after the flag-0 tier, inside any plausible driver
    window, because the bench-excluded g_* block is otherwise only
    ever touched here."""
    from hive_clone_spark import registry

    registry.load_all_modules()
    history = _history()
    names = list(entry_mod.queries())
    reserve = _reserve(history, registry)
    assert len(reserve) <= entry_mod._GAME_RESERVE_SLOTS
    greens = {
        n: entry_mod._rounds_green(
            n, _eff(n, history, registry), has_oracle=n in registry.ORACLE
        )
        for n in names
    }
    for n in entry_mod._ESCORT:
        if n in greens and greens[n] == 0:
            assert names.index(n) < 20, (n, names.index(n))
    for n in reserve:
        assert names.index(n) < 20, (n, names.index(n))
        # reserve members are real re-checks: previously green g_*
        assert n.startswith("g_") and greens[n] > 0
