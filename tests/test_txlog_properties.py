"""Property test for the commit-log snapshot fold — the invariant the
whole table format rests on: the active file set (and stats / DV
bindings) at ANY version is a pure fold over commits 0..V, identical
whether replay starts at commit 0 or at an intermediate checkpoint
(checkpoints land automatically every _CHECKPOINT_EVERY commits, so
long random sequences cross several), and vacuum never changes what a
RETAINED version reads.

Spark-free: active_files / scan_files / dvs / table_meta are pure log
metadata, so the model check costs milliseconds per example and the
sequences can be long enough to exercise checkpoint boundaries.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_clone_spark.sources.txlog import _CHECKPOINT_EVERY, TxLog

# ops: ("add", n_files) | ("remove", k_existing) | ("dv", k_existing)
#    | ("meta", tag) | ("schema", tag)
op_strategy = st.one_of(
    st.tuples(st.just("add"), st.integers(min_value=1, max_value=3)),
    st.tuples(st.just("remove"), st.integers(min_value=1, max_value=3)),
    st.tuples(st.just("dv"), st.integers(min_value=0, max_value=2)),
    st.tuples(st.just("meta"), st.integers(min_value=0, max_value=5)),
    st.tuples(st.just("schema"), st.integers(min_value=0, max_value=3)),
)


@settings(max_examples=30, deadline=None)
@given(ops=st.lists(op_strategy, min_size=1, max_size=3 * _CHECKPOINT_EVERY))
def test_snapshot_fold_matches_model(tmp_path_factory, ops):
    tl = TxLog(str(tmp_path_factory.mktemp("txprop") / "log")).create()
    counter = 0
    # model[v] = (files, stats, dvs, meta, schema): schema is a
    # versioned full-replacement action like meta — the round-12 fix
    # (it used to be a shared mutable sidecar outside the log)
    model: list[tuple[frozenset, dict, dict, dict, dict | None]] = []
    files: set[str] = set()
    stats: dict[str, dict] = {}
    dvs: dict[str, str] = {}
    meta: dict = {}
    schema: dict | None = None
    for kind, arg in ops:
        if kind == "add":
            adds = []
            for _ in range(arg):
                name = f"data/f{counter:04d}.parquet"
                counter += 1
                adds.append({"file": name, "stats": {"k": [counter, counter + 9]}})
                files.add(name)
                stats[name] = {"k": [counter, counter + 9]}
            tl.commit("append", add=adds)
        elif kind == "remove":
            victims = sorted(files)[:arg]
            for v in victims:
                files.discard(v)
                stats.pop(v, None)
                dvs.pop(v, None)
            tl.commit("delete", remove=victims)
        elif kind == "dv":
            live = sorted(files)
            if not live:
                tl.commit("noop")  # a commit with no actions is legal
            else:
                target = live[arg % len(live)]
                sidecar = f"dv/{counter:04d}.json"
                counter += 1
                tl.commit("dv", dv=[{"file": target, "dv": sidecar}])
                dvs[target] = sidecar
        elif kind == "schema":  # versioned logical-schema replacement
            schema = {"tag": arg}
            tl.commit("schema-change", schema=dict(schema))
        else:  # meta: full-replacement table metadata
            meta = {"tag": arg}
            tl.commit("meta", meta=dict(meta))
        model.append(
            (frozenset(files), dict(stats), dict(dvs), dict(meta),
             dict(schema) if schema is not None else None)
        )

    # every version's snapshot equals the model fold at that version —
    # including versions BELOW checkpoint floors (replay must pick the
    # nearest checkpoint at or below, never one above)
    for v, (mf, mstats, mdvs, mmeta, mschema) in enumerate(model):
        assert set(tl.active_files(v)) == set(mf), f"v{v} files"
        assert tl.dvs(v) == mdvs, f"v{v} dvs"
        assert tl.table_meta(v) == mmeta, f"v{v} meta"
        assert tl._replay(v)[4] == mschema, f"v{v} schema"
        all_f, chosen = tl.scan_files("k", 0, 10**9, version=v)
        assert set(all_f) == set(mf)
        assert set(chosen) == set(mf)  # full range: stats prune nothing
        # and a real range prunes exactly the stats-disjoint files
        _, narrow = tl.scan_files("k", 0, 0, version=v)
        assert narrow == [
            f for f in sorted(mf) if f not in mstats
        ], f"v{v} stats pruning"

    # vacuum: retained versions read identically afterward; versions
    # below the cutoff become a clean error (their commits are gone)
    latest = tl.latest_version()
    retain = max(1, len(model) // 2)
    cut = tl.vacuum(retain_versions=retain)["cutoff"]
    for v, (mf, _s, mdvs, _m, mschema) in enumerate(model):
        if v >= cut:
            assert set(tl.active_files(v)) == set(mf), f"post-vacuum v{v}"
            assert tl.dvs(v) == mdvs
            # schema survives vacuum through the pinned checkpoint
            assert tl._replay(v)[4] == mschema, f"post-vacuum v{v} schema"
        else:
            with pytest.raises((ValueError, FileNotFoundError)):
                tl.active_files(v)
    assert tl.latest_version() == latest


branch_op_strategy = st.one_of(
    st.tuples(st.just("add"), st.integers(min_value=1, max_value=2)),
    st.tuples(st.just("remove"), st.integers(min_value=1, max_value=2)),
)


@settings(max_examples=25, deadline=None)
@given(
    n_base=st.integers(min_value=0, max_value=4),
    branch_ops=st.lists(branch_op_strategy, min_size=0, max_size=6),
    main_moves=st.integers(min_value=0, max_value=2),
)
def test_branch_wap_publish_matches_model(
    tmp_path_factory, n_base, branch_ops, main_moves
):
    """Write-audit-publish model: a branch snapshot is the main fold at
    its base plus the branch's own commits; publish_branch makes main
    EXACTLY the branch's file set in one atomic net-diff commit, even
    when main moved since branching; and a stale optimistic token
    conflicts instead of clobbering."""
    from hive_clone_spark.sources.txlog import CommitConflictError

    tl = TxLog(str(tmp_path_factory.mktemp("txwap") / "log")).create()
    counter = 0

    def fresh_files(n):
        nonlocal counter
        out = []
        for _ in range(n):
            out.append(f"data/f{counter:04d}.parquet")
            counter += 1
        return out

    main_files: set[str] = set()
    for _ in range(n_base):
        adds = fresh_files(2)
        main_files.update(adds)
        tl.commit("append", add=[{"file": f} for f in adds])

    tl.create_branch("wip")
    branch_files = set(main_files)
    for kind, arg in branch_ops:
        if kind == "add":
            adds = fresh_files(arg)
            branch_files.update(adds)
            tl.branch_commit("wip", "append", add=[{"file": f} for f in adds])
        else:
            victims = sorted(branch_files)[:arg]
            for v in victims:
                branch_files.discard(v)
            tl.branch_commit("wip", "delete", remove=victims)
    bfiles, _, _, _ = tl.branch_replay("wip")
    assert bfiles == branch_files, "branch fold"

    # main drifts while the branch is audited
    base_version = tl.latest_version()
    for _ in range(main_moves):
        adds = fresh_files(1)
        main_files.update(adds)
        tl.commit("append", add=[{"file": f} for f in adds])

    if main_moves:
        # stale token: publish must conflict, not clobber
        with pytest.raises(CommitConflictError):
            tl.publish_branch("wip", expected_version=base_version)
        assert set(tl.active_files() if tl.latest_version() >= 0 else []) == main_files

    tl.publish_branch("wip", expected_version=tl.latest_version())
    assert set(tl.active_files()) == branch_files, "post-publish main"
    # the branch snapshot itself is untouched by publishing
    bfiles2, _, _, _ = tl.branch_replay("wip")
    assert bfiles2 == branch_files


@settings(max_examples=25, deadline=None)
@given(
    # (txn_id, redeliver) — duplicates across the sequence ARE the test
    batches=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), st.booleans()),
        min_size=1,
        max_size=10,
    )
)
def test_commit_idempotent_exactly_once(tmp_path_factory, batches):
    """Exactly-once sink contract: a redelivered batch (same txn id)
    is dropped — the table state and version count advance only on
    FIRST delivery, no matter how deliveries interleave."""
    tl = TxLog(str(tmp_path_factory.mktemp("txidem") / "log")).create()
    counter = 0
    applied: dict[int, str] = {}  # txn -> the file its first delivery added
    for txn, redeliver in batches:
        name = f"data/f{counter:04d}.parquet"
        counter += 1
        v = tl.commit_idempotent(f"app-{txn}", "append", add=[{"file": name}])
        if txn in applied:
            assert v is None, "redelivered txn must be dropped"
        else:
            assert v is not None
            applied[txn] = name
        if redeliver:  # immediate duplicate delivery
            assert tl.commit_idempotent(
                f"app-{txn}", "append", add=[{"file": name}]
            ) is None
    assert set(tl.active_files()) == set(applied.values())
    assert tl.latest_version() == len(applied) - 1
