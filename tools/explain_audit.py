"""Plan audit: dump the formatted physical plan of every registered
query and flag scale anti-patterns.

Red flags hunted:
  * CartesianProduct / BroadcastNestedLoopJoin on non-tiny inputs —
    a quadratic join that never survives a scale-up;
  * BatchEvalPython — a row-at-a-time Python UDF in the plan (only
    ArrowEvalPython / FlatMapGroupsInPandas are acceptable Python
    boundaries);
  * parquet scans without PushedFilters when the query filters on a
    scanned column (pushdown lost).

NESTEDLOOP is a review flag, not an automatic failure: a
BroadcastNestedLoopJoin whose build side is a literal handful of rows
(q18's 4 price bands, p_knn_*'s 5 query vectors, the 6-row hex
directions dim) is the intended plan for a theta join against a tiny
dimension. Anything bigger on the build side must become an equi join
(see p_dedup_simhash's band explode for the pattern).

Codegen is NOT audited from the static plan: with AQE enabled the
formatted explain of an unexecuted query carries no `codegen id`
markers, so the check would flag every query.

Usage: python tools/explain_audit.py [name ...]   (default: all)
Writes per-query plans to /tmp/plans/<name>.txt and prints a summary
line per query: flags or 'ok'.
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hive_clone_spark import registry  # noqa: E402
from hive_clone_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


_TREE_NODE = re.compile(r"^(\s*)(?:[+\-:*\s]*)\s*([A-Za-z][A-Za-z0-9]*) \((\d+)\)\s*$")

# Nodes that pass their input through 1:1 (or shrink it) — walking the
# direct child chain of a Window through these finds what actually
# bounds (or fails to bound) the window's input row count.
_PASSTHROUGH = {
    "Sort",
    "Project",
    "Filter",
    "Exchange",
    "Window",
    "WindowGroupLimit",
    "AQEShuffleRead",
    "ShuffleQueryStage",
    "ColumnarToRow",
    "InputAdapter",
    "WholeStageCodegen",
}
_BOUNDING = {"TakeOrderedAndProject", "GlobalLimit", "CollectLimit", "LocalLimit"}


def _split_toplevel_lists(s: str) -> list[str]:
    """Split 'Arguments: [a], [b], [c]' into its top-level [...] groups."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start is not None:
                groups.append(s[start : i + 1])
                start = None
    return groups


def _unbounded_global_windows(plan: str) -> bool:
    """True iff the plan has a Window with an EMPTY partition spec whose
    input is fed by an Exchange SinglePartition with no limit node on the
    direct child chain — i.e. a global sort-all-rows window that would
    single-partition an unbounded input at scale. A global window whose
    chain shows TakeOrderedAndProject/GlobalLimit first is bounded and
    fine (the p_vocab_build limit-first shape)."""
    lines = plan.splitlines()
    # tree section: from '== Physical Plan ==' to the first blank line
    try:
        t0 = next(i for i, ln in enumerate(lines) if ln.startswith("== Physical Plan"))
    except StopIteration:
        return False
    tree = []  # (indent, node_name, node_id)
    for ln in lines[t0 + 1 :]:
        if not ln.strip():
            break
        m = _TREE_NODE.match(ln)
        if m:
            tree.append((len(ln) - len(ln.lstrip()), m.group(2), m.group(3)))
    # node details: '(N) NodeName' blocks -> their text
    details: dict[str, str] = {}
    cur = None
    for ln in lines:
        m = re.match(r"^\((\d+)\) [A-Za-z]", ln)
        if m:
            cur = m.group(1)
            details[cur] = ""
        elif cur is not None:
            details[cur] += ln + "\n"
    for idx, (indent, nm, nid) in enumerate(tree):
        if nm != "Window":
            continue
        args_line = next(
            (l for l in details.get(nid, "").splitlines() if l.startswith("Arguments:")),
            "",
        )
        if len(_split_toplevel_lists(args_line)) >= 3:
            continue  # partitioned window
        # walk the direct child chain (strictly deeper indents following)
        saw_single_exchange = False
        bounded = False
        for cindent, cnm, cnid in tree[idx + 1 :]:
            if cindent <= indent:
                break
            if cnm in _BOUNDING:
                bounded = True
                break
            if cnm == "Exchange" and "SinglePartition" in details.get(cnid, ""):
                saw_single_exchange = True
            if cnm not in _PASSTHROUGH:
                break  # agg/join/scan — bounding must come from semantics
        if saw_single_exchange and not bounded:
            return True
    return False


def audit(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan:
        # acceptable when one side is a handful of literal rows; flag for review
        flags.append("NESTEDLOOP")
    if "BatchEvalPython" in plan:
        flags.append("ROWPYTHON")
    if re.search(r"PushedFilters: \[\]", plan) and "Filter" in plan:
        flags.append("NOPUSHDOWN?")
    if _unbounded_global_windows(plan):
        # unpartitioned window whose input is NOT limit-bounded: every
        # row funnels through one partition's sort — the p_dedup_chunk
        # round-5 defect. Fix shape: orderBy().limit(k) first
        # (TakeOrderedAndProject), THEN rank over the k survivors.
        flags.append("GLOBALWINDOW")
    if name == "q37_salted_join":
        # the manual salt must survive into the physical join keys —
        # if an optimizer change or refactor drops it, the hot key
        # collapses back onto one partition (tests/test_bench_gate.py
        # runs the same check in CI)
        key_lines = [
            ln for ln in plan.splitlines() if re.search(r"(Left|Right) keys \[", ln)
        ]
        if not key_lines or any("salt" not in ln for ln in key_lines):
            flags.append("SALTLOST")
    return flags


def main() -> None:
    registry.load_all_modules()
    spark = get_spark(app_name="plan-audit", shuffle_partitions=8)
    names = sys.argv[1:] or sorted(registry.QUERIES)
    outdir = Path("/tmp/plans")
    outdir.mkdir(exist_ok=True)
    for name in names:
        try:
            df = registry.QUERIES[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {str(e)[:120]}")
            continue
        (outdir / f"{name}.txt").write_text(plan)
        flags = audit(name, plan)
        print(f"{name}: {' '.join(flags) if flags else 'ok'}")


if __name__ == "__main__":
    main()
