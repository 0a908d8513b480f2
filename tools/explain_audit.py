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
