"""Benchmark runner (driver contract: one JSON line on stdout).

Runs every registered headline query end-to-end (plan + execute +
collect) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], after one throwaway warm-up action, and
prints ONE COMPACT JSON line {"metric": ..., "value": total_sec,
"unit": "sec", "queries": {10 slowest}, "n_queries": N, "sf": ...}.

The stdout line is deliberately small: round 1's full 78-query dict
overflowed the driver's output-tail capture ("parsed": null in
BENCH_r01.json), so the per-query detail now goes to
bench_detail.json next to this file and stdout carries only the
total + the 10 slowest, rounded to 2 dp.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hive_clone_spark import registry  # noqa: E402
from hive_clone_spark.session import get_spark  # noqa: E402

# Queries excluded from the benchmark (fixture-scale demos, not data-scale).
EXCLUDE_PREFIXES = ("g_",)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    registry.load_all_modules()
    spark = get_spark(app_name="hive-clone-spark-bench")

    # Warm up the JVM / parquet footer caches with throwaway actions on
    # each fact table the query families scan.
    for t in ("lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()

    timings: dict[str, float] = {}
    for name in sorted(registry.QUERIES):
        if name.startswith(EXCLUDE_PREFIXES):
            continue
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 2)
    detail_path = Path(__file__).resolve().parent / "bench_detail.json"
    detail_path.write_text(
        json.dumps(
            {"metric": "headline_queries_total", "value": total, "unit": "sec",
             "queries": timings, "sf": sf},
            indent=1, sort_keys=True,
        )
    )
    slowest = dict(
        sorted(
            ((k, round(v, 2)) for k, v in timings.items()),
            key=lambda kv: -kv[1],
        )[:10]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(timings),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
