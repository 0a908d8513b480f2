"""Foreign-cwd executor contract (the q228 round-10 lesson).

The driver imports __spark_entry__.py by FILE PATH from its own cwd:
the repo is on the DRIVER's sys.path only because the entry module
inserts it, and executors' Python workers never see that insertion.
Any worker-side closure that references a module-level name therefore
pickles by reference and dies with ModuleNotFoundError — but ONLY
when the process cwd is not the repo root, which is why pytest (repo
cwd) can never catch it directly. This test reproduces the driver's
shape in a subprocess with cwd=/tmp and runs the entry class that
found the bug (stateful streaming with applyInPandasWithState worker
closures) end-to-end.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_SCRIPT = """
import importlib.util, sys
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", {entry_path!r}
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
qs = mod.queries()
for name in ({names!r}):
    rows = qs[name](spark, "/root/testdata/sf0.001").collect()
    assert rows, name
    print("OK", name, len(rows))
"""


def test_worker_closures_survive_foreign_cwd():
    names = ["q228_stream_composite_state", "q68_stream_stateful_ema"]
    script = _SCRIPT.format(
        entry_path=str(REPO / "__spark_entry__.py"), names=names
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=420,
        # scrub the inherited path so the subprocess matches a clean
        # driver environment rather than this pytest process's
        env={
            k: v
            for k, v in __import__("os").environ.items()
            if k != "PYTHONPATH"
        },
    )
    assert proc.returncode == 0, (
        f"foreign-cwd run failed\nstdout: {proc.stdout[-2000:]}\n"
        f"stderr: {proc.stderr[-2000:]}"
    )
    for name in names:
        assert f"OK {name}" in proc.stdout
