"""Worker-side helpers for the stateful streaming entries, split out of
stateful.py (round-10 verdict task 5: scope what ships in closures).

The q228 census runs inside applyInPandasWithState /
transformWithStateInPandas Python state workers, and the driver
contract imports the repo by FILE PATH from a foreign cwd — executors
then have no hive_clone_spark on sys.path, so the state functions
register their helper module with cloudpickle's
``register_pickle_by_value``. Registering all ~1,000 lines of
stateful.py shipped the whole module source in every task; this module
holds ONLY what the state workers execute.

Self-containment contract: no references to other hive_clone_spark
modules; numpy/pandas import inside the functions.
"""

from __future__ import annotations


def census_merge(census: dict, pdf) -> tuple[int, int]:
    """Fold one pandas batch into the per-type census dict; returns
    (rows_added, cents_added). Shared by both stream forms — the same
    IEEE expression the oracle runs: floor(value*100 + 0.5)."""
    import numpy as np

    v = pdf["value"].to_numpy(dtype="float64")
    cents = int(np.floor(v * 100.0 + 0.5).astype(np.int64).sum())
    for et, cnt in pdf.groupby("event_type").size().items():
        census[et] = census.get(et, 0) + int(cnt)
    return len(pdf), cents


def census_row(user_id, n, cents, census):
    import pandas as pd

    # tie-break count DESC then type ASC (mirrors the oracle's rk)
    top_type, top_n = sorted(census.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_cents": [cents],
            "n_types": [len(census)],
            "top_type": [top_type],
            "top_type_n": [top_n],
        }
    )
