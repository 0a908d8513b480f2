#!/usr/bin/env python3
"""Regenerate tools/entry_fingerprints.json (round-7 verdict task 1).

For every registered entry, records the md5 of its current source and
the driver round it becomes "valid from":

  * unchanged fingerprint  -> keep the stored valid_from (its existing
    driver-green rows still describe this code);
  * changed fingerprint    -> valid_from = number of CORRECTNESS files
    on disk now, so every pre-rewrite row is voided and the rotation
    (__spark_entry__._effective_history) re-sorts the entry into
    bucket 0 like a new registration;
  * new entry              -> valid_from = current round count (it has
    no rows anyway).

Run after ANY edit to a registered entry's function body; the drift
check in tests/test_entry_order.py fails until you do.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

STORE = REPO / "tools" / "entry_fingerprints.json"


def main() -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py"
    )
    entry_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry_mod)
    from hive_clone_spark import registry

    registry.load_all_modules()

    n_rounds = len(list(REPO.glob("CORRECTNESS_r*.json")))
    try:
        old = json.loads(STORE.read_text())
    except (OSError, ValueError):
        old = {}

    out: dict[str, dict] = {}
    changed, added = [], []
    for name, fn in registry.QUERIES.items():
        fp = entry_mod._entry_fingerprint(fn)
        rec = old.get(name)
        if rec is None:
            out[name] = {"fp": fp, "valid_from": n_rounds}
            added.append(name)
        elif rec.get("fp") != fp:
            out[name] = {"fp": fp, "valid_from": n_rounds}
            changed.append(name)
        else:
            out[name] = rec
    removed = sorted(set(old) - set(out))

    STORE.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(
        f"{len(out)} entries; +{len(added)} new, ~{len(changed)} changed "
        f"(valid_from={n_rounds}), -{len(removed)} removed"
    )
    for n in changed:
        print(f"  changed: {n}")
    for n in added:
        print(f"  new:     {n}")


if __name__ == "__main__":
    main()
