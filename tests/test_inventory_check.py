"""CI guard: the generated registry-inventory tables in SURVEY.md and
COVERAGE.md must match the live registry (tools/gen_inventory.py).
Inventory drift — an entry added without regenerating, or a stale
count — fails the suite instead of surfacing as a verdict nit."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))


def test_inventory_tables_in_sync():
    import gen_inventory

    generated = gen_inventory.render()
    for name in ("SURVEY.md", "COVERAGE.md"):
        path = REPO / name
        assert gen_inventory.splice(path, generated) == path.read_text(), (
            f"{name} inventory drifted — run: python tools/gen_inventory.py --write"
        )


def test_every_entry_has_an_oracle():
    """The repo's standing bar: zero rows-only entries."""
    import gen_inventory

    rows = gen_inventory.collect_rows()
    assert len(rows) >= 180
    weak = [r[1] for r in rows if r[3] != "full oracle"]
    assert weak == []
