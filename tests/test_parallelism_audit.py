"""Frontier probe of tools/parallelism_audit.py (round-10 advice):
getJobInfo returns None for EVICTED ids too (spark.ui.retainedJobs),
so a single-None stop under-detects the frontier and mis-attributes
the next query's jobs. The probe must tolerate bounded gaps and seed
from the tracker's active ids; Spark-free via a fake StatusTracker.
"""

from __future__ import annotations

from tools.parallelism_audit import _PROBE_GAP, _max_job_id


class FakeTracker:
    def __init__(self, known: set[int], active: list[int] = ()):  # noqa: D401
        self.known = known
        self.active = list(active)

    def getJobInfo(self, jid: int):
        return ("job", jid) if jid in self.known else None

    def getActiveJobIds(self):
        return self.active


def test_probe_finds_contiguous_frontier():
    st = FakeTracker(known={0, 1, 2, 3})
    assert _max_job_id(st, -1) == (3, False)


def test_probe_crosses_eviction_gap_and_reports_it():
    # ids 0-2 evicted, 3-5 retained: a single-None stop at cursor=-1
    # would report frontier -1 and attribute jobs 0-5 to the NEXT query
    st = FakeTracker(known={3, 4, 5})
    frontier, hit_gap = _max_job_id(st, -1)
    assert frontier == 5
    assert hit_gap is True


def test_probe_seeds_from_active_ids_past_a_wide_gap():
    # the gap exceeds the bounded probe, but the tracker's active list
    # names a live job beyond it — the frontier must not fall short
    far = _PROBE_GAP * 3
    st = FakeTracker(known={far, far + 1}, active=[far])
    assert _max_job_id(st, -1) == (far + 1, False)


def test_probe_stops_after_bounded_miss_run():
    st = FakeTracker(known={0})
    frontier, hit_gap = _max_job_id(st, -1)
    assert frontier == 0
    assert hit_gap is False
