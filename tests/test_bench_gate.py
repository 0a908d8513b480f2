"""Bench regression gate (tools/bench_gate.py) + performance-posture
assertions the round-4 verdict asked for: the gate's compare logic,
the committed baseline snapshot's integrity, AQE skew-join being on in
the tuned session, and q37's salt surviving in the physical join keys.
"""

from __future__ import annotations

import json
from pathlib import Path

from tools.bench_gate import ABS_FLOOR_SEC, THRESHOLD, compare

REPO = Path(__file__).resolve().parents[1]


def _detail(queries, total=None, sf=0.1):
    return {"queries": queries, "value": total, "sf": sf}


def test_gate_passes_identical_run():
    base = _detail({"q1": 1.0, "q2": 4.0}, total=5.0)
    assert compare(_detail({"q1": 1.0, "q2": 4.0}, total=5.0), base) == []


def test_gate_flags_large_regression():
    base = _detail({"q1": 1.0, "q2": 4.0}, total=5.0)
    out = compare(_detail({"q1": 1.0, "q2": 14.0}, total=15.0), base)
    assert any(p.startswith("q2:") for p in out)
    assert any(p.startswith("TOTAL(") for p in out)
    assert not any(p.startswith("q1:") for p in out)


def test_gate_total_compares_shared_queries_only():
    """13 new entries must not read as a 'total regression': the total
    is compared over the intersection of baseline and run queries."""
    base = _detail({"q1": 6.0, "q2": 6.0}, total=12.0)
    grown = _detail({"q1": 6.0, "q2": 6.0, "new1": 30.0, "new2": 30.0}, total=72.0)
    assert compare(grown, base) == []


def test_gate_ignores_subsecond_jitter():
    """A 0.1s -> 0.4s blip is 4x but under the absolute floor — noise,
    not a plan regression."""
    base = _detail({"tiny": 0.1}, total=0.1)
    assert ABS_FLOOR_SEC > 0.3
    assert compare(_detail({"tiny": 0.4}, total=0.4), base) == []


def test_gate_flags_missing_query():
    base = _detail({"q1": 1.0, "q2": 4.0})
    out = compare(_detail({"q1": 1.0}), base)
    assert out == ["q2: present in baseline but missing from run"]


def test_gate_allows_new_queries():
    base = _detail({"q1": 1.0})
    assert compare(_detail({"q1": 1.0, "brand_new": 60.0}), base) == []


def test_gate_rejects_sf_mismatch():
    base = _detail({"q1": 1.0}, sf=0.1)
    out = compare(_detail({"q1": 1.0}, sf=0.01), base)
    assert len(out) == 1 and "sf mismatch" in out[0]


def test_committed_baseline_snapshot_is_usable():
    """The checked-in snapshot must stay a valid gate reference: parses,
    carries the full query set at the bench sf, sane medians."""
    base = json.loads((REPO / "tools" / "bench_baseline.json").read_text())
    assert base["sf"] == 0.1
    assert len(base["queries"]) >= 90
    assert all(0 < v < 60 for v in base["queries"].values())
    assert THRESHOLD >= 1.2  # gate is a regression catch, not a noise trap


def test_gate_green_on_committed_artifacts():
    """Round-8 gap: the CLI gate failed on the repo's actual artifacts
    while 1218 unit tests stayed green, because nothing in CI ever ran
    compare() on the committed bench_detail.json vs the committed
    baseline. This test IS that run. Skips (with reason) only when the
    artifacts are absent or not comparable (different sf); a genuine
    per-query regression in the committed detail file is now a red test.
    """
    import pytest

    detail_path = REPO / "bench_detail.json"
    base_path = REPO / "tools" / "bench_baseline.json"
    if not detail_path.exists() or not base_path.exists():
        pytest.skip("bench artifacts absent (fresh clone before first bench run)")
    run = json.loads(detail_path.read_text())
    base = json.loads(base_path.read_text())
    if run.get("sf") != base.get("sf"):
        pytest.skip(
            f"bench_detail sf={run.get('sf')} vs baseline sf={base.get('sf')}"
            " — artifacts from different scales, not comparable"
        )
    # cold-degraded entries are budget artifacts, not plan regressions:
    # the detail file tags them, so the gate view excludes them here the
    # same way a human reading the file would
    cold = set(run.get("cold_only_queries", []))
    if cold:
        run = dict(run, queries={
            k: v for k, v in run.get("queries", {}).items() if k not in cold
        })
        base = dict(base, queries={
            k: v for k, v in base.get("queries", {}).items() if k not in cold
        })
    problems = compare(run, base)
    assert problems == [], (
        "committed bench_detail.json regresses vs tools/bench_baseline.json — "
        "re-measure (warm x3), fix the plan or re-snapshot honestly:\n"
        + "\n".join(problems)
    )


def test_aqe_and_skew_join_enabled(spark):
    """The tuned session must keep runtime skew handling on — the
    100 TB answer to hot keys the salt doesn't cover."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_salted_join_salt_survives_in_plan(spark):
    """q37's manual salting must reach the physical join: both join key
    lists carry the salt column next to the hot key, so the hot key's
    rows actually spread over SALT sub-partitions."""
    import re

    from hive_clone_spark import registry

    registry.load_all_modules()
    df = registry.QUERIES["q37_salted_join"](spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    key_lines = [
        ln for ln in plan.splitlines() if re.search(r"(Left|Right) keys \[", ln)
    ]
    assert len(key_lines) >= 2, plan
    for ln in key_lines:
        assert "salt" in ln and "hot_key" in ln, ln


def test_gate_self_normalizes_by_median_shared_ratio():
    """Round-9 driver epoch: every query ~12% slow while the scan probe
    read FASTER than baseline — probe-based scaling is blind to
    parallel/shuffle-regime slowdowns. With enough shared queries the
    gate normalizes by the run's own median per-query ratio: a uniform
    epoch shift loosens the threshold, a single genuinely regressed
    plan cannot move the median and is still flagged."""
    from tools.bench_gate import CAL_SCALE_CAP, MIN_SELF_NORM_QUERIES

    n = MIN_SELF_NORM_QUERIES + 10
    base = _detail({f"q{i}": 2.0 for i in range(n)})
    # uniform 1.2x epoch, probe reading fast (would NOT loosen): the
    # 1.55x query is epoch noise and must pass under the 1.5*1.2 gate
    epoch = {f"q{i}": 2.4 for i in range(n)}
    epoch["q0"] = 3.1  # 1.55x raw, ~1.29x regime-corrected
    assert compare(
        dict(_detail(epoch), calibration_sec=0.30),
        dict(base, calibration_sec=0.40),
    ) == []
    # same epoch, one genuinely broken plan at 2.0x: median unmoved by
    # one offender -> still flagged
    broken = {f"q{i}": 2.4 for i in range(n)}
    broken["q0"] = 4.0
    out = compare(dict(_detail(broken)), base)
    assert [p.split(":")[0] for p in out if not p.startswith("TOTAL")] == ["q0"]
    # cap: a uniform 2x "epoch" is NOT forgiven wholesale — the scale
    # clamps at CAL_SCALE_CAP, so every query trips the capped gate
    slow_all = _detail({f"q{i}": 4.3 for i in range(n)})
    assert 4.3 / 2.0 > 1.5 * CAL_SCALE_CAP
    assert len(compare(slow_all, base)) >= n
    # fast epoch never tightens: 1.4x on a run whose median is 0.8x
    fast = {f"q{i}": 1.6 for i in range(n)}
    fast["q0"] = 2.8  # 1.4x vs baseline, under the un-tightened 1.5
    assert compare(_detail(fast), base) == []


def test_end_of_suite_retry_lane_defeats_contention_window():
    """Round-10 adjudication: all three gate flags were one localized
    contention window — schedule-adjacent queries whose warmup, sample
    AND immediate retry all landed slow, while warm re-measures read
    0.83-1.09x. bench.py's end-of-suite lane re-runs every would-be
    flagged query once (via the gate's own flagged_queries criteria)
    and keeps the MIN of all samples. This test drives that exact
    logic: a contention trio whose end-run sample is fast must clear
    the gate; a genuinely regressed plan stays flagged because its
    end-run sample is slow too."""
    from tools.bench_gate import flagged_queries, norm_scale

    n = 40
    base_q = {f"q{i}": 2.0 for i in range(n)}
    medians = {f"q{i}": 2.0 for i in range(n)}
    # contention window hits three adjacent queries; one real regression
    for name in ("q5", "q6", "q7", "q30"):
        medians[name] = 4.0
    scale = norm_scale(medians, base_q)
    flagged = flagged_queries(medians, base_q, scale)
    assert flagged == ["q30", "q5", "q6", "q7"]  # lane input (sorted)
    # end-of-suite re-measure: contention trio runs fast again, the
    # regressed plan is slow in both windows; lane keeps the MIN
    end_run = {"q5": 2.1, "q6": 1.9, "q7": 2.2, "q30": 3.9}
    for name in flagged:
        medians[name] = min(medians[name], end_run[name])
    out = compare(_detail(medians), _detail(base_q))
    assert [p.split(":")[0] for p in out if not p.startswith("TOTAL")] == ["q30"]


def test_end_of_suite_lane_iterates_to_fixed_point():
    """Round-11 advice: re-measures lower the regime median, which
    tightens the gate threshold at gate time — a query under threshold
    when the lane selected its first set can be NEWLY flagged after
    the re-measures and must get its own end-of-suite sample. A
    contention epoch inflates half the suite; clearing it drops the
    normalization scale from 1.4 to 1.0, newly exposing a genuine
    1.6x regression that the inflated threshold had hidden."""
    from tools.bench_gate import end_of_suite_lane

    base = {f"q{i}": 1.0 for i in range(23)}
    base["sneak"] = 2.0
    medians = {f"q{i}": 2.6 if i < 12 else 1.0 for i in range(23)}
    medians["sneak"] = 3.2  # 1.6x: under the contended 2.1x threshold
    runs = {n: [v] for n, v in medians.items()}
    rerun_calls: list[str] = []

    def rerun(name):
        rerun_calls.append(name)
        return 1.0 if name.startswith("q") else 3.2  # sneak is genuine

    retried, dropped = end_of_suite_lane(
        medians, runs, base, rerun, lambda: True
    )
    assert "sneak" in retried  # picked up only by the fixed-point pass
    assert "sneak" == rerun_calls[-1]  # ...in a later pass than the epoch
    assert dropped == []
    assert medians["sneak"] == 3.2  # slow in both windows: stays flagged
    assert medians["q0"] == 1.0  # contention cleared by the re-measure


def test_end_of_suite_lane_records_dropped_names():
    """Names the retry cap (or budget) forces the lane to skip are
    returned for the detail JSON — never silently truncated (the old
    [:16] slice dropped them invisibly)."""
    from tools.bench_gate import end_of_suite_lane

    n = 40
    base = {f"q{i}": 1.0 for i in range(n)}
    medians = dict(base)
    for i in range(5):
        medians[f"q{i}"] = 3.0  # five genuine 3x regressions
    runs = {k: [v] for k, v in medians.items()}
    retried, dropped = end_of_suite_lane(
        medians, runs, base, lambda name: 3.0, lambda: True, max_retries=2
    )
    assert len(retried) == 2
    assert sorted(retried + dropped) == [f"q{i}" for i in range(5)]


def test_end_of_suite_lane_contract_property():
    """Property (Hypothesis): for ANY run/baseline medians, the lane
    terminates and leaves no query that the gate would flag at the
    final normalization scale without an end-of-suite sample — unless
    the lane itself recorded it as dropped (cap/budget) or it was
    excluded (cold-only). This IS the 'slow in both windows' contract."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tools.bench_gate import end_of_suite_lane, flagged_queries, norm_scale

    med = st.floats(min_value=0.05, max_value=30.0)

    @settings(max_examples=200, deadline=None)
    @given(
        pairs=st.lists(st.tuples(med, med), min_size=1, max_size=60),
        rerun_ratio=st.floats(min_value=0.3, max_value=1.5),
        max_retries=st.integers(min_value=0, max_value=8),
    )
    def run(pairs, rerun_ratio, max_retries):
        base = {f"q{i}": b for i, (b, _) in enumerate(pairs)}
        medians = {f"q{i}": r for i, (_, r) in enumerate(pairs)}
        runs = {k: [v] for k, v in medians.items()}
        retried, dropped = end_of_suite_lane(
            medians,
            runs,
            base,
            lambda name: base[name] * rerun_ratio,
            lambda: True,
            max_retries=max_retries,
        )
        scale = norm_scale(medians, base)
        unserved = [
            n
            for n in flagged_queries(medians, base, scale)
            if n not in retried and n not in dropped
        ]
        assert unserved == [], (unserved, retried, dropped)
        assert len(retried) <= max_retries
        assert not (set(retried) & set(dropped))

    run()


def test_gate_scales_threshold_by_calibration_ratio():
    """A run on a measurably slower machine (calibration probe) gets a
    proportionally looser per-query threshold — the same-day 0.38 ->
    0.66 epoch swing flagged q152 at 1.51x with zero code change. The
    scaling caps at CAL_SCALE_CAP so a genuinely broken plan can never
    hide behind a slow host, and a faster machine never tightens the
    gate."""
    from tools.bench_gate import CAL_SCALE_CAP

    base = dict(_detail({"q1": 2.0}), calibration_sec=0.40)
    # 1.6x on a 1.3x-slower machine: within scaled threshold -> pass
    slow = dict(_detail({"q1": 3.2}), calibration_sec=0.52)
    assert compare(slow, base) == []
    # same 1.6x on an equal-speed machine -> regression
    same = dict(_detail({"q1": 3.2}), calibration_sec=0.40)
    assert len(compare(same, base)) == 1
    # cap: even a 3x-slower probe cannot excuse a 2.2x query
    crawl = dict(_detail({"q1": 4.4}), calibration_sec=1.20)
    assert CAL_SCALE_CAP < 2.2 / 1.5
    assert len(compare(crawl, base)) == 1
    # faster machine: plain threshold still applies (no tightening)
    fast = dict(_detail({"q1": 2.9}), calibration_sec=0.20)
    assert compare(fast, base) == []
    # artifacts without calibration fields fall back to the plain gate
    legacy = _detail({"q1": 3.2})
    assert len(compare(legacy, _detail({"q1": 2.0}))) == 1
