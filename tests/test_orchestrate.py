"""Orchestration: longest-previous-runtime-first scheduling with a
persisted timings ledger (bin/buildIndexes:175-207 analog)."""

import json
import time

from jobs.orchestrate import load_timings, run_builds, schedule


def test_schedule_longest_first_unseen_first():
    prev = {"small": 1.0, "big": 50.0, "mid": 10.0}
    assert schedule(["small", "big", "mid"], prev) == ["big", "mid", "small"]
    # never-seen jobs run first (missing timing == +inf), name-asc tie
    assert schedule(["small", "new_b", "new_a"], prev) == [
        "new_a", "new_b", "small",
    ]
    assert schedule(["a", "b"], {}) == ["a", "b"]


def test_run_builds_orders_and_persists(tmp_path):
    timings = str(tmp_path / "timings.json")
    with open(timings, "w") as fh:
        json.dump({"fast": 0.5, "slow": 9.0}, fh)
    calls = []

    def mk(name, sleep=0.0):
        def fn(_spark):
            calls.append(name)
            if sleep:
                time.sleep(sleep)
            return {"n_docs": 1}

        return fn

    results = run_builds(
        None,
        {"fast": mk("fast", 0.02), "slow": mk("slow")},
        timings,
    )
    # prior timings say slow is longest -> runs first
    assert calls == ["slow", "fast"]
    assert results["slow"]["order"] == 0 and results["fast"]["order"] == 1
    assert results["fast"]["n_docs"] == 1
    # persisted timings now reflect THIS run (merged over prior)
    saved = load_timings(timings)
    assert set(saved) == {"fast", "slow"}
    assert saved["fast"] == results["fast"]["wall_sec"]
    # next run re-orders from the new ledger: fast slept, so it leads
    assert schedule(["fast", "slow"], saved)[0] == "fast"
