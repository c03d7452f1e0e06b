"""bench.py regression diff: an intentional slowdown must trip the
`regressions` field (round-9 verdict #3) — pure-Python, no Spark."""

from __future__ import annotations

from bench import diff_regressions


def test_intentional_slowdown_trips():
    prev = {"tpch_q01": 1.50, "q02": 0.40, "shared_dedup_chain_build": 4.0}
    cur = {"tpch_q01": 2.35, "q02": 0.41, "shared_dedup_chain_build": 4.1}
    regs = diff_regressions(prev, cur)
    assert [r["query"] for r in regs] == ["tpch_q01"]
    assert regs[0]["ratio"] == 1.57
    assert regs[0]["prev_sec"] == 1.50 and regs[0]["cur_sec"] == 2.35


def test_jitter_floor_and_new_queries_ignored():
    prev = {"tiny": 0.05, "gone": 1.0, "failed": -1.0}
    cur = {"tiny": 0.12, "brand_new": 5.0, "failed": 2.0}
    # tiny: 2.4x but under the 0.3 s floor; brand_new: no previous row;
    # failed: previous run errored (-1) so there is no honest baseline
    assert diff_regressions(prev, cur) == []


def test_sorted_worst_first():
    prev = {"a": 1.0, "b": 1.0}
    cur = {"a": 2.0, "b": 4.0}
    assert [r["query"] for r in diff_regressions(prev, cur)] == ["b", "a"]
