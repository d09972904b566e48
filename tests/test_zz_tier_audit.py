"""Quick-tier duration audit (VERDICT r1 item 5).

The reference has no tests at all (SURVEY.md §4); this repo's substitute
quality gate is a tiered pytest suite whose quick tier must stay fast enough
to run on every commit.  This file runs last (zz name ordering) and fails if
any non-`slow` test's call phase exceeded the per-test budget, forcing new
compile-bound gates to either shrink or carry the `slow` marker.

Budget: 60 s per test, overridable via TPINN_QUICK_TEST_BUDGET_S (the CI
box has a single CPU core and campaign lanes may share it, so the budget is
several x the worst standalone quick test, ~40 s).
"""

import os

from conftest import QUICK_TIER_DURATIONS


def test_quick_tier_per_test_budget():
    budget = float(os.environ.get("TPINN_QUICK_TEST_BUDGET_S", "60"))
    offenders = [
        (nodeid, round(dur, 1))
        for nodeid, dur in QUICK_TIER_DURATIONS
        if dur > budget
    ]
    assert not offenders, (
        f"quick-tier tests over the {budget:.0f}s budget (mark them `slow` "
        f"and add a quick counterpart, or shrink them): {offenders}"
    )
