"""Quick-tier duration audit (VERDICT r1 item 5).

The reference has no tests at all (SURVEY.md §4); this repo's substitute
quality gate is a tiered pytest suite whose quick tier must stay fast enough
to run on every commit.  This file runs last (zz name ordering) and fails if
any non-`slow` test's call phase exceeded the per-test budget, forcing new
compile-bound gates to either shrink or carry the `slow` marker.

Budget: 120 s per test, overridable via TPINN_QUICK_TEST_BUDGET_S — aligned
with the conftest report budget (TPINN_QUICK_BUDGET_S).  The CI box has a
single CPU core and TPU campaign lanes routinely share it (their host-side
LM algebra runs concurrently), which halves the suite's effective CPU: the
worst standalone quick test is ~40 s, so 120 s keeps the audit meaningful
while not flaking under the designed concurrent workload (observed round 4:
a 60 s budget tripped purely from lane contention).
"""

import os

from conftest import QUICK_TIER_DURATIONS


def test_quick_tier_per_test_budget():
    budget = float(os.environ.get("TPINN_QUICK_TEST_BUDGET_S", "120"))
    offenders = [
        (nodeid, round(dur, 1))
        for nodeid, dur in QUICK_TIER_DURATIONS
        if dur > budget
    ]
    assert not offenders, (
        f"quick-tier tests over the {budget:.0f}s budget (mark them `slow` "
        f"and add a quick counterpart, or shrink them): {offenders}"
    )
