import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache (VERDICT r1 item 5): the quick tier is
# compile-bound (dense-BFGS while_loops, Adam chunked scans, Taylor-jet
# residual bundles on a single CPU core), so repeat runs reload executables
# instead of recompiling.  Only compiles >2 s are cached — the small ones
# recompile faster than the AOT load logs.  The dir is machine-local and
# gitignored; a cold run is unchanged.
_cache_dir = os.path.abspath(
    os.path.join(os.path.dirname(__file__), os.pardir, ".cache", "jax")
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# Quick-tier duration audit (VERDICT r1 item 5): every non-slow test's call
# phase is recorded here; tests/test_zz_tier_audit.py (runs last by name)
# fails if any quick-tier test blows the per-test budget — the mechanism by
# which compile-bound gates are forced to carry the `slow` marker instead of
# silently re-inflating the tier.
QUICK_TIER_DURATIONS = []


def pytest_runtest_logreport(report):
    if report.when == "call" and report.passed:
        is_slow = any(name == "slow" for name in report.keywords)
        if not is_slow:
            QUICK_TIER_DURATIONS.append((report.nodeid, report.duration))


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
