"""Root conftest: give the test suite a fast, hermetic CPU-JAX environment.

The container registers a remote-TPU PJRT plugin ("axon") via a sitecustomize
hook, which makes every XLA compile — even CPU-targeted ones — take tens of
seconds (remote compile round-trips).  Tests exercise numerics and sharding
semantics, not the TPU tunnel, so before any backend initializes we:

* drop the axon backend factory and force JAX_PLATFORMS=cpu,
* enable x64 (float64 parity with the reference),
* force an 8-device virtual CPU platform
  (--xla_force_host_platform_device_count=8) so multi-chip sharding tests run
  without a cluster — the standard JAX way to test multi-device code
  (SURVEY.md §4).

This must run before jax initializes a backend; pytest imports the rootdir
conftest before collecting test modules, which is early enough (the
sitecustomize hook registers the plugin but does not initialize it).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from jax._src import xla_bridge as _xb  # noqa: E402

if _xb._default_backend is None:
    _xb._backend_factories.pop("axon", None)
else:  # pragma: no cover - backend initialized before conftest
    raise RuntimeError(
        "JAX backend initialized before conftest; run tests with "
        "PYTHONPATH= JAX_PLATFORMS=cpu to avoid the remote-compile plugin"
    )


# ---------------------------------------------------------------------------
# Quick-tier budget audit (VERDICT r1 item 5): any non-slow test that runs
# longer than TPINN_QUICK_BUDGET_S (default 120 s — roughly 30 s uncontended,
# this container usually has a campaign lane sharing its single CPU core)
# is reported at the end of the run with instructions to mark it slow.
# Set TPINN_ENFORCE_QUICK_BUDGET=1 to turn the report into a failure.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

_OVER_BUDGET = []


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_makereport(item, call):
    out = yield
    rep = out.get_result()
    if rep.when == "call":
        budget = float(os.environ.get("TPINN_QUICK_BUDGET_S", "120"))
        slow = any(m.name == "slow" for m in item.iter_markers())
        if not slow and rep.duration > budget:
            _OVER_BUDGET.append((item.nodeid, rep.duration))


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    if _OVER_BUDGET:
        terminalreporter.section("quick-tier budget audit")
        for nid, dur in sorted(_OVER_BUDGET, key=lambda t: -t[1]):
            terminalreporter.write_line(
                f"OVER BUDGET ({dur:.1f}s > "
                f"{os.environ.get('TPINN_QUICK_BUDGET_S', '120')}s): {nid}"
                " — mark it @pytest.mark.slow or shrink it"
            )


def pytest_sessionfinish(session, exitstatus):
    if _OVER_BUDGET and os.environ.get("TPINN_ENFORCE_QUICK_BUDGET") == "1":
        session.exitstatus = 1
