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
