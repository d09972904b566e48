"""Pallas fused-bundle kernel vs the jet-based XLA path (interpret mode on
CPU; the compiled path is exercised on TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpinn.models import MLP
from tpinn.operators import vtaylor_bundle
from tpinn.pallas.mlp_bundle import mlp_taylor_bundle


@pytest.mark.parametrize("n,np_tile", [(600, 256), (256, 256)])
def test_pallas_bundle_matches_jet(n, np_tile):
    model = MLP(2, 3, width=32, depth=3, seed=0, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (n, 2), dtype=jnp.float32)
    f = lambda xi: model.apply_single(model.params, xi)
    v1, j1, h1 = vtaylor_bundle(f, x, 2)
    v2, j2, h2 = mlp_taylor_bundle(model.params, x, interpret=True,
                                   np_tile=np_tile)
    assert v2.shape == (n, 3)
    assert j2.shape == (n, 3, 2)
    assert h2.shape == (n, 3, 2)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-4)


def test_pallas_bundle_3d_input():
    """Unsteady case: 3-D (t, x, y) input, derivative columns in order."""
    model = MLP(3, 3, width=16, depth=2, seed=1, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), dtype=jnp.float32)
    f = lambda xi: model.apply_single(model.params, xi)
    v1, j1, h1 = vtaylor_bundle(f, x, 3)
    v2, j2, h2 = mlp_taylor_bundle(model.params, x, interpret=True,
                                   np_tile=256)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-4)
