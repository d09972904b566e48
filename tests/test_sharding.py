"""Point-axis sharding: multi-device loss evaluation must equal single-device.

Runs on the virtual 8-device CPU mesh
(XLA --xla_force_host_platform_device_count=8, set by the root conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpinn as ns
from tpinn import sharding
from tpinn.experimental.physics import tens_style as operator
from tpinn.geometry import sample_box


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    return sharding.point_mesh()


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


def _loss_value(model, x_pde):
    def PDE():
        with ns.GradientTape(persistent=True) as tape:
            tape.watch(x_pde)
            u = model(x_pde)
            lap = operator.laplacian_scalar(tape, u, x_pde, 2)
        return -lap - 1.0

    lms = ns.LossMeanSquares("PDE", PDE)
    pb = ns.OptimizationProblem(model.variables, [lms], [])
    loss, grad = pb.value_and_grad()(model.params)
    return float(loss), grad


def test_sharded_loss_matches_unsharded(mesh):
    model = ns.models.MLP(2, 1, width=16, depth=2, seed=0)
    x = sample_box(jax.random.PRNGKey(0), 256, [0, 0], [1, 1])

    loss_ref, grad_ref = _loss_value(model, x)
    x_sharded = sharding.shard_points(x, mesh)
    assert x_sharded.sharding.spec == jax.sharding.PartitionSpec("points")
    loss_sh, grad_sh = _loss_value(model, x_sharded)

    assert abs(loss_ref - loss_sh) < 1e-12 * max(1.0, abs(loss_ref))
    for a, b in zip(
        jax.tree_util.tree_leaves(grad_ref), jax.tree_util.tree_leaves(grad_sh)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_shard_points_pads_indivisible(mesh):
    x = jnp.ones((10, 2))
    xs = sharding.shard_points(x, mesh)
    assert xs.shape[0] % 8 == 0


def test_sharded_training_step_runs(mesh):
    # one Adam step over sharded points + replicated params
    model = ns.models.MLP(2, 1, width=16, depth=2, seed=0)
    x = sharding.shard_points(
        sample_box(jax.random.PRNGKey(0), 512, [0, 0], [1, 1]), mesh
    )
    params = sharding.replicate(model.params, mesh)
    model.params = params

    def PDE():
        with ns.GradientTape(persistent=True) as tape:
            tape.watch(x)
            u = model(x)
            lap = operator.laplacian_scalar(tape, u, x, 2)
        return -lap - 1.0

    pb = ns.OptimizationProblem(
        model.variables, [ns.LossMeanSquares("PDE", PDE)], []
    )
    ns.minimize(pb, "keras", ns.optimizers.Adam(1e-2), num_epochs=20)
    assert pb.history.loss_global[-1] < pb.history.loss_global[0]
