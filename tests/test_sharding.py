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


@pytest.mark.slow
def test_sharded_fused_residual_mse_matches_single(mesh):
    """shard_map-wrapped Pallas NS-residual MSEs (interpret mode) equal the
    single-instance kernel, values AND parameter grads, on the 8-dev mesh."""
    from tpinn.geometry import Normalization
    from tpinn.models import MLP
    from tpinn.pallas.mlp_bundle import ns_residual_mse
    from tpinn.pipeline import NSPhysics
    from tpinn.sharding import sharded_ns_residual_mse

    model = MLP(2, 3, width=32, depth=3, seed=0, dtype=jnp.float64)
    params = model.params
    norm = Normalization(
        np.array([0.0, 500.0]), np.array([0.0, 250.0]), np.array([-1e4, 1e4])
    )
    phys = NSPhysics(conv=1.0, visc=1.0)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1024, 2)), dtype=jnp.float64
    )
    w = jnp.asarray([10.0, 1.0, 1.0])

    def single(p):
        return jnp.sum(
            w * ns_residual_mse(p, x, phys, norm, np_tile=128, interpret=True)
        )

    x_sh = sharding.shard_points(x, mesh)

    def sharded(p):
        return jnp.sum(
            w * sharded_ns_residual_mse(p, x_sh, phys, norm, mesh,
                                        np_tile=128, interpret=True)
        )

    np.testing.assert_allclose(float(single(params)), float(sharded(params)),
                               rtol=1e-12)
    g1, _ = jax.flatten_util.ravel_pytree(jax.grad(single)(params))
    g2, _ = jax.flatten_util.ravel_pytree(jax.grad(sharded)(params))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-12,
                               rtol=1e-9)


@pytest.mark.slow
def test_sharded_one_pass_weighted_obj_matches_single(mesh):
    """shard_map-wrapped ONE-PASS objective (loss + log MSEs + grads from
    one kernel per shard) equals the single-instance one-pass call, values
    AND parameter grads, on the 8-dev mesh."""
    from tpinn.geometry import Normalization
    from tpinn.models import MLP
    from tpinn.pallas.mlp_bundle import ns_residual_weighted_obj
    from tpinn.pipeline import NSPhysics
    from tpinn.sharding import sharded_ns_weighted_obj

    model = MLP(2, 3, width=32, depth=3, seed=4, dtype=jnp.float64)
    params = model.params
    norm = Normalization(
        np.array([0.0, 500.0]), np.array([0.0, 250.0]), np.array([-1e4, 1e4])
    )
    phys = NSPhysics(conv=1.0, visc=1.0)
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1024, 2)), dtype=jnp.float64
    )
    w = (10.0, 1.0, 1.0)

    def single(p):
        L, _ = ns_residual_weighted_obj(p, x, phys, norm, w, np_tile=128,
                                        interpret=True)
        return L

    x_sh = sharding.shard_points(x, mesh)

    def shd(p):
        L, _ = sharded_ns_weighted_obj(p, x_sh, phys, norm, w, mesh,
                                       np_tile=128, interpret=True)
        return L

    np.testing.assert_allclose(float(single(params)), float(shd(params)),
                               rtol=1e-12)
    g1, _ = jax.flatten_util.ravel_pytree(jax.grad(single)(params))
    g2, _ = jax.flatten_util.ravel_pytree(jax.grad(shd)(params))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-12,
                               rtol=1e-9)
    # the log channels agree too
    _, m1 = ns_residual_weighted_obj(params, x, phys, norm, w, np_tile=128,
                                     interpret=True)
    _, m2 = sharded_ns_weighted_obj(params, x_sh, phys, norm, w, mesh,
                                    np_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-12)
