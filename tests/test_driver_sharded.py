"""StandardNSDriver with a device mesh: sharded losses == unsharded losses."""

import jax
import pytest

from tpinn import sharding
from tpinn.config import SimulationOptions
from tpinn.driver import CaseSpec, StandardNSDriver
from tpinn.oracles import analytic
from tpinn.pipeline import NSPhysics


def _spec():
    prm = analytic.PoiseuilleParams()
    return CaseSpec(
        name="Poiseuille_Sharded",
        extents=[(0.0, 1.0), (0.0, 0.1)],
        grid_shape=(20, 10),
        physics=NSPhysics(conv=prm.rho, visc=prm.mu),
        exact=(
            lambda x: analytic.poiseuille_u(x, prm),
            lambda x: analytic.poiseuille_v(x, prm),
            lambda x: analytic.poiseuille_p(x, prm),
        ),
        bnd_val={
            0: {"BOT": 0.0, "TOP": 0.0,
                "SX": lambda x: analytic.poiseuille_u(x, prm)},
            1: {"BOT": 0.0, "TOP": 0.0, "SX": 0.0},
        },
        weights={"PDE_MASS": 1e1},
    )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_driver_matches_unsharded():
    opts = SimulationOptions(
        epochs=0, n_pde=64, n_bc=16, n_vel=8, n_pres=0, n_test=32
    )
    mesh = sharding.point_mesh()

    plain = StandardNSDriver(_spec(), opts, save_results=False, seed=0,
                             second_round="none")
    shard = StandardNSDriver(_spec(), opts, save_results=False, seed=0,
                             second_round="none", mesh=mesh)

    import tpinn

    pb_a = tpinn.OptimizationProblem(plain.model.variables, plain.losses,
                                     plain.losses_test)
    pb_b = tpinn.OptimizationProblem(shard.model.variables, shard.losses,
                                     shard.losses_test)
    la, _, _ = jax.device_get(pb_a.eval_jit()(plain.model.params))
    lb, _, _ = jax.device_get(pb_b.eval_jit()(shard.model.params))
    assert abs(float(la) - float(lb)) < 1e-10 * max(1.0, abs(float(la)))


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_full_training_round_sharded_matches_unsharded():
    """VERDICT r1 item 3: training-deep multi-chip correctness.

    Runs a complete minimize('keras') Adam round AND a minimize('jax','BFGS')
    round through StandardNSDriver on the virtual 8-device mesh, with point
    counts chosen to NOT divide the mesh (exercising shard_pair's exact
    mask-scale padding), and asserts the logged history matches the
    single-device run within f64 tolerance."""
    import numpy as np

    # n_bc=10 per edge, n_vel=5, n_test=30: none divisible by 8
    opts = SimulationOptions(
        epochs=20, n_pde=64, n_bc=10, n_vel=5, n_pres=0, n_test=30
    )
    mesh = sharding.point_mesh()

    histories = []
    for m in (None, mesh):
        drv = StandardNSDriver(_spec(), opts, save_results=False, seed=0,
                               second_round="jax", scipy_method="BFGS",
                               adam_epochs=20, mesh=m)
        drv.train(callbacks=False)
        histories.append(drv.pb.history)

    plain, shard = histories
    assert plain.round_names == shard.round_names  # ['keras_Adam', 'jax_BFGS']
    assert plain.iters == shard.iters
    lg_a = np.asarray(plain.loss_global, dtype=float)
    lg_b = np.asarray(shard.loss_global, dtype=float)
    np.testing.assert_allclose(lg_b, lg_a, rtol=1e-5, atol=1e-14)
    # per-loss and test-loss series match too (incl. the padded BC/fit/test
    # batches — the mask-scale keeps their means mathematically identical)
    for name in plain.losses:
        np.testing.assert_allclose(
            np.asarray(shard.losses[name]["log"], dtype=float),
            np.asarray(plain.losses[name]["log"], dtype=float),
            rtol=1e-4, atol=1e-16, err_msg=name)
    for name in plain.losses_test:
        np.testing.assert_allclose(
            np.asarray(shard.losses_test[name]["log"], dtype=float),
            np.asarray(plain.losses_test[name]["log"], dtype=float),
            rtol=1e-4, atol=1e-16, err_msg=name)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_sharded_lm_round_matches_unsharded():
    """VERDICT r3 item 2: a SECOND-ORDER (Levenberg–Marquardt) round under
    the 8-device point mesh, with a non-divisible PDE batch (the jet path's
    exact mask-scale sharding), using the per-point-Gram fast path on BOTH
    sides — history-equal to the single-device run."""
    import numpy as np

    # n_pde=70, n_bc=10/edge, n_vel=5, n_test=30: none divisible by 8
    opts = SimulationOptions(
        epochs=4, n_pde=70, n_bc=10, n_vel=5, n_pres=0, n_test=30
    )
    mesh = sharding.point_mesh()

    histories, fast = [], []
    for m in (None, mesh):
        drv = StandardNSDriver(_spec(), opts, save_results=False, seed=0,
                               second_round="lm", adam_epochs=10, mesh=m)
        drv.train(callbacks=False)
        histories.append(drv.pb.history)
        fast.append(getattr(drv.pb, "lm_used_fast_gram", False))
    # the campaign-winning per-point Gram must be in play on BOTH sides —
    # a silent fallback to the chunked jacobian would still be correct but
    # would not certify the mesh-aware fast path
    assert fast == [True, True], fast

    plain, shard = histories
    assert plain.round_names == shard.round_names == ["keras_Adam", "jax_LM"]
    assert plain.iters == shard.iters
    lg_a = np.asarray(plain.loss_global, dtype=float)
    lg_b = np.asarray(shard.loss_global, dtype=float)
    np.testing.assert_allclose(lg_b, lg_a, rtol=1e-5, atol=1e-14)
    for name in plain.losses_test:
        np.testing.assert_allclose(
            np.asarray(shard.losses_test[name]["log"], dtype=float),
            np.asarray(plain.losses_test[name]["log"], dtype=float),
            rtol=1e-4, atol=1e-16, err_msg=name)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_fused_sharded_pde_exact_mean(monkeypatch):
    """VERDICT r3 item 5: a NON-divisible PDE batch through the fused
    Pallas path under the mesh — the kernels' dynamic valid-count masking
    makes the sharded objective bit-class-equal to the unsharded one
    (previously repeat-padding perturbed the mean)."""
    monkeypatch.setenv("TPINN_USE_PALLAS", "1")
    opts = SimulationOptions(
        epochs=0, n_pde=70, n_bc=16, n_vel=8, n_pres=0, n_test=32
    )
    mesh = sharding.point_mesh()

    plain = StandardNSDriver(_spec(), opts, save_results=False, seed=0,
                             second_round="none")
    shard = StandardNSDriver(_spec(), opts, save_results=False, seed=0,
                             second_round="none", mesh=mesh)

    import tpinn

    pb_a = tpinn.OptimizationProblem(plain.model.variables, plain.losses,
                                     plain.losses_test)
    pb_b = tpinn.OptimizationProblem(shard.model.variables, shard.losses,
                                     shard.losses_test)
    la, _, _ = jax.device_get(pb_a.eval_jit()(plain.model.params))
    lb, _, _ = jax.device_get(pb_b.eval_jit()(shard.model.params))
    assert abs(float(la) - float(lb)) < 1e-10 * max(1.0, abs(float(la)))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_shard_pair_mask_scale_exact():
    """mean((m*r)^2) over the padded batch == mean(r^2) over the original."""
    import jax.numpy as jnp
    import numpy as np

    mesh = sharding.point_mesh()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(13, 2)))
    rhs = jnp.asarray(np.random.default_rng(1).normal(size=(13,)))
    xs, (rs,), scale = sharding.shard_pair(x, [rhs], mesh)
    assert xs.shape[0] % 8 == 0 and scale is not None
    r_plain = x[:, 0] - rhs
    r_shard = (xs[:, 0] - rs) * scale
    np.testing.assert_allclose(float(jnp.mean(r_shard**2)),
                               float(jnp.mean(r_plain**2)), rtol=1e-14)
    # scalar rhs passes through
    xs2, (r0,), s2 = sharding.shard_pair(x, [0.5], mesh)
    assert r0 == 0.5 and s2 is not None
