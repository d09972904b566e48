"""LM per-point Gram fast path vs the chunked forward-mode Jacobian.

Every PINN residual component depends on exactly one collocation point, so
JᵀJ/JᵀR can be accumulated from per-point reverse-mode gradients (one tiny
backward per point) instead of ~P/chunk full-batch jvp sweeps — the change
that takes the f64-on-TPU LM iteration from ~26 s to seconds
(RESULTS_TPU.md).  These tests pin that the fast Gram is numerically THE
SAME normal-equations system, on a real driver-built problem with PDE,
Dirichlet, Neumann and fit losses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpinn as ns
from tpinn.config import SimulationOptions
from tpinn.driver import CaseSpec, StandardNSDriver
from tpinn.optimize import _collect_point_entries, _flat_residual_fn
from tpinn.oracles import analytic
from tpinn.pipeline import NSPhysics
from tpinn.problem import OptimizationProblem


@pytest.fixture(scope="module")
def lm_driver():
    prm = analytic.PoiseuilleParams()
    spec = CaseSpec(
        name="Poiseuille_Gram",
        extents=[(0.0, 1.0), (0.0, 0.1)],
        grid_shape=(12, 8),
        physics=NSPhysics(conv=prm.rho, visc=prm.mu),
        exact=(
            lambda x: analytic.poiseuille_u(x, prm),
            lambda x: analytic.poiseuille_v(x, prm),
            lambda x: analytic.poiseuille_p(x, prm),
        ),
        bnd_val={
            0: {"BOT": 0.0, "TOP": 0.0,
                "SX": lambda x: analytic.poiseuille_u(x, prm),
                "DX": prm.p_out},
            1: {"BOT": 0.0, "TOP": 0.0, "SX": 0.0, "DX": 0.0},
        },
        neumann={("DX", 0): 0, ("DX", 1): 0},
    )
    opts = SimulationOptions(epochs=2, n_pde=30, n_bc=8, n_vel=4, n_pres=0,
                             n_test=20)
    return StandardNSDriver(spec, opts, base_dir=".", save_results=False,
                            seed=0, second_round="lm")


def test_driver_losses_expose_point_residuals(lm_driver):
    missing = [l.name for l in lm_driver.losses
               if getattr(l, "point_residual", None) is None]
    assert not missing, f"losses without point_residual: {missing}"


def test_fast_gram_matches_dense_jacobian(lm_driver):
    pb = OptimizationProblem(
        lm_driver.model.variables, lm_driver.losses, [], callbacks=[]
    )
    theta0, unravel, residuals = _flat_residual_fn(pb)
    res_jit = jax.jit(residuals)
    entries = _collect_point_entries(pb, unravel, res_jit, theta0)
    assert entries is not None

    # reference: dense J of the stacked residual closure
    J = np.asarray(jax.jacfwd(residuals)(theta0))
    r = np.asarray(res_jit(theta0))
    JTJ_ref = J.T @ J
    JTr_ref = J.T @ r

    # fast path: per-point Gram accumulation (same formula as optimize.py)
    n_par = theta0.shape[0]
    JTJ = np.zeros((n_par, n_par))
    JTr = np.zeros(n_par)
    for fn, args, scale in entries:
        def res_one(th, *rows, _fn=fn, _s=scale):
            return _fn(unravel(th), *rows) * _s

        in_axes = (None,) + (0,) * len(args)
        G = np.asarray(jax.vmap(jax.grad(res_one), in_axes=in_axes)(
            theta0, *args))
        rl = np.asarray(jax.vmap(res_one, in_axes=in_axes)(theta0, *args))
        JTJ += G.T @ G
        JTr += G.T @ rl

    scale_J = np.abs(JTJ_ref).max()
    np.testing.assert_allclose(JTJ, JTJ_ref, rtol=1e-9,
                               atol=1e-12 * scale_J)
    np.testing.assert_allclose(JTr, JTr_ref, rtol=1e-9,
                               atol=1e-12 * np.abs(JTr_ref).max())


def test_lm_round_descends_with_fast_gram(lm_driver):
    pb = OptimizationProblem(
        lm_driver.model.variables, lm_driver.losses, [], callbacks=[]
    )
    ns.minimize(pb, "jax", "LM", num_epochs=4)
    assert pb.history.round_names == ["jax_LM"]
    assert pb.history.loss_global[-1] < pb.history.loss_global[0]


def test_split_carry_lm_uses_fast_gram(lm_driver):
    """float32 LM (split-parameter carry) must ride the per-point Gram, not
    silently fall back to the 5.4×-slower chunked Jacobian (round-4 verdict
    item 5), and its normal equations must equal the dense linearized
    reference  JᵀJ = J(hi)ᵀJ(hi),  Jᵀr = J(hi)ᵀr(hi) + (JᵀJ)·lo  — the same
    first-order model the split accept test certifies steps with."""
    from tpinn import config
    from tpinn.optimize import _flat_residual_fn

    config.set_dtype(jnp.float32)
    try:
        spec = lm_driver.spec
        opts = lm_driver.opts
        drv32 = StandardNSDriver(spec, opts, base_dir=".", save_results=False,
                                 seed=0, second_round="lm")
        pb = OptimizationProblem(
            drv32.model.variables, drv32.losses, [], callbacks=[]
        )
        theta0, unravel, residuals = _flat_residual_fn(pb)
        assert theta0.dtype == jnp.float32  # split carry engages on f32

        ns.minimize(pb, "jax", "LM", num_epochs=2)
        assert pb.lm_used_fast_gram is True
        assert pb.history.loss_global[-1] <= pb.history.loss_global[0]

        # normal equations at a theta64 with a genuine sub-f32 lo part
        rng = np.random.default_rng(3)
        theta64 = np.asarray(theta0, np.float64) + 1e-9 * rng.standard_normal(
            theta0.shape[0]
        )
        _, JTJ, JTr = pb.lm_normal_eqs(theta64)

        hi32 = theta64.astype(np.float32)
        lo64 = theta64 - hi32.astype(np.float64)
        hi = jnp.asarray(hi32)
        J = np.asarray(jax.jacfwd(residuals)(hi), np.float64)
        r = np.asarray(residuals(hi), np.float64)
        JTJ_ref = J.T @ J
        JTr_ref = J.T @ r + JTJ_ref @ lo64
        np.testing.assert_allclose(JTJ, JTJ_ref, rtol=2e-4,
                                   atol=1e-6 * np.abs(JTJ_ref).max())
        np.testing.assert_allclose(JTr, JTr_ref, rtol=2e-4,
                                   atol=1e-6 * np.abs(JTr_ref).max())
        # the lo correction must actually be present (it is what resolves
        # sub-ulp steps).  Two theta64 points sharing the SAME f32 hi give
        # bitwise-identical G and r(hi), so the JTr difference is purely the
        # host-f64 JTJ·lo term — checkable EXACTLY, with no f32 noise floor
        theta_a = hi32.astype(np.float64)           # lo = 0
        delta = 1e-8 * theta_a                       # sub-half-ulp, rel.
        theta_b = theta_a + delta
        assert np.array_equal(theta_b.astype(np.float32), hi32)
        _, JTJ_a, JTr_a = pb.lm_normal_eqs(theta_a)
        _, JTJ_b, JTr_b = pb.lm_normal_eqs(theta_b)
        np.testing.assert_array_equal(JTJ_a, JTJ_b)
        # the realized lo is theta_b − f64(hi) (f64 subtraction), not the
        # nominal delta — theta_a + delta rounds in f64
        corr = JTJ_a.astype(np.float64) @ (theta_b - theta_a)
        # resolution limit: JTr = f64(JTr_hi) + corr rounds corr at
        # eps64·|JTr_hi| when the two are added — the honest atol
        np.testing.assert_allclose(
            JTr_b - JTr_a, corr, rtol=1e-9,
            atol=4 * np.finfo(np.float64).eps * np.abs(JTr_a).max())
        assert np.abs(corr).max() > 0
    finally:
        config.set_dtype(None)


def test_device_ladder_matches_host_loop(lm_driver, monkeypatch):
    """The on-device damping ladder (round-5 VERDICT item 7) must run the
    SAME accept semantics as the host eigh loop: from one θ₀, both solvers
    produce near-identical descent trajectories (they differ only in the
    damped-solve factorization — per-rung f64 Cholesky on device vs one
    host eigh — whose solutions agree to solver roundoff)."""
    params0 = lm_driver.model.variables.get()

    def run(solver):
        lm_driver.model.variables.set(params0)
        pb = OptimizationProblem(
            lm_driver.model.variables, lm_driver.losses, [], callbacks=[]
        )
        monkeypatch.setenv("TPINN_LM_SOLVER", solver)
        ns.minimize(pb, "jax", "LM", num_epochs=4)
        return pb

    pb_dev = run("device")
    assert pb_dev.lm_solver == "device_ladder"
    assert pb_dev.history.loss_global[-1] < pb_dev.history.loss_global[0]

    pb_host = run("host")
    assert pb_host.lm_solver == "host_eigh"
    np.testing.assert_allclose(
        pb_dev.history.loss_global, pb_host.history.loss_global, rtol=1e-3
    )
    lm_driver.model.variables.set(params0)


def test_split_carry_keeps_host_loop(lm_driver, monkeypatch):
    """float32 LM needs the host-f64 split carry (sub-ulp θ navigation);
    the device ladder must never engage there, even when forced."""
    from tpinn import config

    config.set_dtype(jnp.float32)
    try:
        drv32 = StandardNSDriver(lm_driver.spec, lm_driver.opts,
                                 base_dir=".", save_results=False,
                                 seed=0, second_round="lm")
        pb = OptimizationProblem(
            drv32.model.variables, drv32.losses, [], callbacks=[]
        )
        monkeypatch.setenv("TPINN_LM_SOLVER", "device")
        ns.minimize(pb, "jax", "LM", num_epochs=2)
        assert pb.lm_solver == "host_eigh"
    finally:
        config.set_dtype(None)


def test_miswired_point_residual_falls_back(lm_driver, capsys):
    """A point_residual that disagrees with the batch closure must be
    rejected by the theta0 validation, not silently optimized."""
    losses = list(lm_driver.losses)
    bad = losses[0]
    fn, args = bad.point_residual
    bad_args = (args[0] + 0.01,) + args[1:]  # wrong collocation points
    bad.point_residual = (fn, bad_args)
    try:
        pb = OptimizationProblem(
            lm_driver.model.variables, losses, [], callbacks=[]
        )
        theta0, unravel, residuals = _flat_residual_fn(pb)
        entries = _collect_point_entries(pb, unravel, jax.jit(residuals),
                                         theta0)
        assert entries is None
        assert "falling back" in capsys.readouterr().out
    finally:
        bad.point_residual = (fn, args)
