"""StandardNSDriver + pipeline residual tests.

The momentum/mass residual builders must vanish on exact solutions: the
colliding-flow polynomial satisfies steady NS (with its own forcing — here
checked on Stokes terms), and the Poiseuille profile satisfies dimensional
NS exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpinn.config import SimulationOptions
from tpinn.driver import CaseSpec, StandardNSDriver
from tpinn.geometry import Normalization
from tpinn.models import Model
from tpinn.oracles import analytic
from tpinn.pipeline import (
    NSPhysics,
    ResidualBundle,
    mass_residual,
    momentum_residual,
    neumann_residual,
)


class ExactPoiseuille(Model):
    """Model whose forward returns the normalized exact Poiseuille fields."""

    def __init__(self, norm):
        self.norm = norm
        super().__init__([2, 3])

    def apply_single(self, params, xi):
        x = xi[None, :]
        prm = analytic.PoiseuilleParams()
        return jnp.stack(
            [
                analytic.poiseuille_u(x, prm)[0] / self.norm.norm_vel,
                analytic.poiseuille_v(x, prm)[0] / self.norm.norm_vel,
                analytic.poiseuille_p(x, prm)[0] / self.norm.norm_pre,
            ]
        )

    def apply(self, params, x):
        return jax.vmap(lambda xi: self.apply_single(params, xi))(x)


@pytest.fixture(scope="module")
def poiseuille_exact_setup():
    prm = analytic.PoiseuilleParams()
    pts = jax.random.uniform(
        jax.random.PRNGKey(0), (64, 2), dtype=jnp.float64
    ) * jnp.array([1.0, 0.1])
    u = analytic.poiseuille_u(pts, prm)
    v = analytic.poiseuille_v(pts, prm)
    p = analytic.poiseuille_p(pts, prm)
    norm = Normalization(u, v, p)
    model = ExactPoiseuille(norm)
    return model, pts, norm, prm


def test_momentum_residual_vanishes_on_exact_poiseuille(poiseuille_exact_setup):
    model, pts, norm, prm = poiseuille_exact_setup
    physics = NSPhysics(conv=prm.rho, visc=prm.mu)
    bundle = ResidualBundle(model, pts)
    ru = momentum_residual(bundle, 0, physics, norm)
    rv = momentum_residual(bundle, 1, physics, norm)
    rm = mass_residual(bundle, norm)
    np.testing.assert_allclose(np.asarray(rm), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ru), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(rv), 0.0, atol=1e-7)


def test_neumann_residual_on_exact_poiseuille(poiseuille_exact_setup):
    """At the outlet x=1: μ∂u/∂x − p = 0 − P_end = 0 exactly."""
    model, _, norm, prm = poiseuille_exact_setup
    key = jax.random.PRNGKey(1)
    ys = jax.random.uniform(key, (16,), dtype=jnp.float64) * 0.1
    pts = jnp.stack([jnp.ones_like(ys), ys], axis=-1)
    physics = NSPhysics(conv=prm.rho, visc=prm.mu)
    bundle = ResidualBundle(model, pts)
    r = neumann_residual(bundle, 0, 0, physics, norm, rhs=prm.p_out)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-7)
    # v-component: μ∂v/∂x − 0 = 0
    r2 = neumann_residual(bundle, 1, 0, physics, norm, rhs=0.0)
    np.testing.assert_allclose(np.asarray(r2), 0.0, atol=1e-9)


@pytest.mark.slow
def test_driver_end_to_end_tiny():
    """Full StandardNSDriver pipeline on a coarse Poiseuille config (with
    Neumann losses — their second-derivative jet compile makes this the
    slow-tier variant; the quick tier runs the Dirichlet-only one below)."""
    prm = analytic.PoiseuilleParams()
    spec = CaseSpec(
        name="Poiseuille_Tiny",
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
                "SX": lambda x: analytic.poiseuille_u(x, prm),
                "DX": prm.p_out},
            1: {"BOT": 0.0, "TOP": 0.0, "SX": 0.0, "DX": 0.0},
        },
        neumann={("DX", 0): 0, ("DX", 1): 0},
        weights={"PDE_MASS": 1e1},
    )
    opts = SimulationOptions(
        epochs=60, n_pde=50, n_bc=16, n_vel=5, n_pres=0, n_test=40
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        driver = StandardNSDriver(
            spec, opts, base_dir=td, save_results=True, seed=0,
            # scipy-parity: the host round keeps this full-pipeline test out
            # of the dense-BFGS compile budget; the 'scipy'->jax-BFGS routing
            # itself is unit-tested below with a recorded minimize
            second_round="scipy-parity", adam_epochs=30,
        )
        pb = driver.train(callbacks=False)
        assert pb.history.loss_global[-1] < pb.history.loss_global[0]
        driver.save_artifacts(
            loss_groups={"Test_Loss": ["u_test", "v_test", "p_test"]}
        )
        import os

        folder = driver.folder
        for artifact in (
            "Model.json", "Weights.h5", "History_Loss.json",
            "Graphic.jpg", "Loss_Trend_Reduced.png", "Test_Options.txt",
            "checkpoint.pkl",
        ):
            assert os.path.exists(os.path.join(folder, artifact)), artifact
        # experiment folder auto-numbering
        assert os.path.basename(folder) == "Test_Case_#001"
        losses = driver.final_test_losses()
        assert set(losses) == {"u_test", "v_test", "p_test"}


@pytest.mark.slow
def test_driver_fused_pallas_pde_losses_match_xla(monkeypatch):
    """TPINN_USE_PALLAS=1 routes the PDE losses through the fused kernel
    (interpret mode off-TPU); loss values must match the XLA jet path."""
    prm = analytic.PoiseuilleParams()

    def build(env):
        if env is None:
            monkeypatch.delenv("TPINN_USE_PALLAS", raising=False)
        else:
            monkeypatch.setenv("TPINN_USE_PALLAS", env)
        spec = CaseSpec(
            name="Poiseuille_Fused",
            extents=[(0.0, 1.0), (0.0, 0.1)],
            grid_shape=(10, 6),
            physics=NSPhysics(conv=prm.rho, visc=prm.mu),
            exact=(
                lambda x: analytic.poiseuille_u(x, prm),
                lambda x: analytic.poiseuille_v(x, prm),
                lambda x: analytic.poiseuille_p(x, prm),
            ),
            bnd_val={
                0: {"BOT": 0.0, "TOP": 0.0},
                1: {"BOT": 0.0, "TOP": 0.0},
            },
        )
        opts = SimulationOptions(
            epochs=0, n_pde=32, n_bc=8, n_vel=4, n_pres=0, n_test=16
        )
        return StandardNSDriver(
            spec, opts, base_dir=".", save_results=False, seed=0,
            second_round="none",
        )

    from tpinn.losses import PrecomputedMeanSquares

    drv_fused = build("1")
    assert isinstance(drv_fused.losses[0], PrecomputedMeanSquares)
    drv_xla = build("0")
    assert not isinstance(drv_xla.losses[0], PrecomputedMeanSquares)

    params = drv_xla.model.params
    drv_fused.model.params = params  # same weights
    for lf, lx in zip(drv_fused.losses[:3], drv_xla.losses[:3]):
        assert lf.name == lx.name
        np.testing.assert_allclose(
            float(lf.raw_value()), float(lx.raw_value()), rtol=1e-10
        )
    # gradients of the global loss agree too (exercises the custom VJP
    # through the OptimizationProblem loss_fn path)
    from tpinn.problem import OptimizationProblem

    pb_f = OptimizationProblem(drv_fused.model.variables, drv_fused.losses)
    pb_x = OptimizationProblem(drv_xla.model.variables, drv_xla.losses)
    gf, _ = jax.flatten_util.ravel_pytree(jax.grad(pb_f.loss_fn)(params))
    gx, _ = jax.flatten_util.ravel_pytree(jax.grad(pb_x.loss_fn)(params))
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=1e-12,
                               rtol=1e-7)


def test_driver_resume_appends_rounds(tmp_path):
    """Hybrid stage-B plumbing: a second driver resumes the first's folder,
    loads weights + history, skips Adam, and appends only the second round."""
    prm = analytic.PoiseuilleParams()

    def make_driver(second_round):
        spec = CaseSpec(
            name="Poiseuille_Resume",
            extents=[(0.0, 1.0), (0.0, 0.1)],
            grid_shape=(10, 6),
            physics=NSPhysics(conv=prm.rho, visc=prm.mu),
            exact=(
                lambda x: analytic.poiseuille_u(x, prm),
                lambda x: analytic.poiseuille_v(x, prm),
                lambda x: analytic.poiseuille_p(x, prm),
            ),
            bnd_val={0: {"BOT": 0.0, "TOP": 0.0}, 1: {"BOT": 0.0, "TOP": 0.0}},
        )
        opts = SimulationOptions(
            epochs=30, n_pde=32, n_bc=8, n_vel=4, n_pres=0, n_test=16
        )
        return StandardNSDriver(
            spec, opts, base_dir=str(tmp_path), save_results=True, seed=0,
            second_round=second_round, adam_epochs=20,
        )

    d1 = make_driver("none")
    d1.train(callbacks=True)
    d1.save_artifacts()
    folder = d1.folder
    h1_last = d1.pb.history.iters[-1]

    # L-BFGS: the cheapest-to-compile on-device second round — the resume
    # plumbing under test is optimizer-agnostic (dense BFGS is exercised in
    # tests/test_optimize_bfgs.py)
    d2 = make_driver("jax")
    d2.train(resume_from=folder, callbacks=True)
    h2 = d2.pb.history
    assert h2.round_names[-1] == "jax_L-BFGS"
    assert h2.round_names.count("keras_Adam") == 1  # no second Adam round
    assert h2.round_starts[-1] == h1_last + 1
    assert h2.loss_global[-1] <= d1.pb.history.loss_global[-1] * 1.0001
    # resumed run wrote into the SAME folder
    assert d2.folder == folder

    # crash recovery: a checkpoint.pkl NEWER than Weights.h5 (periodic flush
    # of a killed round) must win over the stale final weights
    import os
    import time as _time

    import numpy as np

    from tpinn import checkpoint as ckpt

    # float32 like a TPU stage-A flush: the recovery path must cast back to
    # the resuming model's dtype (an uncast f32 tree crashes the f64 rounds)
    marked = jax.tree_util.tree_map(
        lambda a: (np.asarray(a) + 0.125).astype(np.float32),
        d2.model.current_params,
    )
    _time.sleep(0.05)
    ckpt.save_checkpoint(os.path.join(folder, "checkpoint.pkl"), marked)
    os.utime(os.path.join(folder, "Weights.h5"),
             (_time.time() - 10, _time.time() - 10))
    d3 = make_driver("none")
    d3.train(resume_from=folder, callbacks=False)
    got = d3.model.current_params
    assert jnp.asarray(got[0]["kernel"]).dtype == d3.model.dtype
    np.testing.assert_allclose(
        np.asarray(got[0]["kernel"]), np.asarray(marked[0]["kernel"])
    )


def _tiny_spec():
    prm = analytic.PoiseuilleParams()
    return CaseSpec(
        name="Tiny",
        extents=[(0.0, 1.0), (0.0, 0.1)],
        grid_shape=(8, 4),
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
    )


def test_driver_end_to_end_quick(tmp_path):
    """Quick-tier end-to-end: all 13 stages and every artifact, on a
    Dirichlet-only spec (no Neumann jet compile)."""
    import os

    opts = SimulationOptions(epochs=10, n_pde=24, n_bc=6, n_vel=4,
                             n_pres=0, n_test=12)
    driver = StandardNSDriver(
        _tiny_spec(), opts, base_dir=str(tmp_path), save_results=True,
        seed=0, second_round="scipy-parity", adam_epochs=10,
    )
    pb = driver.train(callbacks=False)
    assert pb.history.round_names == ["keras_Adam", "scipy_BFGS"]
    driver.save_artifacts(
        loss_groups={"Test_Loss": ["u_test", "v_test", "p_test"]}
    )
    folder = driver.folder
    for artifact in (
        "Model.json", "Weights.h5", "History_Loss.json",
        "Graphic.jpg", "Loss_Trend_Reduced.png", "Test_Options.txt",
        "checkpoint.pkl",
    ):
        assert os.path.exists(os.path.join(folder, artifact)), artifact
    assert os.path.basename(folder) == "Test_Case_#001"


def test_second_round_scipy_routes_to_resumable_bfgs(monkeypatch):
    """VERDICT r1 item 8: 'scipy' second rounds default to the on-device
    dense BFGS (exactly checkpoint-resumable carry); 'scipy-parity'
    requests the reference's actual host-scipy round.  Routing is asserted
    on a recorded minimize; the real optimizer paths are covered by
    tests/test_optimize*.py and test_driver_resume_appends_rounds."""
    import tpinn.driver as drv_mod

    opts = SimulationOptions(epochs=3, n_pde=16, n_bc=4, n_vel=4,
                             n_pres=0, n_test=8)
    recorded = []
    monkeypatch.setattr(
        drv_mod, "minimize",
        lambda pb, framework, method, num_epochs=None, **kw:
            recorded.append((framework,
                             getattr(method, "__class__", type(method)).__name__
                             if framework == "keras" else method)))

    for second_round, expect in (
        ("scipy", ("jax", "BFGS")),
        ("scipy-parity", ("scipy", "BFGS")),
        ("jax-bfgs", ("jax", "BFGS")),
        ("lm", ("jax", "LM")),
    ):
        recorded.clear()
        drv = StandardNSDriver(_tiny_spec(), opts, save_results=False, seed=0,
                               second_round=second_round, adam_epochs=3)
        drv.train(callbacks=False)
        assert recorded[0][0] == "keras"
        assert recorded[1] == expect, second_round

    # L-BFGS-B scipy_method routes to the on-device L-BFGS
    recorded.clear()
    drv = StandardNSDriver(_tiny_spec(), opts, save_results=False, seed=0,
                           second_round="scipy", scipy_method="L-BFGS-B",
                           adam_epochs=3)
    drv.train(callbacks=False)
    assert recorded[1] == ("jax", "L-BFGS")
