"""On-device full-BFGS round: convergence on a quadratic and round naming."""

import jax
import jax.numpy as jnp
import numpy as np

import tpinn as ns
from tpinn.models import Model


class TinyModel(Model):
    """2-parameter linear model for fast optimizer tests."""

    def __init__(self):
        super().__init__([1, 2])
        self.params = [
            {"kernel": jnp.array([[5.0, -3.0]]), "bias": jnp.zeros((2,))}
        ]

    def apply(self, params, x):
        return x @ params[0]["kernel"] + params[0]["bias"]


def _make_problem():
    model = TinyModel()
    x = jnp.ones((4, 1))
    target = jnp.array([2.0, 7.0])

    def residual():
        return model(x) - target

    pb = ns.OptimizationProblem(
        model.variables, [ns.LossMeanSquares("fit", residual)], []
    )
    return model, pb


def test_jax_full_bfgs_converges_quadratic():
    model, pb = _make_problem()
    ns.minimize(pb, "jax", "BFGS", num_epochs=30)
    assert pb.history.round_names == ["jax_BFGS"]
    assert pb.history.loss_global[-1] < 1e-12
    kernel = np.asarray(model.params[0]["kernel"])[0]
    bias = np.asarray(model.params[0]["bias"])
    np.testing.assert_allclose(kernel + bias, [2.0, 7.0], atol=1e-5)


def test_jax_lbfgs_converges_quadratic():
    model, pb = _make_problem()
    ns.minimize(pb, "jax", "L-BFGS", num_epochs=30)
    assert pb.history.round_names == ["jax_L-BFGS"]
    assert pb.history.loss_global[-1] < 1e-10


def test_jax_lm_converges_quadratic():
    # Gauss–Newton is exact on a linear least-squares problem: one accepted
    # step per damping level; a handful of iterations reach machine floor
    model, pb = _make_problem()
    ns.minimize(pb, "jax", "LM", num_epochs=10, chunk=4)
    assert pb.history.round_names == ["jax_LM"]
    assert pb.history.loss_global[-1] < 1e-20
    kernel = np.asarray(model.params[0]["kernel"])[0]
    bias = np.asarray(model.params[0]["bias"])
    np.testing.assert_allclose(kernel + bias, [2.0, 7.0], atol=1e-8)


def test_jax_lm_rejects_non_mse_losses():
    import pytest

    model, pb = _make_problem()
    pb.losses.append(ns.Loss("gauge", lambda: jnp.array(0.0)))
    with pytest.raises(ValueError, match="LossMeanSquares"):
        ns.minimize(pb, "jax", "LM", num_epochs=3)


def test_jax_lm_nonlinear_pinn_class():
    # tanh MLP fit (nonlinear in params): LM must still descend fast
    import jax

    model = Model([1, 8, 1], seed=0)
    x = jnp.linspace(-1, 1, 32).reshape(-1, 1)
    target = jnp.sin(3 * x[:, 0])
    pb = ns.OptimizationProblem(
        model.variables,
        [ns.LossMeanSquares("fit", lambda: model(x)[:, 0] - target)],
        [],
    )
    ns.minimize(pb, "jax", "LM", num_epochs=40, chunk=8)
    # width-8 capacity floor is ~1e-5 on sin(3x); LM must reach it from a
    # cold start within 40 iterations (Adam needs thousands)
    assert pb.history.loss_global[-1] < 5e-5
    assert pb.history.loss_global[-1] < 1e-3 * pb.history.loss_global[0]


class TinyModel32(Model):
    """Explicit-float32 2-parameter linear model: the paired-residual tests
    must run in f32 even under the test env's x64 default, because the
    certification floor they exercise is an f32 phenomenon."""

    def __init__(self):
        super().__init__([1, 2])
        self.params = [
            {
                "kernel": jnp.array([[5.0, -3.0]], jnp.float32),
                "bias": jnp.zeros((2,), jnp.float32),
            }
        ]

    def apply(self, params, x):
        return x @ params[0]["kernel"] + params[0]["bias"]


import contextlib


@contextlib.contextmanager
def _f32_config():
    """Force the global dtype to f32 (the paired-residual certification is
    an f32 phenomenon; the test env enables x64)."""
    from tpinn import config

    config.set_dtype(jnp.float32)
    try:
        yield
    finally:
        config.set_dtype(None)


def _make_offset_problem(offset=100.0, scale=1e-4):
    """f32 least-squares problem whose loss sits on a large constant
    pedestal: loss = offset² + mean((scale·(model(x)−target))²).  The
    informative part is ~1e-7 — far below the f32 ulp of the pedestal
    (ulp(1e4) ≈ 1e-3) — so any optimizer that certifies progress by
    comparing absolute f32 losses is blind here.  This is the shape of the
    coronary pure-TPU stall (decrease ~3e-9 vs eps·|loss| ≈ 1e-9) pushed
    to an extreme.  Call under _f32_config()."""
    model = TinyModel32()
    x = jnp.ones((4, 1), jnp.float32)
    target = jnp.array([2.0, 7.0], jnp.float32)
    scale32 = jnp.float32(scale)

    def residual():
        return scale32 * (model(x) - target)

    pb = ns.OptimizationProblem(
        model.variables,
        [
            ns.LossMeanSquares("fit", residual),
            ns.LossMeanSquares(
                "pedestal", lambda: jnp.full((1,), offset, jnp.float32)
            ),
        ],
        [],
    )
    return model, pb


def test_paired_residual_diff_resolves_below_f32_ulp():
    """Δφ = Σ(r₁−r₀)(r₁+r₀) must recover the true loss change when the
    change is far below the f32 ulp of the absolute loss (where the naive
    f32 subtraction of two losses returns pure rounding noise)."""
    from tpinn.optimize import _flat_residual_fn

    with _f32_config():
        _, pb = _make_offset_problem()
        theta0, unravel, residuals = _flat_residual_fn(pb)
        assert theta0.dtype == jnp.float32
        d = jnp.asarray(np.linspace(-1, 1, theta0.shape[0]), theta0.dtype)
        theta1 = theta0 + jnp.float32(1e-2) * d

        r0 = residuals(theta0)
        r1 = residuals(theta1)
        assert r0.dtype == jnp.float32
        paired = float(jnp.dot(r1 - r0, r1 + r0))
        naive = float(jnp.dot(r1, r1)) - float(jnp.dot(r0, r0))

    # ground truth: the change of the f32-rounded objective, accumulated in
    # f64 from the same f32 residual vectors (the paired reduction's whole
    # point is recovering this without f64 hardware)
    r0_64 = np.asarray(r0, np.float64)
    r1_64 = np.asarray(r1, np.float64)
    true = float(r1_64 @ r1_64 - r0_64 @ r0_64)

    assert abs(true) > 0  # the step genuinely changes the loss
    assert abs(paired - true) < 1e-2 * abs(true)
    # the naive f32 value difference cannot see the change at all: it is
    # either exactly 0 or a whole ulp of the pedestal (~1e-3)
    assert abs(naive - true) >= 0.99 * abs(true)


def test_jax_bfgs_paired_converges_on_pedestal():
    """Dense BFGS in paired-residual mode must keep optimizing the small
    informative term sitting on a 1e4 pedestal (value-comparison line
    searches cannot certify any step here in f32)."""
    with _f32_config():
        model, pb = _make_offset_problem()
        ns.minimize(pb, "jax", "BFGS", num_epochs=60)
    kernel = np.asarray(model.params[0]["kernel"])[0]
    bias = np.asarray(model.params[0]["bias"])
    np.testing.assert_allclose(kernel + bias, [2.0, 7.0], atol=2e-3)


def test_jax_lm_paired_converges_on_pedestal():
    """LM's paired-difference accept test: same pedestal problem — the
    absolute-value accept (f_new < f_cur in f32) would reject every step."""
    with _f32_config():
        model, pb = _make_offset_problem()
        ns.minimize(pb, "jax", "LM", num_epochs=12, chunk=4)
    kernel = np.asarray(model.params[0]["kernel"])[0]
    bias = np.asarray(model.params[0]["bias"])
    np.testing.assert_allclose(kernel + bias, [2.0, 7.0], atol=2e-3)


def test_jax_lm_split_carry_navigates_below_f32_ulp():
    """f32 LM keeps the parameter vector in a float64 host carry and
    evaluates at theta = hi + lo through an f32 jvp linearization
    (r(hi) + J(hi)·lo), so damped steps far below ulp(theta) still change
    the evaluation and certify.  Target an optimum 8e-8 off the f32
    parameter lattice: per output column w = kernel + bias with kernel
    pinned near ±5 can only take values on a ~4.8e-7-spaced f32 lattice
    near w = 0, so no float32 parameter vector gets closer than ~8e-8 —
    the f64 carry must land on the target to ~1e-10.  (The targets sit at
    zero output scale so the f32 forward is rounding-free by Sterbenz and
    the lattice argument is exact.)"""
    with _f32_config():
        model = TinyModel32()
        x = jnp.ones((4, 1), jnp.float32)
        target64 = np.array([8e-8, -8e-8])
        t_hi = jnp.asarray(target64.astype(np.float32))
        t_lo = jnp.asarray((target64 - t_hi.astype(np.float64)).astype(np.float32))

        def residual():
            # two-piece target keeps the true optimum off the f32 grid
            # while every arithmetic op stays float32
            return (model(x) - t_hi) - t_lo

        pb = ns.OptimizationProblem(
            model.variables, [ns.LossMeanSquares("fit", residual)], []
        )
        ns.minimize(pb, "jax", "LM", num_epochs=10, chunk=4)

        theta64 = pb.last_theta64
        assert theta64 is not None and theta64.dtype == np.float64
        # recover the f64 parameters: unravel hi and lo parts separately
        from jax.flatten_util import ravel_pytree

        _, unravel = ravel_pytree(model.params)
        hi = theta64.astype(np.float32)
        lo = (theta64 - hi.astype(np.float64)).astype(np.float32)
        p_hi, p_lo = unravel(jnp.asarray(hi)), unravel(jnp.asarray(lo))
        k64 = np.asarray(p_hi[0]["kernel"], np.float64) + np.asarray(
            p_lo[0]["kernel"], np.float64
        )
        b64 = np.asarray(p_hi[0]["bias"], np.float64) + np.asarray(
            p_lo[0]["bias"], np.float64
        )
        w64 = k64[0] + b64
    # the f32 lattice floor is ~8e-8; the carry must do ~1000x better
    np.testing.assert_allclose(w64, target64, rtol=0, atol=1e-10)


def test_jax_bfgs_split_carry_navigates_below_f32_ulp():
    """f32 dense BFGS carries the parameters as an on-device two-float
    (hi, lo) pair with error-free TwoSum accumulation and evaluates through
    the channel-separated linearization r(hi), J(hi)·lo — same sub-ulp
    lattice problem as the LM variant, entirely inside the jitted scan."""
    with _f32_config():
        model = TinyModel32()
        x = jnp.ones((4, 1), jnp.float32)
        target64 = np.array([8e-8, -8e-8])
        t_hi = jnp.asarray(target64.astype(np.float32))
        t_lo = jnp.asarray((target64 - t_hi.astype(np.float64)).astype(np.float32))

        def residual():
            return (model(x) - t_hi) - t_lo

        pb = ns.OptimizationProblem(
            model.variables, [ns.LossMeanSquares("fit", residual)], []
        )
        ns.minimize(pb, "jax", "BFGS", num_epochs=80)

        theta64 = pb.last_theta64
        assert theta64 is not None and theta64.dtype == np.float64
        from jax.flatten_util import ravel_pytree

        _, unravel = ravel_pytree(model.params)
        hi = theta64.astype(np.float32)
        lo = (theta64 - hi.astype(np.float64)).astype(np.float32)
        p_hi, p_lo = unravel(jnp.asarray(hi)), unravel(jnp.asarray(lo))
        k64 = np.asarray(p_hi[0]["kernel"], np.float64) + np.asarray(
            p_lo[0]["kernel"], np.float64
        )
        b64 = np.asarray(p_hi[0]["bias"], np.float64) + np.asarray(
            p_lo[0]["bias"], np.float64
        )
        w64 = k64[0] + b64
    # the f32 lattice floor is ~8e-8; the two-float carry must cross it
    np.testing.assert_allclose(w64, target64, rtol=0, atol=5e-9)


def test_jax_bfgs_fallback_without_residual_vectors():
    """With a non-LossMeanSquares loss in the mix the paired mode is
    unavailable; BFGS must fall back to value-comparison and still work."""
    model, pb = _make_problem()
    pb.losses.append(ns.Loss("gauge", lambda: jnp.array(0.0)))
    ns.minimize(pb, "jax", "BFGS", num_epochs=30)
    kernel = np.asarray(model.params[0]["kernel"])[0]
    bias = np.asarray(model.params[0]["bias"])
    np.testing.assert_allclose(kernel + bias, [2.0, 7.0], atol=1e-4)


def test_jax_full_bfgs_survives_nonfinite_trial_region():
    """A trial point with a non-finite loss or gradient must be rejected,
    not folded into the carry: on colliding (TPU f32) one poisoned step at
    iter ~1050 made params+H NaN for the remaining 4000 epochs.  Here the
    gradient goes NaN outside a ball (sqrt(max(0,.)) has d/dx = 0*inf
    there) while the loss stays finite — exactly the shape the line
    search cannot screen by loss value alone."""
    model = TinyModel()
    x = jnp.ones((4, 1))
    target = jnp.array([2.0, 7.0])

    def residual():
        u = model(x)
        mag = jnp.sum(u**2)
        # finite value everywhere; gradient NaN for mag > 64
        shell = jnp.sqrt(jnp.maximum(64.0 - mag, 0.0)) * 1e-3
        return u - target + shell

    pb = ns.OptimizationProblem(
        model.variables, [ns.LossMeanSquares("fit", residual)], []
    )
    ns.minimize(pb, "jax", "BFGS", num_epochs=40)
    assert np.isfinite(pb.history.loss_global[-1])
    assert np.all(np.isfinite(np.asarray(model.params[0]["kernel"])))
    assert np.all(np.isfinite(np.asarray(model.params[0]["bias"])))
