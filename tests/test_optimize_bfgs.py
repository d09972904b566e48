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
