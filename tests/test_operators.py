"""Operator unit tests against closed-form derivatives of known functions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpinn as ns
from tpinn import operators
from tpinn.experimental.physics import tens_style
from tpinn.models import Model


class AnalyticModel(Model):
    """Model whose forward is an analytic function — exact-derivative oracle."""

    def __init__(self, fn, dim_in, dim_out):
        self._fn = fn
        super().__init__([dim_in, dim_out])

    def apply(self, params, x):
        return jax.vmap(self._fn)(x)

    def apply_single(self, params, xi):
        return self._fn(xi)


def _sin_field(xi):
    # u = sin(x) sin(y): grad = (cos x sin y, sin x cos y), lap = -2 u
    return jnp.array([jnp.sin(xi[0]) * jnp.sin(xi[1])])


def _stokes_field(xi):
    # colliding-flow polynomial solution
    # (reference Examples/Colliding_Flow/colliding_flow.py:71-73)
    x, y = xi[0], xi[1]
    u = 20.0 * x * y**3
    v = 5.0 * x**4 - 5.0 * y**4
    p = 60.0 * x**2 * y - 20.0 * y**3
    return jnp.array([u, v, p])


@pytest.fixture
def pts(key):
    return jax.random.uniform(key, (64, 2), dtype=jnp.float64) * 2.0 - 1.0


def test_gradient_scalar_analytic(pts):
    model = AnalyticModel(_sin_field, 2, 1)
    with ns.GradientTape(persistent=True) as tape:
        tape.watch(pts)
        u = model(pts)
        g = tens_style.gradient_scalar(tape, u, pts)
    expect = np.stack(
        [
            np.cos(pts[:, 0]) * np.sin(pts[:, 1]),
            np.sin(pts[:, 0]) * np.cos(pts[:, 1]),
        ],
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(g.value), expect, atol=1e-10)


def test_laplacian_scalar_analytic(pts):
    model = AnalyticModel(_sin_field, 2, 1)
    with ns.GradientTape(persistent=True) as tape:
        tape.watch(pts)
        u = model(pts)
        lap = tens_style.laplacian_scalar(tape, u, pts, 2)
    expect = -2.0 * np.sin(pts[:, 0]) * np.sin(pts[:, 1])
    np.testing.assert_allclose(np.asarray(lap.value), expect, atol=1e-9)


def test_divergence_vector_solenoidal(pts):
    # colliding-flow velocity is divergence-free
    model = AnalyticModel(_stokes_field, 2, 3)
    with ns.GradientTape(persistent=True) as tape:
        tape.watch(pts)
        uv = model(pts)[:, 0:2]
        div = tens_style.divergence_vector(tape, uv, pts, 2)
    np.testing.assert_allclose(np.asarray(div.value), 0.0, atol=1e-9)


def test_divergence_nonzero_not_the_reference_bug(pts):
    # The reference's divergence_vector silently logged 0.0 (SURVEY.md §2.1
    # anomaly); ours must produce the true (nonzero) divergence.
    fld = lambda xi: jnp.array([xi[0] ** 2, xi[1] ** 2, 0.0])
    model = AnalyticModel(fld, 2, 3)
    with ns.GradientTape(persistent=True) as tape:
        tape.watch(pts)
        uv = model(pts)[:, 0:2]
        div = tens_style.divergence_vector(tape, uv, pts, 2)
    expect = 2.0 * (np.asarray(pts[:, 0]) + np.asarray(pts[:, 1]))
    np.testing.assert_allclose(np.asarray(div.value), expect, atol=1e-9)


def test_second_derivative_by_reapplied_gradient(pts):
    # The cavity-steady idiom: d2u/dx2 via gradient of a gradient column
    # (reference Examples/Cavity_Steady/cavity_steady.py:180-181).
    model = AnalyticModel(_sin_field, 2, 1)
    with ns.GradientTape(persistent=True) as tape:
        tape.watch(pts)
        u = model(pts)
        du = tens_style.gradient_scalar(tape, u, pts)
        du_x = du[:, 0]
        du_xx = tens_style.gradient_scalar(tape, du_x, pts)[:, 0]
    expect = -np.sin(pts[:, 0]) * np.sin(pts[:, 1])
    np.testing.assert_allclose(np.asarray(du_xx.value), expect, atol=1e-8)


def test_taylor_bundle_matches_separate_ops(key):
    model = ns.models.MLP(2, 3, width=16, depth=2, seed=3)
    xs = jax.random.uniform(key, (32, 2), dtype=jnp.float64)
    f = lambda xi: model.apply_single(model.params, xi)
    value, jac, hdiag = operators.vtaylor_bundle(f, xs, 2)
    # value
    np.testing.assert_allclose(
        np.asarray(value), np.asarray(model.apply(model.params, xs)), atol=1e-12
    )
    # jacobian vs jacfwd
    jac_ref = jax.vmap(jax.jacfwd(f))(xs)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ref), atol=1e-9)
    # hessian diag vs full hessian
    hess_ref = jax.vmap(jax.hessian(f))(xs)
    hdiag_ref = np.stack(
        [np.asarray(hess_ref)[:, :, k, k] for k in range(2)], axis=-1
    )
    np.testing.assert_allclose(np.asarray(hdiag), hdiag_ref, atol=1e-8)


def test_unsteady_gradient_columns(key):
    # (t, x, y) input: column 0 = time derivative
    # (reference Examples/Cavity_Unsteady/cavity_unsteady.py:188)
    fld = lambda xi: jnp.array([xi[0] ** 2 + 3.0 * xi[1] + xi[2] ** 3])
    model = AnalyticModel(fld, 3, 1)
    pts3 = jax.random.uniform(key, (16, 3), dtype=jnp.float64)
    with ns.GradientTape(persistent=True) as tape:
        tape.watch(pts3)
        u = model(pts3)
        g = tens_style.gradient_scalar(tape, u, pts3)
    np.testing.assert_allclose(
        np.asarray(g.value[:, 0]), 2.0 * np.asarray(pts3[:, 0]), atol=1e-10
    )
    np.testing.assert_allclose(np.asarray(g.value[:, 1]), 3.0, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(g.value[:, 2]), 3.0 * np.asarray(pts3[:, 2]) ** 2, atol=1e-10
    )


def test_taped_indexing_patterns(pts):
    """Extended TapedArray.__getitem__ (VERDICT r1 weak item 8): batch-axis
    slices / gathers / masks and Ellipsis indexing keep differentiability;
    derivatives on the sub-batch match slicing the full-batch derivative."""
    model = AnalyticModel(_stokes_field, 2, 3)
    with ns.GradientTape(persistent=True) as tape:
        tape.watch(pts)
        out = model(pts)

        full = tens_style.gradient_scalar(tape, out[:, 0], pts).value

        # Ellipsis component selection
        g_ell = tens_style.gradient_scalar(tape, out[..., 0], pts).value
        np.testing.assert_allclose(g_ell, full, rtol=1e-12)

        # batch-axis slice
        sub = out[2:7]
        g_sub = tens_style.gradient_scalar(tape, sub[:, 0], pts).value
        np.testing.assert_allclose(g_sub, full[2:7], rtol=1e-12)

        # fancy gather + component in one index
        idx = jnp.asarray([0, 3, 5])
        g_idx = tens_style.gradient_scalar(tape, out[idx, 0], pts).value
        np.testing.assert_allclose(g_idx, full[idx], rtol=1e-12)

        # boolean mask
        mask = np.zeros(pts.shape[0], dtype=bool)
        mask[1::3] = True
        g_mask = tens_style.gradient_scalar(
            tape, out[jnp.asarray(mask)][:, 0], pts).value
        np.testing.assert_allclose(g_mask, full[mask], rtol=1e-12)

        # scalar row index still severs with a clear error
        row = out[3]
        with pytest.raises(ValueError, match="not differentiable"):
            tens_style.gradient_scalar(tape, row, pts)
