"""Physics differential operators, TPU-first.

Two layers:

1. **Per-point functional core** (`gradient_fn`, `laplacian_fn`,
   `divergence_fn`, `taylor_bundle`): operate on pure per-point functions
   ``f(xi) -> scalar/vector`` and are lifted over batches with ``jax.vmap``.
   Second-order quantities use *Taylor-mode* (jax.experimental.jet) forward
   propagation — for a d-dimensional input, the full (value, Jacobian,
   Hessian-diagonal) bundle costs d truncated-Taylor forward passes instead
   of the reference's seven-plus tape re-walks per momentum residual
   (reference hot loop: Examples/Poiseuille_Flow/poiseuille_flow.py:180-197,
   analysed in SURVEY.md §3.3).

2. **Tape-style surface** (`gradient_scalar`, `divergence_vector`,
   `laplacian_scalar`) re-exported via
   ``tpinn.experimental.physics.tens_style`` with the exact nisaba signatures
   (SURVEY.md §2.1).  These consume `tpinn.tape.TapedArray`s and return new
   TapedArrays, so second derivatives can be taken by re-applying
   `gradient_scalar` to a first-derivative column — the idiom used by
   Examples/Cavity_Steady/cavity_steady.py:180-181.

Note the reference's `divergence_vector` silently returned zeros when applied
to a post-tape slice (SURVEY.md §2.1 anomaly, visible as PDE_MASS == 0.0 in
Examples/Poiseuille_Flow/Test_Case_#016/History_Loss.json).  This
implementation computes the true divergence.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import jet

from tpinn.tape import TapedArray, pointwise_fn

# ---------------------------------------------------------------------------
# Per-point functional core
# ---------------------------------------------------------------------------


def _scalarize(f: Callable) -> Callable:
    """Wrap f so its output is a true scalar (handles (1,)-shaped outputs)."""

    def g(xi):
        out = f(xi)
        return jnp.reshape(out, ())

    return g


def gradient_fn(f: Callable) -> Callable:
    """∇f for a per-point scalar function: returns ``xi -> (d,)``."""
    return jax.grad(_scalarize(f))


def jacobian_fn(f: Callable) -> Callable:
    """Jacobian for a per-point vector function: returns ``xi -> (m, d)``."""
    return jax.jacfwd(f)


def divergence_fn(f: Callable, dim: int) -> Callable:
    """∇·f for a per-point vector field ``xi -> (m,)`` with m >= dim.

    Uses dim jvp evaluations (forward mode) — no full-Jacobian materialization.
    """

    def div(xi):
        basis = jnp.eye(xi.shape[-1], dtype=xi.dtype)
        comps = [
            jax.jvp(f, (xi,), (basis[k],))[1][k] for k in range(dim)
        ]
        return sum(comps)

    return div


def laplacian_fn(f: Callable, dim: int) -> Callable:
    """Δf for a per-point scalar function via Taylor-mode second derivatives.

    For each coordinate direction e_k, one second-order jet pass yields
    d²f(x + t e_k)/dt² = H[e_k, e_k]; the Laplacian is their sum.  Cost:
    ``dim`` truncated-Taylor forward evaluations (cheapest known scheme for
    Hessian diagonals; same trick as CAN-PINN-style fused derivatives).
    """
    fs = _scalarize(f)

    def lap(xi):
        basis = jnp.eye(xi.shape[-1], dtype=xi.dtype)
        total = jnp.zeros((), dtype=xi.dtype)
        zero = jnp.zeros_like(xi)
        for k in range(dim):
            _, (_, d2) = jet.jet(fs, (xi,), ((basis[k], zero),))
            total = total + d2
        return total

    return lap


def hessian_diag_fn(f: Callable, dim: int) -> Callable:
    """Diagonal of the Hessian of a per-point scalar function: ``xi -> (dim,)``."""
    fs = _scalarize(f)

    def hdiag(xi):
        basis = jnp.eye(xi.shape[-1], dtype=xi.dtype)
        zero = jnp.zeros_like(xi)
        outs = []
        for k in range(dim):
            _, (_, d2) = jet.jet(fs, (xi,), ((basis[k], zero),))
            outs.append(d2)
        return jnp.stack(outs)

    return hdiag


def taylor_bundle(f: Callable, dim: int) -> Callable:
    """Fused (value, Jacobian, Hessian-diagonal) of a per-point vector field.

    ``f: xi (d,) -> (m,)``  →  ``xi -> (value (m,), jac (m, dim), hdiag (m, dim))``

    This is THE hot bundle for Navier–Stokes residuals: u, v, p values, all
    first derivatives, and the Laplacian diagonals, in ``dim`` jet passes.
    The Pallas kernel in tpinn.pallas implements the same propagation scheme
    in-kernel.
    """

    def bundle(xi):
        basis = jnp.eye(xi.shape[-1], dtype=xi.dtype)
        zero = jnp.zeros_like(xi)
        jac_cols = []
        hdiag_cols = []
        value = None
        for k in range(dim):
            primal, (d1, d2) = jet.jet(f, (xi,), ((basis[k], zero),))
            value = primal
            jac_cols.append(d1)
            hdiag_cols.append(d2)
        return value, jnp.stack(jac_cols, axis=-1), jnp.stack(hdiag_cols, axis=-1)

    return bundle


def mlp_taylor_batched(params, x, dim: int, activation=jnp.tanh):
    """Closed-form batched Taylor-bundle for a dense MLP — no jet, no vmap.

    Same propagation math as the Pallas kernel (tpinn.pallas.mlp_bundle) but
    expressed as plain batched matmuls, so it traces in milliseconds (the
    jet-based path re-interprets jaxprs in Python on every trace, which
    dominated compile times for large cases) and XLA sees clean
    (N, w) @ (w, w) matmuls directly.

    params: list of {"kernel", "bias"}; x: (N, d_in).
    Returns (value (N, d_out), jac (N, d_out, dim), hdiag (N, d_out, dim)).

    Only exact for elementwise activations with known first/second
    derivatives (tanh here); tpinn.pipeline uses it automatically for plain
    tanh MLPs and falls back to the jet path otherwise.
    """
    n = x.shape[0]
    d_in = x.shape[1]
    a = x
    eye = jnp.eye(d_in, dtype=x.dtype)
    g = [jnp.broadcast_to(eye[k], (n, d_in)) for k in range(dim)]
    h = [jnp.zeros((n, d_in), dtype=x.dtype) for _ in range(dim)]
    n_layers = len(params)
    for li, layer in enumerate(params):
        W, b = layer["kernel"], layer["bias"]
        z = a @ W + b
        gz = [gk @ W for gk in g]
        hz = [hk @ W for hk in h]
        if li < n_layers - 1:
            t = activation(z)
            tp = 1.0 - t * t          # tanh'
            tpp = -2.0 * t * tp       # tanh''
            a = t
            g = [tp * gzk for gzk in gz]
            h = [tpp * gzk * gzk + tp * hzk for gzk, hzk in zip(gz, hz)]
        else:
            a, g, h = z, gz, hz
    jac = jnp.stack(g, axis=-1)
    hdiag = jnp.stack(h, axis=-1)
    return a, jac, hdiag


# Batched (vmapped) conveniences ------------------------------------------------


def vgrad(f: Callable, xs):
    return jax.vmap(gradient_fn(f))(xs)


def vlaplacian(f: Callable, xs, dim: int):
    return jax.vmap(laplacian_fn(f, dim))(xs)


def vdivergence(f: Callable, xs, dim: int):
    return jax.vmap(divergence_fn(f, dim))(xs)


def vtaylor_bundle(f: Callable, xs, dim: int):
    return jax.vmap(taylor_bundle(f, dim))(xs)


# ---------------------------------------------------------------------------
# Tape-style surface (nisaba tens_style contract, SURVEY.md §2.1)
# ---------------------------------------------------------------------------


def gradient_scalar(tape, u, x, dim: int | None = None) -> TapedArray:
    """∂u/∂x for a scalar field u at N points → (N, d) TapedArray.

    Columns are indexed by input coordinate (col 0 = t in the unsteady case,
    reference Examples/Cavity_Unsteady/cavity_unsteady.py:188).  The result is
    itself taped, so a second derivative is just another gradient_scalar of a
    column (reference Examples/Cavity_Steady/cavity_steady.py:180-181).
    """
    fn = pointwise_fn(u)
    g = gradient_fn(fn)
    value = jax.vmap(g)(u.x)
    return TapedArray(value, g, u.x)


def divergence_vector(tape, u_vect, x, dim: int) -> TapedArray:
    """∇·u for an (N, dim) vector field → (N,) TapedArray."""
    fn = pointwise_fn(u_vect)
    d = divergence_fn(fn, dim)
    value = jax.vmap(d)(u_vect.x)
    return TapedArray(value, d, u_vect.x)


def laplacian_scalar(tape, u, x, dim: int) -> TapedArray:
    """Δu for a scalar field at N points → (N,) TapedArray."""
    fn = pointwise_fn(u)
    lap = laplacian_fn(fn, dim)
    value = jax.vmap(lap)(u.x)
    return TapedArray(value, lap, u.x)


def laplacian_vector(tape, u_vect, x, dim: int) -> TapedArray:
    """Component-wise Δu for an (N, m) vector field → (N, m) TapedArray."""
    fn = pointwise_fn(u_vect)

    def lapv(xi):
        basis = jnp.eye(xi.shape[-1], dtype=xi.dtype)
        zero = jnp.zeros_like(xi)
        total = None
        for k in range(dim):
            _, (_, d2) = jet.jet(fn, (xi,), ((basis[k], zero),))
            total = d2 if total is None else total + d2
        return total

    value = jax.vmap(lapv)(u_vect.x)
    return TapedArray(value, lapv, u_vect.x)
