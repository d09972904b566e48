"""Fused Navier–Stokes residual builders and the shared case pipeline.

The reference duplicates ~13 pipeline stages across its six drivers
(SURVEY.md §2.2).  This module factors the physics into *fused* residual
closures built on :func:`tpinn.operators.taylor_bundle`: one Taylor-mode
forward evaluation yields (u, v, p), their full Jacobian and the Hessian
diagonals, serving mass + both momentum residuals + Neumann tractions at
once.  The reference's tape walks the network ~7 times per momentum loss
(SURVEY.md §3.3); here XLA sees a single fused graph and deduplicates across
the per-loss closures via CSE.

General momentum residual (covers every reference case):

    r_k = a_t ∂t U_k + a_c (U·∇)U_k − a_v ΔU_k + a_p ∂k P

with (a_t, a_c, a_v, a_p):
  Poiseuille (0, ρ, μ, 1)   — dimensional NS (poiseuille_flow.py:194)
  Colliding  (0, 1, 1, 1)   — Stokes + retained convection (colliding_flow.py:181)
  Cavity st. (0, 1, 1, 1)   — ν = 1 (cavity_steady.py:183-185; the reference's
                              ``du_xx - du_yy`` sign slip is corrected here)
  Cavity un. (1, 1, 1, 1)   — (cavity_unsteady.py:187-196)
  Coronary   (0, 1, ν, 1)   — kinematic ν (coronary_flow_steady.py PDE_MOM)

Fields are de-normalized inside the residual (U = norm_vel·u*, P =
norm_pre·p*) and the residual is rescaled by 1/max(norm_pre, norm_vel),
matching the reference's spread-normalization (poiseuille_flow.py:184-197) —
this keeps float32 TPU training at reference (float64) accuracy.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from tpinn.geometry import Normalization
from tpinn.models import Model
from tpinn.operators import taylor_bundle


@dataclasses.dataclass(frozen=True)
class NSPhysics:
    """Momentum-equation coefficients (see module docstring)."""

    conv: float = 1.0  # a_c
    visc: float = 1.0  # a_v
    time: float = 0.0  # a_t (1 for unsteady)
    pres: float = 1.0  # a_p

    @property
    def unsteady(self) -> bool:
        return self.time != 0.0


class ResidualBundle:
    """Per-batch fused (value, jacobian, hessian-diag) of the (u, v, p) field.

    ``spatial_cols`` maps spatial axis -> input column (``(0, 1)`` steady,
    ``(1, 2)`` unsteady where column 0 is time, matching the reference
    derivative-column convention, cavity_unsteady.py:188).
    """

    def __init__(self, model: Model, x, unsteady: bool = False,
                 use_pallas: Optional[bool] = None):
        self.model = model
        self.x = x
        self.unsteady = unsteady
        self.dim_in = int(x.shape[-1])
        self.spatial_cols = (1, 2) if unsteady else (0, 1)
        if use_pallas is None:
            import os

            env = os.environ.get("TPINN_USE_PALLAS")
            if env is not None:
                use_pallas = env not in ("0", "false", "False")
            else:
                # auto: TPU backend + a plain MLP (custom apply_single
                # overrides fall back to the jet path).  Default off: XLA
                # fuses the downstream reduction into the bundle, which
                # usually beats paying the kernel-boundary materialization;
                # the Pallas kernel wins on compile time and on large
                # bundle-output workloads (set TPINN_USE_PALLAS=1).
                use_pallas = False
        self.use_pallas = use_pallas

    def compute(self):
        params = self.model.current_params
        if self.use_pallas:
            from tpinn.pallas import mlp_taylor_bundle

            return mlp_taylor_bundle(params, self.x, dim=self.dim_in)
        if (
            type(self.model).apply_single is Model.apply_single
            and self.model.activation_name == "tanh"
        ):
            # plain tanh MLP: closed-form batched Taylor propagation —
            # identical math, dramatically faster tracing than jet
            from tpinn.operators import mlp_taylor_batched

            return mlp_taylor_batched(params, self.x, self.dim_in)
        f = lambda xi: self.model.apply_single(params, xi)
        bundle = taylor_bundle(f, self.dim_in)
        value, jac, hdiag = jax.vmap(bundle)(self.x)
        return value, jac, hdiag


class FusedNSResidualMSEs:
    """All three steady-2D PDE MSEs (mass, mom-u, mom-v) in ONE fused Pallas
    kernel with a hand-written backward kernel (tpinn.pallas.ns_residual_mse).

    Measured on TPU v5e (bench.py, round 2): the fused train step runs
    5–11× faster than the XLA jet path (1.4e8 pts/s at 262k points,
    2.2e8 at 1M, vs 2.0–2.6e7 for XLA), so this is the default PDE-loss
    evaluator for plain steady-2D tanh-MLP cases on TPU.  The batch streams
    from HBM through a double-buffered VMEM scratch, so batch size is
    unbounded by the 16 MB VMEM.

    The three per-loss closures share one kernel call per trace via an
    identity-keyed memo: loss closures are invoked with the same bound
    parameter pytree within a trace, so the first call computes and the other
    two reuse (XLA cannot be relied on to CSE custom calls).
    """

    def __init__(self, model: Model, x, physics: "NSPhysics",
                 norm: Normalization, np_tile: int = 4096, mesh=None,
                 n_true: Optional[int] = None):
        self.model = model
        self.x = x
        self.physics = physics
        self.norm = norm
        self.np_tile = np_tile
        self.mesh = mesh  # multi-chip: shard_map over the points axis
        # true (pre-padding) row count: under a mesh the batch may carry
        # tail padding up to the device count; the kernels mask it and use
        # n_true as the mean denominator, so the sharded MSE is exact
        self.n_true = int(x.shape[0]) if n_true is None else int(n_true)
        self._memo = None  # (params_leaf_ref, mses)

    def mses(self):
        import jax

        from tpinn.pallas import ns_residual_mse

        params = self.model.current_params
        leaf = params[0]["kernel"]
        if self._memo is not None and self._memo[0] is leaf:
            return self._memo[1]
        interpret = jax.default_backend() != "tpu"
        if self.mesh is not None:
            from tpinn.sharding import sharded_ns_residual_mse

            m = sharded_ns_residual_mse(
                params, self.x, self.physics, self.norm, self.mesh,
                np_tile=self.np_tile, interpret=interpret,
                n_true=self.n_true,
            )
        else:
            m = ns_residual_mse(
                params, self.x, self.physics, self.norm,
                np_tile=self.np_tile, interpret=interpret,
                n_valid=self.n_true, n_mean=self.n_true,
            )
        self._memo = (leaf, m)
        return m

    def loss_fns(self):
        """(mass_fn, momu_fn, momv_fn) closures returning precomputed MSEs."""
        return (
            lambda: self.mses()[0],
            lambda: self.mses()[1],
            lambda: self.mses()[2],
        )


class FusedNSWeightedObjective:
    """ONE-PASS training objective: weighted PDE loss + raw MSE log channels
    + parameter gradients from a single kernel launch
    (tpinn.pallas.ns_residual_weighted_obj — the backward kernel invoked
    with the loss weights as cotangents).  Replaces the fwd+bwd pair of a
    value_and_grad over FusedNSResidualMSEs: 3 propagation units instead of
    4, one HBM stream of the batch instead of two, one launch.

    ``loss_fns()`` returns three closures shaped like the usual per-loss
    MSEs: each LOGGED value is the exact raw MSE (the gradient surrogate
    ``(L - stop_grad(L))/w`` added to the first channel is exactly 0.0 in
    the primal), while the gradient of ``Σ wᵢ·fᵢ()`` is exactly ``∇L`` —
    so PrecomputedMeanSquares wiring and History_Loss.json stay unchanged.
    Under a device mesh the same one-pass kernel runs per point shard via
    shard_map with pmean'd loss/MSEs and psum'd parameter grads
    (tpinn.sharding.sharded_ns_weighted_obj)."""

    def __init__(self, model: Model, x, physics: "NSPhysics",
                 norm: Normalization, weights, np_tile: int = 4096,
                 mesh=None, n_true: Optional[int] = None):
        self.model = model
        self.x = x
        self.physics = physics
        self.norm = norm
        self.weights = tuple(float(w) for w in weights)
        self.np_tile = np_tile
        self.mesh = mesh  # multi-chip: shard_map over the points axis
        # see FusedNSResidualMSEs.n_true (exact-mean masking of padding)
        self.n_true = int(x.shape[0]) if n_true is None else int(n_true)
        self._memo = None

    def _compute(self):
        params = self.model.current_params
        leaf = params[0]["kernel"]
        if self._memo is not None and self._memo[0] is leaf:
            return self._memo[1]
        interpret = jax.default_backend() != "tpu"
        if self.mesh is not None:
            from tpinn.sharding import sharded_ns_weighted_obj

            out = sharded_ns_weighted_obj(
                params, self.x, self.physics, self.norm, self.weights,
                self.mesh, np_tile=self.np_tile, interpret=interpret,
                n_true=self.n_true,
            )
        else:
            from tpinn.pallas import ns_residual_weighted_obj

            out = ns_residual_weighted_obj(
                params, self.x, self.physics, self.norm, self.weights,
                np_tile=self.np_tile, interpret=interpret,
                n_valid=self.n_true, n_mean=self.n_true,
            )
        self._memo = (leaf, out)
        return out

    def loss_fns(self):
        # gradient rides the first channel whose weight is nonzero
        gi = next((i for i, w in enumerate(self.weights) if w != 0.0), 0)
        wg = self.weights[gi] or 1.0

        def chan(i):
            def fn():
                L, m = self._compute()
                v = jax.lax.stop_gradient(m[i])
                if i == gi:
                    v = v + (L - jax.lax.stop_gradient(L)) / wg
                return v
            return fn

        return chan(0), chan(1), chan(2)


class FusedPoissonObjective:
    """ONE-PASS Poisson objective: weighted −Δu−f loss + raw MSE log channel
    + parameter gradients from a single kernel launch
    (tpinn.pallas.poisson_residual_weighted_obj) — the Poisson member of the
    one-pass kernel family (see FusedNSWeightedObjective for the contract).
    This closes the last jet-by-construction PDE family: with it, every PDE
    loss in the repo can train through a fused Pallas kernel on TPU.

    Reference semantics: Examples/Poisson_Problem/poisson.py:58-63."""

    def __init__(self, model: Model, x, f, weight: float,
                 normalization: float = 1.0, np_tile: int = 4096):
        self.model = model
        self.x = x
        self.f = f
        self.weight = float(weight)
        self.normalization = float(normalization)
        self.np_tile = np_tile
        self._memo = None

    def _compute(self):
        from tpinn.pallas import poisson_residual_weighted_obj

        params = self.model.current_params
        leaf = params[0]["kernel"]
        if self._memo is not None and self._memo[0] is leaf:
            return self._memo[1]
        interpret = jax.default_backend() != "tpu"
        out = poisson_residual_weighted_obj(
            params, self.x, self.f, self.weight,
            normalization=self.normalization, np_tile=self.np_tile,
            interpret=interpret,
        )
        self._memo = (leaf, out)
        return out

    def loss_fn(self):
        """Closure for PrecomputedMeanSquares: logs the exact raw MSE while
        carrying the one-pass gradient through the surrogate term (which is
        exactly 0.0 in the primal)."""
        w = self.weight or 1.0

        def fn():
            L, mse = self._compute()
            return jax.lax.stop_gradient(mse) + (
                L - jax.lax.stop_gradient(L)
            ) / w

        return fn


def use_fused_pde_losses(model: Model, spec_unsteady: bool, dim_in: int,
                         mesh=None) -> bool:
    """Default policy for routing the PDE losses through the fused Pallas
    kernel: 2-D steady (x, y) or unsteady (t, x, y), plain tanh MLP, TPU
    backend (or forced via TPINN_USE_PALLAS=1); TPINN_USE_PALLAS=0
    disables.  Under a device mesh the kernel runs per-shard via shard_map
    with a pmean reduction (tpinn.sharding.sharded_ns_residual_mse)."""
    import os

    import jax

    env = os.environ.get("TPINN_USE_PALLAS")
    if env is not None and env in ("0", "false", "False"):
        return False
    plain = (
        type(model).apply_single is Model.apply_single
        and model.activation_name == "tanh"
    )
    eligible = dim_in == (3 if spec_unsteady else 2) and plain
    if not eligible:
        return False
    from tpinn.pallas.mlp_bundle import bwd_chunk_fits

    if not bwd_chunk_fits(model.layer_sizes, dim_in, 2, model.dtype):
        # net too wide for the streamed bwd kernel's minimum 256-lane
        # chunk (round-4 advisor finding): fall back to the XLA jet path
        # rather than overflow the scoped VMEM
        import warnings

        warnings.warn(
            f"fused PDE-loss kernels disabled: widths {model.layer_sizes} "
            "exceed the streamed-bwd VMEM budget at the 256-lane floor; "
            "using the XLA jet path",
            stacklevel=2,
        )
        return False
    if env is not None:  # forced on (tests use interpret-mode-capable CPU)
        return True
    return jax.default_backend() == "tpu"


def _mass_rows(jac, cols):
    cx, cy = cols
    return jac[:, 0, cx] + jac[:, 1, cy]


def _momentum_rows(value, jac, hdiag, cols, k, physics, norm):
    cx, cy = cols
    nv, npre = norm.norm_vel, norm.norm_pre

    U = nv * value[:, 0]
    V = nv * value[:, 1]
    dUk_dx = nv * jac[:, k, cx]
    dUk_dy = nv * jac[:, k, cy]
    lap_Uk = nv * (hdiag[:, k, cx] + hdiag[:, k, cy])
    dP_dk = npre * jac[:, 2, (cx, cy)[k]]

    r = (
        physics.conv * (U * dUk_dx + V * dUk_dy)
        - physics.visc * lap_Uk
        + physics.pres * dP_dk
    )
    if physics.unsteady:
        r = r + physics.time * nv * jac[:, k, 0]
    return r * norm.residual_scale


def _neumann_rows(value, jac, cols, k, direction, physics, norm, rhs):
    cx, cy = cols
    nv, npre = norm.norm_vel, norm.norm_pre
    P = npre * value[:, 2]
    gx = nv * jac[:, k, cx]
    gy = nv * jac[:, k, cy]
    if isinstance(direction, int):
        grad_n = (gx, gy)[direction]
        p_term = P * (1.0 if direction == k else 0.0)
    else:
        n = jnp.asarray(direction)
        grad_n = gx * n[0] + gy * n[1]
        p_term = P * n[k]
    return (physics.visc * grad_n - p_term - rhs) * norm.residual_scale


def mass_residual(bundle: ResidualBundle, norm: Normalization):
    """∇·U (physical units are irrelevant: scaled by norm_vel uniformly)."""
    _, jac, _ = bundle.compute()
    return _mass_rows(jac, bundle.spatial_cols)


def momentum_residual(
    bundle: ResidualBundle,
    k: int,
    physics: NSPhysics,
    norm: Normalization,
):
    """r_k as in the module docstring, spread-rescaled."""
    value, jac, hdiag = bundle.compute()
    return _momentum_rows(value, jac, hdiag, bundle.spatial_cols, k,
                          physics, norm)


def neumann_residual(
    bundle: ResidualBundle,
    k: int,
    direction,
    physics: NSPhysics,
    norm: Normalization,
    rhs=0.0,
):
    """Traction residual on a boundary with (possibly oblique) normal.

    ``direction``: an int j for an axis-aligned normal — residual
    μ ∂U_k/∂x_j − P δ_kj − rhs (reference poiseuille_flow.py:199-209) — or a
    length-2 vector n for the projected form ν (∇U_k·n) − P n_k − rhs
    (reference coronary_flow_steady.py:213-227; n is used unnormalized there,
    and we keep that contract).
    """
    value, jac, _ = bundle.compute()
    return _neumann_rows(value, jac, bundle.spatial_cols, k, direction,
                         physics, norm, rhs)


def dirichlet_residual(model: Model, points, component: int, rhs):
    """u_k(points) − rhs in normalized space (reference dir_loss,
    poiseuille_flow.py:214-216).  Shared by BC / fit / test losses."""
    out = model(points)
    val = out.value if hasattr(out, "value") else out
    return val[:, component] - rhs


def initial_condition_residual(model: Model, points, component: int, rhs=0.0):
    """t = 0 condition (reference IN_C, cavity_unsteady.py:208)."""
    return dirichlet_residual(model, points, component, rhs)


def pressure_mean_penalty(model: Model, points):
    """|mean p| pressure-gauge penalty (reference PRESS_0,
    colliding_flow_pressmean.py:177-180; used with ns.Loss non_negative)."""
    out = model(points)
    val = out.value if hasattr(out, "value") else out
    return jnp.abs(jnp.mean(val[:, 2]))


# ---------------------------------------------------------------------------
# Per-point residual builders (LossMeanSquares.point_residual protocol)
# ---------------------------------------------------------------------------
#
# Every PINN residual component depends on exactly ONE collocation point, so
# the LM/Gauss–Newton Jacobian can be built as vmap-over-points of a
# single-point reverse pass (cost ≈ 3 batch forwards) instead of ~P/chunk
# full-batch forward-mode sweeps (the 26 s/iter bottleneck of the
# f64-on-TPU campaign, RESULTS_TPU.md).  Each builder returns
# fn(params, *row_args) -> scalar with EXPLICIT params; the row formulas are
# shared with the batch closures above (evaluated on a 1-row batch).


def taylor_tri_fn(model: Model, dim_in: int):
    """(params, x) -> (value, jac, hdiag) with explicit params (any batch).

    The building block for custom ``point_residual`` functions (e.g. the
    Poisson examples' −Δu − f): call on a 1-row batch and index [0]."""
    if (type(model).apply_single is Model.apply_single
            and model.activation_name == "tanh"):
        from tpinn.operators import mlp_taylor_batched

        return lambda params, x: mlp_taylor_batched(params, x, dim_in)

    def tri(params, x):
        f = lambda xi: model.apply_single(params, xi)
        return jax.vmap(taylor_bundle(f, dim_in))(x)

    return tri


def pde_point_residuals(model: Model, physics: NSPhysics,
                        norm: Normalization, unsteady: bool = False):
    """(mass_fn, momu_fn, momv_fn), each fn(params, xi) -> scalar."""
    cols = (1, 2) if unsteady else (0, 1)
    dim_in = 3 if unsteady else 2
    tri = taylor_tri_fn(model, dim_in)

    def mass_fn(params, xi):
        _, jac, _ = tri(params, xi[None, :])
        return _mass_rows(jac, cols)[0]

    def mom_fn(k):
        def fn(params, xi):
            value, jac, hdiag = tri(params, xi[None, :])
            return _momentum_rows(value, jac, hdiag, cols, k, physics,
                                  norm)[0]
        return fn

    return mass_fn, mom_fn(0), mom_fn(1)


def neumann_point_residual(model: Model, k: int, direction,
                           physics: NSPhysics, norm: Normalization,
                           unsteady: bool = False):
    """fn(params, xi, rhs_i) -> scalar traction residual at one point."""
    cols = (1, 2) if unsteady else (0, 1)
    dim_in = 3 if unsteady else 2
    tri = taylor_tri_fn(model, dim_in)

    def fn(params, xi, rhs_i):
        value, jac, _ = tri(params, xi[None, :])
        return _neumann_rows(value, jac, cols, k, direction, physics, norm,
                             rhs_i)[0]

    return fn


def dirichlet_point_residual(model: Model, component: int):
    """fn(params, xi, rhs_i) -> scalar u_k(xi) − rhs_i (BC / fit / IC)."""

    def fn(params, xi, rhs_i):
        return model.apply(params, xi[None, :])[0, component] - rhs_i

    return fn


def scaled_point_residual(fn):
    """Wrap a point-residual fn(params, *rows) to take a trailing
    mask-scale row (tpinn.sharding.shard_pair's exactness protocol: rows
    are scaled by sqrt(n_pad/n) and padding rows by 0, so the mean over the
    padded batch equals the original mean exactly).  This keeps the LM
    per-point Gram available under a device mesh: a zero-scaled padding row
    has zero residual AND zero parameter gradient, so it contributes
    nothing to JᵀJ / JᵀR."""

    def wrapped(params, *rows):
        return fn(params, *rows[:-1]) * rows[-1]

    return wrapped
