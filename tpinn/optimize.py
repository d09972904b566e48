"""Optimization driver: ``minimize(pb, strategy, ...)``.

Reference contract (SURVEY.md §2.1, §3.2):

* ``ns.minimize(pb, 'keras', Adam(lr), num_epochs)`` — full-batch first-order
  round; logged as ``keras_Adam``; iterations 0..num_epochs with log stride 10.
* ``ns.minimize(pb, 'scipy', 'BFGS'|'L-BFGS-B', num_epochs)`` — host
  quasi-Newton round via scipy.optimize with device-computed value+gradient;
  logged as ``scipy_BFGS`` / ``scipy_L-BFGS-B``.

TPU-native addition:

* ``minimize(pb, 'jax', 'L-BFGS', num_epochs)`` — fully on-device L-BFGS
  (optax.lbfgs with zoom linesearch) in a chunked ``lax.scan``: no per-step
  host↔device round-trips.  The reference's scipy path crosses host↔device
  every iteration ~10k times (SURVEY.md §3.2b); this path crosses once per
  log stride, and only to append floats to the history.

All strategies share one jitted value_and_grad and one jitted full-evaluation
function (per-loss raw values for the history), so each round re-uses the
compiled step.
"""

from __future__ import annotations

import contextlib
import functools
import os
import time
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree

from tpinn.history import LOG_STRIDE
from tpinn.optimizers import _OptaxShim
from tpinn.problem import OptimizationProblem


def _log_point(pb, eval_fn, params, iter_in_round: int) -> None:
    total, train, test = jax.device_get(eval_fn(params))
    pb.history.append(iter_in_round, float(total), train, test)
    # publish the in-flight params so the CheckpointCallback (fired below)
    # snapshots a state CONSISTENT with the history cursor — previously every
    # round only set pb.variables at round end, so a mid-round crash
    # checkpoint held round-START params under a history claiming mid-round
    # progress, and resume silently restarted the round
    pb.variables.set(params)
    global_iter = pb.history.round_starts[-1] + iter_in_round
    pb.fire_callbacks(global_iter)


def _log_iters(num_epochs: int, stride: int):
    """Iterations (within a round) at which the reference logs: 0, s, 2s, ...
    plus the final iteration when not already a multiple of the stride."""
    iters = list(range(0, num_epochs + 1, stride))
    if iters[-1] != num_epochs:
        iters.append(num_epochs)
    return iters


def _consume_resume_state(pb, kind: str):
    """One-shot pickup of a checkpointed optimizer state of the given kind.

    Drivers place ``checkpoint.pkl``'s ``opt_state`` on ``pb.resume_opt_state``
    when resuming an experiment folder.  Each on-device second-order round
    tags the state it persists (``{"kind": "lm"|"bfgs_*", ...}``) so a
    resumed round of the SAME kind can continue exactly — the dense-BFGS
    inverse Hessian, the LM damping, and crucially the float64 split-carry
    parameters, whose sub-ulp ``lo`` channel a plain params-only resume
    rounds away (measured on coronary #005: a 150-iter split-LM round still
    descending 0.4%/iter at its cap, followed by params-only restarts that
    re-stalled within ~7 iterations).
    """
    st = getattr(pb, "resume_opt_state", None)
    if isinstance(st, dict) and str(st.get("kind")) == kind:
        # consume only on a kind match: a tagged state meant for a LATER
        # round of a different kind (e.g. a BFGS round preceding the LM
        # round whose state was checkpointed) must survive this call
        pb.resume_opt_state = None
        return st
    return None


# ---------------------------------------------------------------------------
# First-order round (keras_Adam parity)
# ---------------------------------------------------------------------------


def _minimize_first_order(pb, optimizer, num_epochs: int, round_name: str):
    if isinstance(optimizer, _OptaxShim):
        opt = optimizer.to_optax()
    elif isinstance(optimizer, optax.GradientTransformation):
        opt = optimizer
    elif isinstance(optimizer, (int, float)):
        opt = optax.adam(float(optimizer))
    elif optimizer is None:
        opt = optax.adam(1e-2)
    else:
        raise TypeError(f"unsupported optimizer: {optimizer!r}")

    params = pb.variables.get()
    opt_state = opt.init(params)
    loss_fn = pb.loss_fn
    eval_fn = pb.eval_jit()

    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def run_chunk(params, opt_state, n_steps):
        def body(carry, _):
            p, s = carry
            _, g = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(g, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), None

        (params, opt_state), _ = jax.lax.scan(
            body, (params, opt_state), None, length=n_steps
        )
        return params, opt_state

    pb.history.start_round(round_name)
    pb.last_round_name = round_name
    t0 = time.perf_counter()
    _log_point(pb, eval_fn, params, 0)
    done = 0
    for target in _log_iters(num_epochs, LOG_STRIDE)[1:]:
        params, opt_state = run_chunk(params, opt_state, target - done)
        done = target
        pb.last_opt_state = opt_state
        _log_point(pb, eval_fn, params, done)
    pb.variables.set(params)
    pb.history.add_wall_time(time.perf_counter() - t0)
    pb.fire_callbacks(pb.history.iters[-1], force=True)
    return params


# ---------------------------------------------------------------------------
# scipy quasi-Newton round (scipy_BFGS / scipy_L-BFGS-B parity)
# ---------------------------------------------------------------------------


def _minimize_scipy(pb, method: str, num_epochs: int):
    from scipy import optimize as sciopt

    params = pb.variables.get()
    x0, unravel = ravel_pytree(params)
    work_dtype = x0.dtype
    eval_fn = pb.eval_jit()
    vg = pb.value_and_grad()

    def fun(x_np):
        x = unravel(jnp.asarray(x_np, dtype=work_dtype))
        loss, grad = vg(x)
        g_flat, _ = ravel_pytree(grad)
        return float(loss), np.asarray(g_flat, dtype=np.float64)

    pb.history.start_round(f"scipy_{method}")
    pb.last_round_name = f"scipy_{method}"
    pb.last_opt_state = None  # scipy keeps its quasi-Newton state host-side
    t0 = time.perf_counter()
    _log_point(pb, eval_fn, params, 0)

    it_counter = {"n": 0}

    def callback(xk):
        it_counter["n"] += 1
        n = it_counter["n"]
        if n % LOG_STRIDE == 0:
            p = unravel(jnp.asarray(xk, dtype=work_dtype))
            _log_point(pb, eval_fn, p, n)

    res = sciopt.minimize(
        fun,
        np.asarray(x0, dtype=np.float64),
        jac=True,
        method=method,
        callback=callback,
        options={"maxiter": num_epochs},
    )
    params = unravel(jnp.asarray(res.x, dtype=work_dtype))
    pb.variables.set(params)
    n = it_counter["n"]
    if n % LOG_STRIDE != 0:
        _log_point(pb, eval_fn, params, n)
    pb.history.add_wall_time(time.perf_counter() - t0)
    pb.fire_callbacks(pb.history.iters[-1], force=True)
    return params


# ---------------------------------------------------------------------------
# On-device L-BFGS round (TPU-native; no host round-trips in the hot loop)
# ---------------------------------------------------------------------------


def _minimize_jax_lbfgs(pb, num_epochs: int, memory_size: int = 50):
    params = pb.variables.get()
    loss_fn = pb.loss_fn
    eval_fn = pb.eval_jit()

    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=30, initial_guess_strategy="one"
        ),
    )
    opt_state = opt.init(params)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def run_chunk(params, opt_state, n_steps):
        def body(carry, _):
            p, s = carry
            value, grad = value_and_grad(p, state=s)
            updates, s = opt.update(
                grad, s, p, value=value, grad=grad, value_fn=loss_fn
            )
            p = optax.apply_updates(p, updates)
            return (p, s), None

        (params, opt_state), _ = jax.lax.scan(
            body, (params, opt_state), None, length=n_steps
        )
        return params, opt_state

    pb.history.start_round("jax_L-BFGS")
    pb.last_round_name = "jax_L-BFGS"
    t0 = time.perf_counter()
    _log_point(pb, eval_fn, params, 0)
    done = 0
    for target in _log_iters(num_epochs, LOG_STRIDE)[1:]:
        params, opt_state = run_chunk(params, opt_state, target - done)
        done = target
        pb.last_opt_state = opt_state
        _log_point(pb, eval_fn, params, done)
    pb.variables.set(params)
    pb.history.add_wall_time(time.perf_counter() - t0)
    pb.fire_callbacks(pb.history.iters[-1], force=True)
    return params


# ---------------------------------------------------------------------------
# On-device FULL BFGS (dense inverse-Hessian — scipy-BFGS-parity convergence)
# ---------------------------------------------------------------------------
#
# The reference's second round is scipy's dense BFGS over ~2.3k parameters
# (SURVEY.md §3.2b) — full-memory BFGS converges far deeper than limited-
# memory L-BFGS on these small problems (observed: 1e-10 vs 1e-6 global loss
# on Poiseuille).  P ~ few-k ⇒ the P×P inverse-Hessian is tiny; the whole
# loop (direction, strong-Wolfe zoom line search, rank-2 update) runs in one
# lax.scan on device.


def _wolfe_zoom_linesearch(f_1d, f0, g0, max_iters=30, c1=1e-4, c2=0.9):
    """Strong-Wolfe line search on φ(a) = f(x + a d), with Hager–Zhang
    approximate-Wolfe acceptance for float32 robustness.

    f_1d(a) -> (φ(a), φ'(a)).  Bracketing + bisection zoom, fully jittable.
    Returns (alpha, φ(alpha)).

    Float32 failure mode (observed on TPU, round 2): once the achievable
    per-step decrease falls below the absolute resolution of φ
    (≈ eps·|φ|), the Armijo comparison can never certify progress and the
    search collapses to alpha = 0 forever.  Gradients have far better
    signal-to-noise there, so steps are ALSO accepted under the
    approximate Wolfe conditions (Hager & Zhang 2005, CG_DESCENT):

        φ(a) ≤ φ(0) + ε|φ(0)|   and   (2c1−1)φ'(0) ≥ φ'(a) ≥ c2 φ'(0)

    which certify decrease through φ' alone, up to an ε-band of f-noise.
    """
    eps_rel = 10.0 * jnp.finfo(jnp.asarray(f0).dtype).eps

    def cond(state):
        it, done, *_ = state
        return jnp.logical_and(it < max_iters, jnp.logical_not(done))

    def body(state):
        it, done, lo, hi, alpha, best_a, best_f = state
        fa, ga = f_1d(alpha)
        armijo = fa <= f0 + c1 * alpha * g0
        curv = jnp.abs(ga) <= c2 * jnp.abs(g0)
        ok = jnp.logical_and(armijo, curv)
        # approximate-Wolfe acceptance (derivative-based decrease check;
        # Hager–Zhang use δ=0.1, σ=c2=0.9)
        delta = 0.1
        approx = jnp.logical_and(
            fa <= f0 + eps_rel * jnp.abs(f0),
            jnp.logical_and(ga >= c2 * g0, ga <= (2.0 * delta - 1.0) * g0),
        )
        ok = jnp.logical_or(ok, approx)
        # bracket update (Nocedal & Wright zoom): overshoot (Armijo fails)
        # OR positive slope with Armijo both cap the bracket at alpha —
        # without the latter the trial keeps doubling past the minimum.
        hi = jnp.where(jnp.logical_not(armijo), alpha, hi)
        hi = jnp.where(jnp.logical_and(armijo, ga >= 0), alpha, hi)
        lo = jnp.where(jnp.logical_and(armijo, ga < 0), alpha, lo)
        new_alpha = jnp.where(
            jnp.isinf(hi), alpha * 2.0, 0.5 * (lo + hi)
        )
        # NaN-safe best-point tracking: jnp.minimum propagates a NaN trial
        # into best_f, after which `fa < best_f` is False forever and the
        # fallback alpha freezes at a stale value
        better = jnp.logical_and(jnp.isfinite(fa), fa < best_f)
        best_a = jnp.where(better, alpha, best_a)
        best_f = jnp.where(better, fa, best_f)
        return (it + 1, ok, lo, hi,
                jnp.where(ok, alpha, new_alpha), best_a, best_f)

    init = (0, jnp.array(False), jnp.zeros_like(f0), jnp.full_like(f0, jnp.inf),
            jnp.ones_like(f0), jnp.zeros_like(f0), f0)
    it, done, lo, hi, alpha, best_a, best_f = jax.lax.while_loop(
        cond, body, init
    )
    alpha = jnp.where(done, alpha, best_a)
    fa, _ = f_1d(alpha)
    return alpha, fa


def _bfgs_update_H(H, s, y, first, failed, n, dtype):
    """Rank-2 inverse-Hessian update with float32 guards (shared by the
    plain and paired-residual BFGS steps).

    * Curvature guard, dtype-scaled: in float32 a tiny-alpha step makes
      y pure AD noise — folding it into H corrupts the inverse Hessian
      (observed: noise-rho rank-2 updates preceded the TPU stall).
      sqrt(eps) margin rejects noise-dominated pairs.
    * Scale H on the first successful update (Nocedal & Wright eq. 6.20).
    * O(n²) expansion of V H Vᵀ + ρssᵀ with V = I − ρsyᵀ (H symmetric):
      H − ρ s(Hy)ᵀ − ρ (Hy)sᵀ + (ρ²·yᵀHy + ρ)·ssᵀ — the naive V @ H @ Vᵀ
      costs two n³ matmuls, 100× slower at n≈2k.
    * On total line-search failure H is unusable along its own directions —
      reset to identity and re-enter the first-update scaling regime.
    """
    ys = jnp.dot(y, s)
    eps = jnp.finfo(dtype).eps
    safe = ys > 0.1 * jnp.sqrt(eps) * jnp.linalg.norm(y) * jnp.linalg.norm(s)
    rho = jnp.where(safe, 1.0 / jnp.where(safe, ys, 1.0), 0.0)
    gamma = jnp.where(
        jnp.logical_and(first, safe),
        ys / jnp.dot(y, y),
        1.0,
    )
    H_eff = H * gamma
    Hy = H_eff @ y
    yHy = jnp.dot(y, Hy)
    H_upd = (
        H_eff
        - rho * (jnp.outer(s, Hy) + jnp.outer(Hy, s))
        + (rho * rho * yHy + rho) * jnp.outer(s, s)
    )
    H_new = jnp.where(safe, H_upd, H_eff)
    H_new = jnp.where(failed, jnp.eye(n, dtype=dtype), H_new)
    first_new = jnp.logical_or(
        jnp.logical_and(first, jnp.logical_not(safe)), failed
    )
    return H_new, first_new


def _minimize_jax_bfgs(pb, num_epochs: int):
    """Dense on-device BFGS.  When every training loss exposes a residual
    vector (LossMeanSquares), the line search runs in *paired-residual*
    mode: instead of comparing two absolute losses (resolution eps·|f| —
    at f≈1.6e-2 in float32 that is ~1e-9, above the ~3e-9 per-step
    decreases observed at the coronary pure-TPU stall), each trial
    evaluates the loss CHANGE directly as

        Δφ(a) = Σ_i (r_i(x+ad) − r_i(x)) · (r_i(x+ad) + r_i(x))
              = ||r(x+ad)||² − ||r(x)||²   (exactly, in ℝ)

    where the cancellation happens per-residual-component (benign — the
    paired components are nearly equal, and their difference is computed
    from correlated roundings of the same graph) before the reduction
    accumulates only small terms.  The certification resolution then
    scales with |Δφ|, not |f|, letting f32 quasi-Newton keep certifying
    decreases orders of magnitude below the eps·|f| floor that stalls
    value-comparison line searches.  Cost per trial is unchanged: one
    residual forward + one VJP (grad = 2·Jᵀr) instead of value_and_grad.
    """
    params = pb.variables.get()
    x0, unravel = ravel_pytree(params)
    n = x0.shape[0]
    dtype = x0.dtype
    loss_fn = pb.loss_fn
    eval_fn = pb.eval_jit()
    flat_vg = jax.value_and_grad(lambda x: loss_fn(unravel(x)))
    try:
        _, _, residuals = _flat_residual_fn(pb)
    except ValueError:
        residuals = None

    def res_grad(x):
        r, vjp = jax.vjp(residuals, x)
        return r, vjp(2.0 * r)[0]

    # -- split-parameter (two-float) carry: float32 only ------------------
    # The f32 parameter grid is the terminal wall for any f32 optimizer:
    # once the accepted step has |α·d| below ulp(x) componentwise, x + αd
    # rounds back to x and every candidate evaluates to Δφ == 0 (measured:
    # the lane_tpu10 paired-BFGS re-polish reproduced every previous
    # pure-TPU floor bit-identically).  Carry x as an unevaluated two-float
    # pair (hi, lo) with error-free accumulation (Knuth TwoSum — exact
    # under IEEE round-to-nearest, which XLA preserves), and evaluate
    # residuals at hi + lo through the channel-separated linearization
    # r(hi), J(hi)·lo (‖lo‖ ≤ ulp(‖hi‖)/2 by renormalization, so the
    # linearization error is O(ulp²·curvature)).  Same scheme as the
    # split-parameter LM, but living entirely on device inside the scan.
    def _two_sum(a, b):
        """s + err == a + b exactly (Knuth TwoSum, branch-free)."""
        s = a + b
        bb = s - a
        err = (a - (s - bb)) + (b - bb)
        return s, err

    def _df_add(hi, lo, delta):
        """(hi, lo) + delta → renormalized two-float pair (error-free)."""
        s, err = _two_sum(hi, delta)
        lo2 = lo + err
        return _two_sum(s, lo2)

    def eval_ch(hi, lo):
        """r(hi), dr = J(hi)·lo, and gradient 2Jᵀ(r+dr) — the forward is
        shared between the jvp and the transpose via jax.linearize."""
        r, lin = jax.linearize(residuals, hi)
        dr = lin(lo)
        g = jax.linear_transpose(lin, hi)(2.0 * (r + dr))[0]
        return r, dr, g

    def step_plain(carry, _):
        x, f, g, H, first = carry
        d = -(H @ g)
        dg = jnp.dot(d, g)
        # reset to steepest descent if not a descent direction
        bad = dg >= 0
        d = jnp.where(bad, -g, d)
        dg = jnp.where(bad, -jnp.dot(g, g), dg)

        def f_1d(a):
            fa, ga_vec = flat_vg(x + a * d)
            return fa, jnp.dot(ga_vec, d)

        alpha, f_new = _wolfe_zoom_linesearch(f_1d, f, dg)
        alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
        x_new = x + alpha * d
        f_new, g_new = flat_vg(x_new)
        # Non-finite rejection: a trial point can overflow the f32 loss
        # (inf) or hit inf−inf/0·inf in the residuals (NaN); folding such a
        # step into the carry poisons params AND the inverse Hessian for
        # every remaining iteration (observed on colliding: a clean descent
        # to 3.1e-6 went NaN at one step and never recovered).  Reject the
        # step instead: keep (x, f, g), and treat it as a line-search
        # failure below so H resets to identity.
        finite = jnp.logical_and(
            jnp.isfinite(f_new),
            jnp.logical_and(
                jnp.all(jnp.isfinite(x_new)), jnp.all(jnp.isfinite(g_new))
            ),
        )
        x_new = jnp.where(finite, x_new, x)
        f_new = jnp.where(finite, f_new, f)
        g_new = jnp.where(finite, g_new, g)
        failed = jnp.logical_or(alpha == 0.0, jnp.logical_not(finite))
        H_new, first_new = _bfgs_update_H(
            H, x_new - x, g_new - g, first, failed, n, dtype
        )
        return (x_new, f_new, g_new, H_new, first_new), f_new

    def step_paired(carry, _):
        x, f, r, g, H, first = carry
        d = -(H @ g)
        dg = jnp.dot(d, g)
        bad = dg >= 0
        d = jnp.where(bad, -g, d)
        dg = jnp.where(bad, -jnp.dot(g, g), dg)

        def d_1d(a):
            ra, ga_vec = res_grad(x + a * d)
            return jnp.dot(ra - r, ra + r), jnp.dot(ga_vec, d)

        # φ0 = 0 in Δ-space: Armijo becomes Δφ(a) ≤ c1·a·φ'(0), certified
        # at the resolution of Δφ rather than of the absolute loss
        alpha, _ = _wolfe_zoom_linesearch(d_1d, jnp.zeros_like(f), dg)
        alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
        x_new = x + alpha * d
        r_new, g_new = res_grad(x_new)
        delta = jnp.dot(r_new - r, r_new + r)
        f_new = f + delta
        finite = jnp.logical_and(
            jnp.logical_and(
                jnp.isfinite(f_new), jnp.all(jnp.isfinite(x_new))
            ),
            jnp.logical_and(
                jnp.all(jnp.isfinite(g_new)), jnp.all(jnp.isfinite(r_new))
            ),
        )
        x_new = jnp.where(finite, x_new, x)
        f_new = jnp.where(finite, f_new, f)
        g_new = jnp.where(finite, g_new, g)
        r_new = jnp.where(finite, r_new, r)
        failed = jnp.logical_or(alpha == 0.0, jnp.logical_not(finite))
        H_new, first_new = _bfgs_update_H(
            H, x_new - x, g_new - g, first, failed, n, dtype
        )
        return (x_new, f_new, r_new, g_new, H_new, first_new), f_new

    def step_split(carry, _):
        hi, lo, f, r, dr, g, H, first = carry
        d = -(H @ g)
        dg = jnp.dot(d, g)
        bad = dg >= 0
        d = jnp.where(bad, -g, d)
        dg = jnp.where(bad, -jnp.dot(g, g), dg)

        def d_1d(a):
            hia, loa = _df_add(hi, lo, a * d)
            ra, dra, ga_vec = eval_ch(hia, loa)
            # channel-separated paired diff: r-channel cancels bitwise
            # while hi is unchanged; the dr channel resolves sub-ulp steps
            dphi = jnp.dot((ra - r) + (dra - dr), (ra + r) + (dra + dr))
            return dphi, jnp.dot(ga_vec, d)

        alpha, _ = _wolfe_zoom_linesearch(d_1d, jnp.zeros_like(f), dg)
        alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
        hi_n, lo_n = _df_add(hi, lo, alpha * d)
        r_n, dr_n, g_n = eval_ch(hi_n, lo_n)
        delta = jnp.dot((r_n - r) + (dr_n - dr), (r_n + r) + (dr_n + dr))
        f_n = f + delta
        finite = jnp.logical_and(
            jnp.logical_and(jnp.isfinite(f_n), jnp.all(jnp.isfinite(hi_n))),
            jnp.logical_and(
                jnp.all(jnp.isfinite(g_n)),
                jnp.logical_and(
                    jnp.all(jnp.isfinite(r_n)), jnp.all(jnp.isfinite(dr_n))
                ),
            ),
        )
        hi_n = jnp.where(finite, hi_n, hi)
        lo_n = jnp.where(finite, lo_n, lo)
        f_n = jnp.where(finite, f_n, f)
        g_n = jnp.where(finite, g_n, g)
        r_n = jnp.where(finite, r_n, r)
        dr_n = jnp.where(finite, dr_n, dr)
        failed = jnp.logical_or(alpha == 0.0, jnp.logical_not(finite))
        s = (hi_n - hi) + (lo_n - lo)
        H_new, first_new = _bfgs_update_H(
            H, s, g_n - g, first, failed, n, dtype
        )
        return (hi_n, lo_n, f_n, r_n, dr_n, g_n, H_new, first_new), f_n

    if residuals is None:
        step, kind = step_plain, "bfgs_plain"
    elif dtype == jnp.float32:
        step, kind = step_split, "bfgs_split"
    else:
        step, kind = step_paired, "bfgs_paired"

    @functools.partial(jax.jit, static_argnums=1)
    def run_chunk(carry, n_steps):
        return jax.lax.scan(step, carry, None, length=n_steps)

    # exact resume: adopt a checkpointed carry of the same variant whose
    # parameter channel matches the current params bit-for-bit (the saved
    # Weights/checkpoint params ARE carry[0]'s materialization, so any
    # intervening modification — different seed, an Adam round — mismatches
    # and the carry is discarded)
    carry = None
    st = _consume_resume_state(pb, kind)
    if st is not None:
        try:
            saved = tuple(
                jnp.asarray(leaf) for leaf in st["carry"]
            )
            if (saved[0].shape == x0.shape
                    and saved[0].dtype == dtype
                    and bool(jnp.array_equal(saved[0], x0))):
                carry = saved
        except (KeyError, TypeError, ValueError):
            carry = None
    if carry is None:
        if residuals is None:
            f0, g0 = flat_vg(x0)
            carry = (x0, f0, g0, jnp.eye(n, dtype=dtype), jnp.array(True))
        elif dtype == jnp.float32:
            lo0 = jnp.zeros_like(x0)
            r0, dr0, g0 = jax.jit(eval_ch)(x0, lo0)
            f0 = jnp.dot(r0, r0)
            carry = (
                x0, lo0, f0, r0, dr0, g0,
                jnp.eye(n, dtype=dtype), jnp.array(True),
            )
        else:
            r0, g0 = jax.jit(res_grad)(x0)
            f0 = jnp.dot(r0, r0)
            carry = (x0, f0, r0, g0, jnp.eye(n, dtype=dtype), jnp.array(True))

    pb.history.start_round("jax_BFGS")
    pb.last_round_name = "jax_BFGS"
    t0 = time.perf_counter()
    # seed the tagged state before the iter-0 _log_point: its
    # CheckpointCallback flush must not rewrite checkpoint.pkl with
    # opt_state=None when a carry was just adopted from a resume
    pb.last_opt_state = {"kind": kind, "carry": carry}
    _log_point(pb, eval_fn, params, 0)
    done = 0
    for target in _log_iters(num_epochs, LOG_STRIDE)[1:]:
        carry, _ = run_chunk(carry, target - done)
        done = target
        pb.last_opt_state = {"kind": kind, "carry": carry}
        _log_point(pb, eval_fn, unravel(carry[0]), done)
    if residuals is not None and dtype == jnp.float32:
        # expose the full two-float carry for diagnostics/tests (the
        # materialized f32 params below are its nearest-f32 rounding)
        pb.last_theta64 = (
            np.asarray(carry[0], np.float64) + np.asarray(carry[1], np.float64)
        )
    params = unravel(carry[0])
    pb.variables.set(params)
    pb.history.add_wall_time(time.perf_counter() - t0)
    pb.fire_callbacks(pb.history.iters[-1], force=True)
    return params


# ---------------------------------------------------------------------------
# Gauss–Newton / Levenberg–Marquardt round (TPU-native second-order)
# ---------------------------------------------------------------------------


def _flat_residual_fn(pb):
    """θ (flat) -> stacked residual vector R with  ||R(θ)||² == loss_global.

    Each LossMeanSquares contributes sqrt(weight/N)·(r/normalization) — so
    Σ wᵢ·mean((rᵢ/normᵢ)²) = ||R||² exactly, and the damped normal equations
    (JᵀJ + λdiag)δ = −JᵀR minimize the same objective every other round uses.
    """
    from tpinn.losses import LossMeanSquares
    from tpinn.tape import as_value

    for loss in pb.losses:
        if type(loss) is not LossMeanSquares:
            raise ValueError(
                "minimize(pb, 'jax', 'LM') requires every training loss to "
                "expose a residual vector (LossMeanSquares); "
                f"{loss.name!r} is {type(loss).__name__}. Use 'jax'/'scipy' "
                "BFGS for problems with scalar/fused losses."
            )
    params0 = pb.variables.get()
    theta0, unravel = ravel_pytree(params0)

    def residuals(theta):
        params = unravel(theta)
        with pb.variables.bind(params):
            parts = []
            for loss in pb.losses:
                r = jnp.asarray(as_value(loss.fn())) / loss.normalization
                r = r.reshape(-1)
                parts.append(jnp.sqrt(loss.weight / r.size) * r)
        return jnp.concatenate(parts)

    return theta0, unravel, residuals


def _collect_point_entries(pb, unravel, res_jit, theta0):
    """Per-point residual entries [(fn, args, scale)] for the LM fast Gram.

    Requires EVERY training loss to expose ``point_residual`` (see
    tpinn.losses.LossMeanSquares); the stacked per-point evaluation is
    validated against the batch closures at theta0 so a mis-wired
    ``point_residual`` (wrong rhs/noise arrays, stale points) degrades to
    the chunked-jvp path instead of silently optimizing a different
    objective.  Returns None when unavailable or validation fails.
    """
    entries = []
    for loss in pb.losses:
        pr = getattr(loss, "point_residual", None)
        if pr is None:
            return None
        fn, args = pr
        args = tuple(jnp.asarray(a) for a in args)
        n_rows = int(args[0].shape[0])
        scale = float(np.sqrt(loss.weight / n_rows) / loss.normalization)
        entries.append((fn, args, scale))

    parts = []
    params0 = unravel(theta0)
    for fn, args, scale in entries:
        in_axes = (None,) + (0,) * len(args)
        r_l = jax.jit(jax.vmap(fn, in_axes=in_axes))(params0, *args)
        parts.append(np.asarray(r_l).reshape(-1) * scale)
    r_pts = np.concatenate(parts)
    r_batch = np.asarray(res_jit(theta0))
    if r_pts.shape != r_batch.shape:
        print(f"  LM: point_residual stack shape {r_pts.shape} != batch "
              f"{r_batch.shape}; falling back to chunked jacobian",
              flush=True)
        return None
    atol = 1e-5 * float(np.max(np.abs(r_batch)) + 1e-30)
    if not np.allclose(r_pts, r_batch, rtol=1e-4, atol=atol):
        worst = float(np.max(np.abs(r_pts - r_batch)))
        print(f"  LM: point_residual stack deviates from batch closures "
              f"(max |Δ| {worst:.3e}); falling back to chunked jacobian",
              flush=True)
        return None
    return entries


def _minimize_jax_lm(pb, num_epochs: int, chunk: int = 256,
                     verbose: bool = False):
    """Levenberg–Marquardt: damped Gauss–Newton on the stacked residuals.

    The PINN objective is a genuine small-parameter least-squares problem
    (P ≈ 2.3k for the reference architecture), which quasi-Newton methods
    crawl through (the recorded campaigns needed 1e4–1e5 BFGS iterations);
    LM reaches the same basin in tens of iterations.  Per iteration:

    * J (P×N) by chunked vmap-of-jvp — one SMALL jitted chunk function
      called from the host per tangent block (a monolithic fused
      jacobian+matmul graph was measured to explode XLA compile time on the
      jet-based NS residuals); on TPU the chunk is a batch of MXU matmuls
      over the tangent axis;
    * JᵀJ accumulated chunk-by-chunk (never materializes J);
    * one host eigendecomposition of JᵀJ (P×P, LAPACK), after which the
      damped solve δ(λ) = −V (Λ+λ)⁻¹ Vᵀ JᵀR costs O(P²) for ANY λ — the
      damping search re-solves without re-factorizing;
    * accept/reject with multiplicative damping adaptation (Marquardt).

    Logged as round ``jax_LM`` at the standard stride.  Stops early when the
    damping saturates with no acceptable step (converged to the floor).
    """
    theta0, unravel, residuals = _flat_residual_fn(pb)
    n_par = theta0.shape[0]
    dtype = theta0.dtype
    eval_fn = pb.eval_jit()

    if dtype == jnp.float64 and jax.default_backend() == "tpu":
        # software-emulated f64 on TPU expands every jvp temp ~8x (the
        # emulation lowers each f64 op to multi-pass f32); a 256-tangent
        # jacobian chunk was measured to need 22.6G HBM on v5e (15.75G
        # available).  32 tangents fits with headroom and the per-chunk
        # dispatch overhead is amortized by the scan-free host loop.
        chunk = min(chunk, 32)

    # accept/reject needs loss evaluations whose noise is far below the step
    # decrease.  On TPU the default f32 matmul runs through bfloat16 passes,
    # giving ~1e-3 relative evaluation jitter — measured to reject EVERY LM
    # step at loss 0.066 on the coronary case.  Force full-f32 accumulation
    # for the LM round's evaluations and Jacobian.
    def _hp(fn):
        def wrapped(*args):
            with jax.default_matmul_precision("highest"):
                return fn(*args)
        return jax.jit(wrapped)

    loss_fn = _hp(lambda th: pb.loss_fn(unravel(th)))
    res_jit = _hp(residuals)

    n_chunks = -(-n_par // chunk)
    pad = n_chunks * chunk - n_par
    eye = np.eye(n_par, dtype=np.result_type(dtype))
    if pad:
        eye = np.concatenate(
            [eye, np.zeros((pad, n_par), dtype=eye.dtype)], axis=0
        )
    basis_chunks = [
        jnp.asarray(eye[i * chunk:(i + 1) * chunk]) for i in range(n_chunks)
    ]

    # (chunk, N) block of J rows for one block of parameter tangents
    jac_chunk = _hp(
        lambda theta, vs: jax.vmap(
            lambda v: jax.jvp(residuals, (theta,), (v,))[1]
        )(vs)
    )
    gram = _hp(lambda Jt, r: (Jt @ Jt.T, Jt @ r))
    # paired-difference accept test: ||r_new||² − ||r_cur||² evaluated as a
    # sum of per-component (r₁−r₀)(r₁+r₀) products, so its resolution scales
    # with the CHANGE, not with the absolute loss (same certification fix as
    # the paired-residual BFGS line search — see _minimize_jax_bfgs)
    pair_diff = _hp(lambda ra, rb: jnp.dot(ra - rb, ra + rb))

    # Split-parameter carry (float32 only): the terminal f32 LM stall is the
    # parameter grid itself — once the useful damped step has |δ| below
    # ulp(θ), θ+δ rounds back to θ, every candidate evaluates to df == 0,
    # and the damping loop saturates (observed: coronary #005 round exits
    # in minutes with mu at the 1e12 cap while the f64 normal equations
    # still predict descent).  Fix: keep θ in float64 on the HOST (the
    # normal-equation algebra is already host f64) and evaluate residuals
    # at θ = hi + lo with f32 device compute via the linearization
    #     r(hi + lo) ≈ r(hi) + J(hi)·lo        (one extra f32 jvp),
    # whose error is O(‖lo‖²·curvature) — ‖lo‖ ≤ ulp(‖hi‖) makes it far
    # below the accept test's resolution.  Sub-ulp steps then change the
    # evaluation continuously: r(hi) cancels exactly in the paired diff
    # when hi is unchanged and the jvp term resolves the δ-difference.
    split = dtype == jnp.float32

    def _split64(theta64):
        hi = theta64.astype(np.float32)
        lo = (theta64 - hi.astype(np.float64)).astype(np.float32)
        return jnp.asarray(hi), jnp.asarray(lo)

    # value channel r(hi) and correction channel dr = J(hi)·lo are kept
    # SEPARATE: forming r + dr in f32 would round the correction at
    # ulp(r_i), which is exactly the resolution being recovered — at high
    # damping the per-component correction difference sits far below
    # ulp(r_i) and a summed evaluation quantizes every candidate to
    # df == 0 (measured: the summed variant re-stalled coronary #005 at
    # the same loss as the un-split code).
    res_lin = _hp(lambda hi, lo: jax.jvp(residuals, (hi,), (lo,)))

    def _eval_res(theta64):
        if split:
            return res_lin(*_split64(theta64))
        return res_jit(jnp.asarray(theta64, dtype)), None

    # ||r1+d1||² − ||r0+d0||² with every difference taken per channel
    # before any cross-channel f32 addition can quantize it; when hi is
    # unchanged between the two points r1 − r0 cancels bitwise and the
    # whole diff rides the high-resolution dr channel
    pair_diff_split = _hp(
        lambda r1, d1, r0, d0: jnp.dot(
            (r1 - r0) + (d1 - d0), (r1 + r0) + (d1 + d0)
        )
    )

    def _pair_diff_ev(new, cur):
        r1, d1 = new
        r0, d0 = cur
        if d1 is None:
            return float(pair_diff(r1, r0))
        return float(pair_diff_split(r1, d1, r0, d0))

    gram_split = _hp(lambda Jt, r, dr: (Jt @ Jt.T, Jt @ r, Jt @ dr))

    def _normal_eqs_chunked(theta64):
        """residuals (device), JᵀJ (host), JᵀR (host, f64) — chunked."""
        rv = _eval_res(theta64)
        theta_dev = jnp.asarray(theta64.astype(np.result_type(dtype)))
        rows_list = [jac_chunk(theta_dev, vs) for vs in basis_chunks]
        Jt = jnp.concatenate(rows_list, axis=0)[:n_par]
        if rv[1] is None:
            JTJ, JTr = gram(Jt, rv[0])
            JTr = np.asarray(JTr, np.float64)
        else:
            # Jᵀr and Jᵀdr accumulate separately on device (each at its own
            # scale) and combine in host float64, preserving the sub-ulp(r)
            # gradient contribution of the lo part
            JTJ, JTr_r, JTr_d = gram_split(Jt, rv[0], rv[1])
            JTr = np.asarray(JTr_r, np.float64) + np.asarray(JTr_d, np.float64)
        return rv, np.asarray(JTJ), JTr

    # ---- per-point Gram fast path -------------------------------------
    # Residual component i depends on collocation point i ONLY, so J's rows
    # are per-point parameter gradients: vmap-of-grad over the point axis
    # costs ~3 batch forwards TOTAL, vs the chunked forward-mode sweep's
    # ~P/chunk full-batch jvp passes (the 26 s/iter bottleneck of the
    # f64-on-TPU campaign — RESULTS_TPU.md).  Available when every training
    # loss exposes LossMeanSquares.point_residual (driver-built cases);
    # verified against the batch closures at theta0 before being trusted.
    #
    # Under the split carry the fast Gram composes exactly with the
    # linearized evaluation (round-4 finding: this path used to fall back
    # to the 5.4×-slower chunked Jacobian): with G = ∇r at the f32 hi
    # point, r(hi+lo) ≈ r(hi) + G·lo gives
    #     JᵀJ(hi+lo) ≈ GᵀG   and   Jᵀr(hi+lo) ≈ Gᵀr(hi) + (GᵀG)·lo,
    # so the lo correction to the gradient is JTJ @ lo, applied in host
    # float64 — the SAME first-order model the chunked-split path computes
    # (its gram_split Jᵀdr term equals JᵀJ·lo with dr = J·lo) and the same
    # linearization the accept test (res_lin) certifies steps with.  The
    # O(‖lo‖) error in J itself is far below LM's own Gauss–Newton
    # approximation error.
    point_entries = _collect_point_entries(pb, unravel, res_jit, theta0)
    # exposed for tests / the multichip dryrun: certifies the fast per-point
    # Gram path was actually used (vs the chunked-jvp fallback), including
    # under a device mesh where the Gram psums per shard via GSPMD
    pb.lm_used_fast_gram = point_entries is not None

    if point_entries is not None:
        def gram_fast_fn(theta):
            JTJ = jnp.zeros((n_par, n_par), theta.dtype)
            JTr = jnp.zeros((n_par,), theta.dtype)
            for fn, args, scale in point_entries:
                def res_one(th, *rows, _fn=fn, _s=scale):
                    return _fn(unravel(th), *rows) * _s

                in_axes = (None,) + (0,) * len(args)
                G = jax.vmap(jax.grad(res_one), in_axes=in_axes)(
                    theta, *args
                )  # (N_l, P): row i = ∇_θ of scaled residual component i
                r = jax.vmap(res_one, in_axes=in_axes)(theta, *args)
                JTJ = JTJ + G.T @ G
                JTr = JTr + G.T @ r
            return JTJ, JTr

        gram_fast = _hp(gram_fast_fn)

        def normal_eqs(theta64):
            rv = _eval_res(theta64)
            if split:
                hi, _ = _split64(theta64)
                JTJ, JTr_hi = gram_fast(hi)
                JTJ = np.asarray(JTJ)
                lo64 = theta64.astype(np.float64) - np.asarray(hi, np.float64)
                JTr = (np.asarray(JTr_hi, np.float64)
                       + JTJ.astype(np.float64) @ lo64)
                return rv, JTJ, JTr
            JTJ, JTr = gram_fast(
                jnp.asarray(theta64.astype(np.result_type(dtype)))
            )
            return rv, np.asarray(JTJ), np.asarray(JTr, np.float64)
    else:
        normal_eqs = _normal_eqs_chunked
    # test hook: lets tests pin the (pure) normal-equations map against a
    # dense-Jacobian reference without re-deriving the internal closures
    pb.lm_normal_eqs = normal_eqs

    # ---- on-device damping ladder (pure-f64 path) ---------------------
    # The host loop's per-iteration cost after the fast Gram is (a) a host
    # LAPACK P×P eigendecomposition and (b) one host→device round-trip per
    # damping candidate (each accept/reject re-evaluates the residuals).
    # For the pure-f64 route — the f64-on-TPU campaign path, where θ needs
    # no split carry — the whole search fuses into ONE launch: power
    # iteration for w_max (the relative-damping scale the host loop gets
    # from eigh), then a lax.while_loop that Cholesky-solves the damped
    # normal equations, evaluates the candidate residuals, runs the SAME
    # paired-difference accept test, and adapts μ — identical accept
    # semantics (μ/3 on accept, μ×10 on reject, 1e12 saturation floor),
    # different factorization (per-rung Cholesky instead of one eigh:
    # O(P³/3) on the MXU per candidate, and a non-PD trial at tiny λ
    # yields NaN → reject → climb, exactly like a failed step).
    # μ saturation checks mu_rej (the post-reject value) so a launch never
    # exits with done=False; host-side `not accepted` ⇒ converged, the
    # same invariant the host loop's while-exit provides.
    # TPINN_LM_SOLVER: auto (device on TPU, host elsewhere — host LAPACK
    # is already at its roofline on CPU) | device | host (bit-parity
    # reruns of committed campaign artifacts).
    solver_env = os.environ.get("TPINN_LM_SOLVER", "auto")
    use_ladder = (not split) and (
        solver_env == "device"
        or (solver_env == "auto" and jax.default_backend() == "tpu")
    )
    pb.lm_solver = "device_ladder" if use_ladder else "host_eigh"

    if point_entries is not None:
        def normal_eqs_dev(theta):
            JTJ, JTr = gram_fast(theta)
            return res_jit(theta), JTJ, JTr
    else:
        def normal_eqs_dev(theta):
            rows = [jac_chunk(theta, vs) for vs in basis_chunks]
            Jt = jnp.concatenate(rows, axis=0)[:n_par]
            r = res_jit(theta)
            JTJ, JTr = gram(Jt, r)
            return r, JTJ, JTr

    _tiny64 = float(np.finfo(np.float64).tiny)

    def _ladder_fn(theta, mu, JTJ, JTr, r_cur):
        n = JTJ.shape[0]
        nrm = jnp.linalg.norm(JTr)
        v0 = jnp.where(
            nrm > 0,
            JTr / (nrm + _tiny64),
            jnp.full((n,), 1.0 / np.sqrt(max(n, 1)), JTJ.dtype),
        )

        def _pi(v, _):
            v2 = JTJ @ v
            return v2 / (jnp.linalg.norm(v2) + _tiny64), None

        v, _ = jax.lax.scan(_pi, v0, None, length=24)
        w_max = v @ (JTJ @ v)
        eye_dev = jnp.eye(n, dtype=JTJ.dtype)

        def _cond(c):
            return jnp.logical_not(c["done"])

        def _body(c):
            lam = c["mu"] * w_max + _tiny64
            L = jnp.linalg.cholesky(JTJ + lam * eye_dev)
            delta = -jax.scipy.linalg.cho_solve((L, True), JTr)
            th = theta + delta
            r = residuals(th)
            df = jnp.dot(r - r_cur, r + r_cur)
            ok = jnp.all(jnp.isfinite(delta)) & jnp.isfinite(df) & (df < 0)
            mu_rej = c["mu"] * 10.0
            return {
                "mu": jnp.where(
                    ok, jnp.maximum(c["mu"] / 3.0, 1e-14), mu_rej
                ),
                "done": ok | (mu_rej > 1e12),
                "accepted": ok,
                "theta": jnp.where(ok, th, c["theta"]),
                "df": jnp.where(ok, df, jnp.zeros((), JTJ.dtype)),
            }

        init = {
            "mu": jnp.asarray(mu, JTJ.dtype),
            "done": ~jnp.isfinite(w_max) | (w_max <= 0),
            "accepted": jnp.array(False),
            "theta": theta,
            "df": jnp.zeros((), JTJ.dtype),
        }
        out = jax.lax.while_loop(_cond, _body, init)
        return out["theta"], out["mu"], out["df"], out["accepted"]

    ladder = _hp(_ladder_fn)

    pb.history.start_round("jax_LM")
    pb.last_round_name = "jax_LM"
    t0 = time.perf_counter()

    theta64 = np.asarray(theta0, np.float64)
    mu = 1e-3  # relative damping: λ = mu·max(w)
    # exact resume: adopt a checkpointed (theta64, mu) whose f32 rounding is
    # the params we just loaded — recovers the sub-ulp lo channel that the
    # materialized f32 weights cannot carry.  mu is clamped below the 1e12
    # convergence cap so a round saved AT the floor still re-probes once.
    # Adoption happens BEFORE the iteration-0 _log_point and seeds
    # pb.last_opt_state first: the iter-0 log fires CheckpointCallback, and
    # a checkpoint.pkl rewritten with opt_state=None there would permanently
    # lose the f64 carry if the round is killed before the next flush.
    st = _consume_resume_state(pb, "lm")
    if st is not None:
        try:
            saved = np.asarray(st["theta64"], np.float64)
            materialized = (saved.astype(np.float32) if split
                            else saved.astype(np.float64))
            if (saved.shape == theta64.shape
                    and np.array_equal(materialized,
                                       np.asarray(theta0,
                                                  materialized.dtype))):
                theta64 = saved
                mu = min(max(float(st["mu"]), 1e-14), 1e8)
        except (KeyError, TypeError, ValueError):
            pass  # malformed/hand-edited checkpoint: cold-start the carry
    pb.last_opt_state = {
        "kind": "lm", "theta64": theta64.copy(), "mu": float(mu),
    }
    _log_point(pb, eval_fn, unravel(theta0), 0)
    f_cur = float(loss_fn(theta0))
    log_targets = set(_log_iters(num_epochs, LOG_STRIDE)[1:])
    converged = False
    if use_ladder:
        theta_dev = jnp.asarray(theta64)  # f64 on device (x64 required)
        for it in range(1, num_epochs + 1):
            t_it = time.perf_counter()
            r_cur, JTJ, JTr = normal_eqs_dev(theta_dev)
            theta_new, mu_new, df, accepted = ladder(
                theta_dev, mu, JTJ, JTr, r_cur
            )
            accepted = bool(accepted)
            mu = float(mu_new)
            if accepted:
                theta_dev = theta_new
                f_cur = f_cur + float(df)
            else:
                converged = True  # ladder saturated (or invalid w_max)
            theta64 = np.asarray(theta_dev, np.float64)
            theta = theta_dev
            pb.last_opt_state = {
                "kind": "lm", "theta64": theta64.copy(), "mu": float(mu),
            }
            if verbose:
                print(f"  LM iter {it}: loss {f_cur:.3e}, mu {mu:.1e}, "
                      f"{time.perf_counter() - t_it:.1f}s", flush=True)
            if it in log_targets or converged or not accepted:
                _log_point(pb, eval_fn, unravel(theta), it)
            if converged:
                break
    else:
        for it in range(1, num_epochs + 1):
            t_it = time.perf_counter()
            r_cur, JTJ, JTr = normal_eqs(theta64)
            w, V = np.linalg.eigh(JTJ)  # host LAPACK
            w = np.maximum(w, 0.0)
            w_max = float(w[-1]) if w.size else 0.0
            if not np.isfinite(w_max) or w_max <= 0:
                converged = True
            accepted = False
            c = V.T @ JTr
            while not converged:
                lam = mu * w_max + np.finfo(np.float64).tiny
                delta64 = -(V @ (c / (w + lam)))  # host float64 throughout
                r_new = _eval_res(theta64 + delta64)
                df = _pair_diff_ev(r_new, r_cur)
                if np.isfinite(df) and df < 0:
                    theta64 = theta64 + delta64
                    f_cur = f_cur + df
                    mu = max(mu / 3.0, 1e-14)
                    accepted = True
                    break
                mu *= 10.0
                if mu > 1e12:  # no damping yields progress: at the floor
                    converged = True
            theta = jnp.asarray(theta64.astype(np.result_type(dtype)))
            pb.last_opt_state = {
                "kind": "lm", "theta64": theta64.copy(), "mu": float(mu),
            }
            if verbose:
                print(f"  LM iter {it}: loss {f_cur:.3e}, mu {mu:.1e}, "
                      f"{time.perf_counter() - t_it:.1f}s", flush=True)
            if it in log_targets or converged or not accepted:
                _log_point(pb, eval_fn, unravel(theta), it)
            if converged:
                break

    # materialize at the working dtype (for f32 the nearest-representable
    # rounding of the float64 carry; sub-ulp residue is lost by saving,
    # which is what any deployed f32 model would see anyway).  The raw f64
    # carry is exposed for diagnostics/tests: it records the sub-ulp
    # navigation that the materialized f32 weights cannot.
    pb.last_theta64 = theta64.copy()
    params = unravel(jnp.asarray(theta64.astype(np.result_type(dtype))))
    pb.variables.set(params)
    pb.history.add_wall_time(time.perf_counter() - t0)
    pb.fire_callbacks(pb.history.iters[-1], force=True)
    return params


# ---------------------------------------------------------------------------
# Public entry point
# ---------------------------------------------------------------------------


# Epoch threshold above which a second-order round auto-selects the packed
# bf16_3x per-dot lowering (TPINN_HP_DOT=high) for the fused kernels: the
# 3x lowering runs the one-pass hp train kernel at ~1.5x the packed-6x
# default's rate (BENCH_TPU hp_train_bf16_3x vs hp_train), but its ~2e-6-
# relative products perturb the loss trajectory, and its first-ever
# compile is expensive.  Calibrated from the on-chip 1000-epoch A/B
# (docs/hp_dot_accept_scan_r05*.txt): the in-round step saving is
# ~4.7 ms/epoch (BFGS round wall 34.7 s vs 39.4 s at 1000 epochs), while
# the one-time cold Mosaic compile of the 3x lowerings costs ~1000 s
# (absorbed into the persistent compilation cache afterwards — tpinn/
# __init__.py).  At 20k epochs the per-round saving is ~95 s: material
# against both the trajectory perturbation and the amortized compile, and
# safely above every committed campaign recipe's f32 second-order rounds
# (5000 epochs), which therefore keep the f32-exact default bit-stable.
_HP_DOT_AUTO_MIN_EPOCHS = 20000


def hp_dot_auto_policy(num_epochs: int) -> Optional[str]:
    """The TPINN_HP_DOT value a second-order round should run under when
    the user hasn't pinned one: 'high' (packed bf16_3x) once the round is
    long enough to amortize its trajectory perturbation into real wall-time
    savings, else None (keep the f32-exact packed-6x default).  Pure
    function — unit-tested directly; applied by :func:`_hp_dot_round`."""
    if num_epochs >= _HP_DOT_AUTO_MIN_EPOCHS:
        return "high"
    return None


@contextlib.contextmanager
def _hp_dot_round(num_epochs: int):
    """Apply the auto hp-dot policy for one second-order round.

    Respects an explicit TPINN_HP_DOT (user pin, e.g. 'mosaic' for
    bit-parity reruns of committed campaign artifacts) and only acts on the
    TPU backend — the policy swaps fused-kernel MXU lowerings, which other
    backends don't trace.  The env var is read at TRACE time and every
    round builds fresh jitted closures, so scoping the var to the round is
    race-free within a process."""
    choice = hp_dot_auto_policy(num_epochs)
    if (choice is None or os.environ.get("TPINN_HP_DOT") is not None
            or jax.default_backend() != "tpu"):
        yield
        return
    os.environ["TPINN_HP_DOT"] = choice
    try:
        yield
    finally:
        os.environ.pop("TPINN_HP_DOT", None)


def minimize(
    pb: OptimizationProblem,
    strategy: str,
    optimizer: Union[str, object, None] = None,
    num_epochs: int = 100,
    **kwargs,
):
    """Run one optimization round; appends to pb.history and updates params.

    strategy: 'keras' (alias 'adam') | 'scipy' | 'jax' (alias 'lbfgs').

    Second-order rounds trace their jitted steps under full-f32 matmul
    accumulation: TPU's default bf16 matmul passes inject ~1e-3 relative
    noise into the PDE residuals (cancellation amplifies the rounding) —
    measured to reject every LM step and to corrupt quasi-Newton curvature
    pairs / line-search certifications at f32.  The context is a no-op on
    CPU and for f64.  First-order rounds never compare loss values and
    tolerate gradient jitter by construction, so they keep the fast
    single-pass bf16 matmuls (the history/test evaluations they log still
    run at full accumulation via the problem's jitted eval).
    """
    strategy = strategy.lower()
    if strategy in ("keras", "adam"):
        name = getattr(optimizer, "name", None) or "Adam"
        return _minimize_first_order(
            pb, optimizer, num_epochs, round_name=f"keras_{name}"
        )
    with jax.default_matmul_precision("highest"), _hp_dot_round(num_epochs):
        if strategy == "scipy":
            method = optimizer if isinstance(optimizer, str) else "BFGS"
            return _minimize_scipy(pb, method, num_epochs)
        if strategy in ("jax", "lbfgs"):
            method = optimizer if isinstance(optimizer, str) else "L-BFGS"
            key = method.upper().replace("-", "").replace("_", "")
            if key == "BFGS":
                return _minimize_jax_bfgs(pb, num_epochs)
            if key in ("LM", "GN", "LEVENBERGMARQUARDT", "GAUSSNEWTON"):
                return _minimize_jax_lm(pb, num_epochs, **kwargs)
            return _minimize_jax_lbfgs(pb, num_epochs, **kwargs)
    raise ValueError(f"unknown strategy {strategy!r}")
