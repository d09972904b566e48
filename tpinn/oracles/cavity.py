"""JAX-native finite-difference Navier–Stokes solver for the lid-driven cavity.

Replaces the reference's offline FEniCS stage (DataGeneration/
fluid_solver_steady.py: Taylor–Hood Newton NS at U=500, ν=1 on a 100×100
RectangleMesh; fluid_solver_unsteady.py: semi-implicit time loop, U=1,
T=1e-2, dt=1e-4).  The reference's FEM outputs are gitignored-absent, so this
solver regenerates the "exact" cavity data the drivers ingest
(cavity_steady.py:100-109, cavity_unsteady.py:104-113).

Method: Chorin projection on a staggered MAC grid.
* advective form, hybrid central/upwind convection (central where the cell
  Péclet number allows, upwind-blended otherwise);
* explicit diffusion;
* pressure Poisson solved with matrix-free conjugate gradients
  (homogeneous Neumann, nullspace pinned by mean subtraction).

Everything is jit-compiled; the time loop is a ``lax.scan``/``fori_loop`` so
the whole solve is a single XLA computation (runs on CPU for tests, TPU for
data generation).  Steady solutions march pseudo-time to convergence in
nondimensional units (Re = U·L/ν) and are rescaled to the reference's
dimensional fields (u_phys = U·u*, p_phys = ρU²·p* with ρ=1).

Validated against the Ghia, Ghia & Shin (1982) centerline benchmark tables
(tests/test_cavity_oracle.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class MACState(NamedTuple):
    u: jnp.ndarray  # (N+1, N)   x-velocity on vertical faces
    v: jnp.ndarray  # (N, N+1)   y-velocity on horizontal faces
    p: jnp.ndarray  # (N, N)     pressure at cell centers
    phi: jnp.ndarray  # (N, N)   previous projection potential (CG warm start)


def _laplacian_u(u, lid, h):
    """5-point Laplacian of u with no-slip walls; ghost rows implement the
    tangential BC (bottom u=0, top u=lid)."""
    # interior in x: u[1:-1, :]; walls at i=0, i=N are Dirichlet (u=0).
    u_pad_y = jnp.concatenate(
        [
            (2.0 * 0.0 - u[:, :1]),  # ghost below bottom wall (u_wall = 0)
            u,
            (2.0 * lid - u[:, -1:]),  # ghost above lid (u_wall = lid)
        ],
        axis=1,
    )
    d2y = (u_pad_y[:, 2:] - 2.0 * u_pad_y[:, 1:-1] + u_pad_y[:, :-2]) / h**2
    u_pad_x = jnp.pad(u, ((1, 1), (0, 0)))  # values beyond walls unused
    d2x = (u_pad_x[2:] - 2.0 * u_pad_x[1:-1] + u_pad_x[:-2]) / h**2
    return d2x + d2y


def _laplacian_v(v, h):
    v_pad_x = jnp.concatenate(
        [(-v[:1, :]), v, (-v[-1:, :])], axis=0
    )  # side walls: v_wall = 0 ghost
    d2x = (v_pad_x[2:] - 2.0 * v_pad_x[1:-1] + v_pad_x[:-2]) / h**2
    v_pad_y = jnp.pad(v, ((0, 0), (1, 1)))
    d2y = (v_pad_y[:, 2:] - 2.0 * v_pad_y[:, 1:-1] + v_pad_y[:, :-2]) / h**2
    return d2x + d2y


def _upwind2_pair(c, m1, m2, p1, p2, h, valid_m2, valid_p2):
    """Second-order one-sided (SOU) derivative pair with a first-order
    fallback where the wide stencil leaves the domain.

    Returns (backward, forward) derivatives at the points of ``c``.
    With SOU the hybrid central/upwind blend stays second-order accurate
    overall — the first-order-upwind smearing that dominated the oracle
    error budget (grid-refinement study, round 2) is gone.
    """
    b2 = (3.0 * c - 4.0 * m1 + m2) / (2.0 * h)
    b1 = (c - m1) / h
    f2 = (-3.0 * c + 4.0 * p1 - p2) / (2.0 * h)
    f1 = (p1 - c) / h
    return jnp.where(valid_m2, b2, b1), jnp.where(valid_p2, f2, f1)


def _advect_u(u, v, lid, h, upwind: float):
    """(U·∇)u at interior u-faces, hybrid central / 2nd-order upwind."""
    N1 = u.shape[0]  # N+1 faces in x
    N = u.shape[1]
    # u with tangential ghosts (reflected wall / lid values)
    u_g = jnp.concatenate(
        [(0.0 - u[:, :1]), u, (2.0 * lid - u[:, -1:])], axis=1
    )  # (N+1, N+2)
    # du/dx at interior faces i=1..N-1
    dudx_c = (u[2:, :] - u[:-2, :]) / (2 * h)
    ii = jnp.arange(1, N1 - 1)[:, None]
    dudx_m, dudx_p = _upwind2_pair(
        u[1:-1, :], u[:-2, :],
        jnp.concatenate([u[:1, :], u[:-3, :]], axis=0),
        u[2:, :],
        jnp.concatenate([u[3:, :], u[-1:, :]], axis=0),
        h, ii >= 2, ii <= N1 - 3,
    )
    # du/dy on all rows (ghost-padded), sliced to interior rows afterwards
    dudy_c_full = (u_g[:, 2:] - u_g[:, :-2]) / (2 * h)
    jj = jnp.arange(N)[None, :]
    dudy_m_full, dudy_p_full = _upwind2_pair(
        u, u_g[:, :-2],
        jnp.concatenate([u_g[:, :1], u_g[:, : N - 1]], axis=1),
        u_g[:, 2:],
        jnp.concatenate([u_g[:, 3:], u_g[:, -1:]], axis=1),
        h, jj >= 1, jj <= N - 2,
    )
    dudy_c = dudy_c_full[1:-1, :]
    dudy_m = dudy_m_full[1:-1, :]
    dudy_p = dudy_p_full[1:-1, :]

    uc = u[1:-1, :]
    # v interpolated to interior u-locations
    v_at_u = 0.25 * (
        v[:-1, :-1] + v[1:, :-1] + v[:-1, 1:] + v[1:, 1:]
    )  # (N-1, N)

    dudx_up = jnp.where(uc > 0, dudx_m, dudx_p)
    dudy_up = jnp.where(v_at_u > 0, dudy_m, dudy_p)
    dudx = (1 - upwind) * dudx_c + upwind * dudx_up
    dudy = (1 - upwind) * dudy_c + upwind * dudy_up
    return uc * dudx + v_at_u * dudy


def _advect_v(u, v, h, upwind: float):
    N = v.shape[0]
    N1 = v.shape[1]  # N+1 faces in y
    v_g = jnp.concatenate([(-v[:1, :]), v, (-v[-1:, :])], axis=0)  # (N+2, N+1)
    # dv/dy at interior faces j=1..N-1
    dvdy_c = (v[:, 2:] - v[:, :-2]) / (2 * h)
    jj = jnp.arange(1, N1 - 1)[None, :]
    dvdy_m, dvdy_p = _upwind2_pair(
        v[:, 1:-1], v[:, :-2],
        jnp.concatenate([v[:, :1], v[:, :-3]], axis=1),
        v[:, 2:],
        jnp.concatenate([v[:, 3:], v[:, -1:]], axis=1),
        h, jj >= 2, jj <= N1 - 3,
    )
    # dv/dx on all columns (ghost-padded), sliced to interior cols afterwards
    dvdx_c_full = (v_g[2:, :] - v_g[:-2, :]) / (2 * h)
    ii = jnp.arange(N)[:, None]
    dvdx_m_full, dvdx_p_full = _upwind2_pair(
        v, v_g[:-2, :],
        jnp.concatenate([v_g[:1, :], v_g[: N - 1, :]], axis=0),
        v_g[2:, :],
        jnp.concatenate([v_g[3:, :], v_g[-1:, :]], axis=0),
        h, ii >= 1, ii <= N - 2,
    )
    dvdx_c = dvdx_c_full[:, 1:-1]
    dvdx_m = dvdx_m_full[:, 1:-1]
    dvdx_p = dvdx_p_full[:, 1:-1]

    vc = v[:, 1:-1]
    u_at_v = 0.25 * (
        u[:-1, :-1] + u[1:, :-1] + u[:-1, 1:] + u[1:, 1:]
    )  # (N, N-1)

    dvdx_up = jnp.where(u_at_v > 0, dvdx_m, dvdx_p)
    dvdy_up = jnp.where(vc > 0, dvdy_m, dvdy_p)
    dvdx = (1 - upwind) * dvdx_c + upwind * dvdx_up
    dvdy = (1 - upwind) * dvdy_c + upwind * dvdy_up
    return u_at_v * dvdx + vc * dvdy


def _divergence(u, v, h):
    return (u[1:, :] - u[:-1, :]) / h + (v[:, 1:] - v[:, :-1]) / h


def _poisson_neumann_op(phi, h):
    """Cell-centered Laplacian with homogeneous Neumann walls."""
    phi_x = jnp.pad(phi, ((1, 1), (0, 0)), mode="edge")
    phi_y = jnp.pad(phi, ((0, 0), (1, 1)), mode="edge")
    return (
        (phi_x[2:] - 2 * phi_x[1:-1] + phi_x[:-2])
        + (phi_y[:, 2:] - 2 * phi_y[:, 1:-1] + phi_y[:, :-2])
    ) / h**2


def _solve_pressure(rhs, h, x0=None, tol=1e-8, maxiter=600):
    rhs = rhs - jnp.mean(rhs)  # compatibility with the Neumann nullspace
    op = lambda q: _poisson_neumann_op(q, h)
    phi, _ = jax.scipy.sparse.linalg.cg(
        op, rhs, x0=x0, tol=tol, maxiter=maxiter
    )
    return phi - jnp.mean(phi)


def _project(u, v, phi, h, dt):
    dphidx = (phi[1:, :] - phi[:-1, :]) / h
    dphidy = (phi[:, 1:] - phi[:, :-1]) / h
    u = u.at[1:-1, :].add(-dt * dphidx)
    v = v.at[:, 1:-1].add(-dt * dphidy)
    return u, v


def _step(state: MACState, *, re, lid, h, dt, upwind) -> MACState:
    u, v, p, phi_prev = state
    adv_u = _advect_u(u, v, lid, h, upwind)
    adv_v = _advect_v(u, v, h, upwind)
    lap_u = _laplacian_u(u, lid, h)[1:-1, :]
    lap_v = _laplacian_v(v, h)[:, 1:-1]
    u_star = u.at[1:-1, :].add(dt * (-adv_u + lap_u / re))
    v_star = v.at[:, 1:-1].add(dt * (-adv_v + lap_v / re))
    # enforce normal BCs
    u_star = u_star.at[0, :].set(0.0).at[-1, :].set(0.0)
    v_star = v_star.at[:, 0].set(0.0).at[:, -1].set(0.0)
    rhs = _divergence(u_star, v_star, h) / dt
    phi = _solve_pressure(rhs, h, x0=phi_prev)
    u_new, v_new = _project(u_star, v_star, phi, h, dt)
    # Non-incremental Chorin: u_star carries NO pressure-gradient term, so
    # phi is the full pressure at the new time level — not an increment.
    # (Accumulating p + phi here made state.p grow linearly with step count.)
    p_new = phi
    return MACState(u_new, v_new, p_new, phi)


def _vertex_fields(state: MACState, lid, h) -> Tuple[jnp.ndarray, ...]:
    """Interpolate MAC fields to the (N+1)x(N+1) vertex grid (x fastest,
    matching the reference's dom_grid/VisualisationVector ordering)."""
    u, v, p = state.u, state.v, state.p
    N = p.shape[0]
    # u at vertices: average vertically-adjacent u-face values; walls override
    u_vert_inner = 0.5 * (u[:, 1:] + u[:, :-1])  # (N+1, N-1)
    u_bottom = jnp.zeros((N + 1, 1))
    u_top = jnp.full((N + 1, 1), lid)
    u_vert = jnp.concatenate([u_bottom, u_vert_inner, u_top], axis=1)
    u_vert = u_vert.at[0, :].set(0.0).at[-1, :].set(0.0)
    u_vert = u_vert.at[0, -1].set(0.0).at[-1, -1].set(0.0)

    v_vert_inner = 0.5 * (v[1:, :] + v[:-1, :])  # (N-1, N+1)
    v_left = jnp.zeros((1, N + 1))
    v_right = jnp.zeros((1, N + 1))
    v_vert = jnp.concatenate([v_left, v_vert_inner, v_right], axis=0)
    v_vert = v_vert.at[:, 0].set(0.0).at[:, -1].set(0.0)

    # p at vertices: average the 4 surrounding cells (edges: 2, corners: 1)
    p_pad = jnp.pad(p, ((1, 1), (1, 1)), mode="edge")
    p_vert = 0.25 * (
        p_pad[:-1, :-1] + p_pad[1:, :-1] + p_pad[:-1, 1:] + p_pad[1:, 1:]
    )
    # flatten in x-fastest order: value[j*(N+1)+i] = field(x_i, y_j)
    u_flat = u_vert.T.reshape(-1)
    v_flat = v_vert.T.reshape(-1)
    p_flat = p_vert.T.reshape(-1)
    return u_flat, v_flat, p_flat


@functools.partial(jax.jit, static_argnames=("n", "steps", "inner"))
def _march(state, re, lid, h, dt, upwind, n, steps, inner):
    def outer(s, _):
        def body(i, s):
            return _step(s, re=re, lid=lid, h=h, dt=dt, upwind=upwind)

        s2 = jax.lax.fori_loop(0, inner, body, s)
        delta = jnp.max(jnp.abs(s2.u - s.u))
        return s2, delta

    state, deltas = jax.lax.scan(outer, state, None, length=steps)
    return state, deltas


def solve_cavity_steady(
    re: float = 500.0,
    n: int = 128,
    lid_velocity: float = 1.0,
    dt: float = None,
    t_end: float = 40.0,
    upwind: float = None,
    tol: float = 1e-6,
    dtype=jnp.float64,
):
    """Steady lid-driven cavity at Reynolds number ``re``.

    Returns (u, v, p) flattened on the (n+1)² vertex grid, x fastest,
    in *lid-velocity* units (multiply by U for the reference's dimensional
    fields; reference steady case: U=500, ν=1 → Re=500,
    DataGeneration/fluid_solver_steady.py:9-10).
    """
    h = 1.0 / n
    if dt is None:
        dt = 0.4 * min(h, 0.25 * h * h * re)
    if upwind is None:
        cell_pe = re * h
        upwind = float(np.clip((cell_pe - 1.5) / cell_pe, 0.0, 0.35)) if cell_pe > 1.5 else 0.0
    state = MACState(
        jnp.zeros((n + 1, n), dtype=dtype),
        jnp.zeros((n, n + 1), dtype=dtype),
        jnp.zeros((n, n), dtype=dtype),
        jnp.zeros((n, n), dtype=dtype),
    )
    inner = 50
    steps = int(t_end / dt / inner) + 1
    state, deltas = _march(
        state, re, 1.0, h, dt, upwind, n, steps, inner
    )
    u, v, p = _vertex_fields(state, 1.0, h)
    scale = lid_velocity
    return (
        np.asarray(u) * scale,
        np.asarray(v) * scale,
        np.asarray(p) * scale * scale,
    )


def solve_cavity_unsteady(
    nu: float = 1.0,
    lid_velocity: float = 1.0,
    t_end: float = 1e-2,
    dt_out: float = 1e-4,
    n: int = 100,
    substeps: int = None,
    dtype=jnp.float64,
):
    """Time-accurate impulsively-started cavity (reference unsteady case:
    U=1, ν=1, T=1e-2, dt=1e-4 — DataGeneration/fluid_solver_unsteady.py:5-14).

    Returns (times, snapshots) where snapshots is a list of (u, v, p) vertex
    fields, one per output step t = 0, dt_out, ..., T − dt_out (the reference
    writes n_times = T/dt files starting at t=0 with the zero initial field,
    cavity_unsteady.py:104-113).  Solves the nondimensional equations with a
    unit lid (Re = U·L/ν); with the reference's U=1, L=1 the nondimensional
    time equals physical time, which is the case this oracle serves.
    """
    h = 1.0 / n
    # explicit diffusion stability: dt < h²/(4ν) in nondim units (1/Re = ν/U)
    re_eff = lid_velocity / nu
    dt_stable = 0.2 * h * h * re_eff
    if substeps is None:
        substeps = max(1, int(np.ceil(dt_out / dt_stable)))
    dt = dt_out / substeps

    state = MACState(
        jnp.zeros((n + 1, n), dtype=dtype),
        jnp.zeros((n, n + 1), dtype=dtype),
        jnp.zeros((n, n), dtype=dtype),
        jnp.zeros((n, n), dtype=dtype),
    )
    n_out = int(round(t_end / dt_out))

    @functools.partial(jax.jit, static_argnames=("nsub",))
    def advance(s, nsub):
        def body(i, s):
            return _step(s, re=re_eff, lid=1.0, h=h, dt=dt, upwind=0.0)

        return jax.lax.fori_loop(0, nsub, body, s)

    times = []
    snaps = []
    for it in range(n_out):
        t = it * dt_out
        times.append(t)
        # t = 0 snapshot is the untouched zero field (lid not yet moving in
        # the saved data, matching the reference's save_output(w, 0, 0)).
        lid_now = 0.0 if it == 0 else 1.0
        u, v, p = _vertex_fields(state, lid_now, h)
        snaps.append(
            (
                np.asarray(u) * lid_velocity,
                np.asarray(v) * lid_velocity,
                np.asarray(p) * lid_velocity * lid_velocity,
            )
        )
        state = advance(state, substeps)
    return np.asarray(times), snaps


def vertex_grid(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """The (n+1)² vertex coordinates, x fastest (reference dom_grid order)."""
    xs = np.linspace(0.0, 1.0, n + 1)
    ys = np.linspace(0.0, 1.0, n + 1)
    xx, yy = np.meshgrid(xs, ys)
    return xx.reshape(-1), yy.reshape(-1)


def interpolate_vertex_field(field_flat, n: int, xq, yq):
    """Bilinear interpolation of a vertex field to query points in [0,1]²."""
    f = np.asarray(field_flat).reshape(n + 1, n + 1)  # [j, i] = (y_j, x_i)
    x = np.clip(np.asarray(xq), 0.0, 1.0) * n
    y = np.clip(np.asarray(yq), 0.0, 1.0) * n
    i0 = np.clip(x.astype(int), 0, n - 1)
    j0 = np.clip(y.astype(int), 0, n - 1)
    fx = x - i0
    fy = y - j0
    return (
        f[j0, i0] * (1 - fx) * (1 - fy)
        + f[j0, i0 + 1] * fx * (1 - fy)
        + f[j0 + 1, i0] * (1 - fx) * fy
        + f[j0 + 1, i0 + 1] * fx * fy
    )
