"""Domains, grids, boundary samplers and point-set splits (PRNG-keyed).

Rebuilds the shared sampling stages of every reference driver
(SURVEY.md §2.2 stage 3):

* uniform tensor-product grids flattened row-major with x fastest —
  ``[(i, j) for j in y_vec for i in x_vec]``
  (reference poiseuille_flow.py:95-103);
* random permutation split into disjoint {PDE, Vel, Pres, Test} index sets
  via cumsum (poiseuille_flow.py:106-109);
* per-edge uniform boundary sampling (poiseuille_flow.py:136-142);
* space-time grids ``[(t, x, y)]`` with t slowest
  (cavity_unsteady.py:94-95) and time-extruded boundary sampling;
* gaussian noise injection ``factor * N(0, 1)`` (poiseuille_flow.py:153-155).

Everything takes explicit jax PRNG keys: runs are reproducible and the same
code paths work under jit/pjit.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpinn import config


def linspace_or_random(key, lo, hi, n, uniform: bool = True):
    dtype = config.get_dtype()
    if uniform:
        return jnp.linspace(lo, hi, n, dtype=dtype)
    return jax.random.uniform(key, (n,), minval=lo, maxval=hi, dtype=dtype)


def tensor_grid(x_vec, y_vec) -> jnp.ndarray:
    """Row-major (x fastest) 2-D tensor-product grid: (len(x)*len(y), 2)."""
    xx, yy = jnp.meshgrid(jnp.asarray(x_vec), jnp.asarray(y_vec))
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)


def space_time_grid(t_vec, x_vec, y_vec) -> jnp.ndarray:
    """(t, x, y) grid with t slowest, then y, then x (reference ordering)."""
    tt, yy, xx = jnp.meshgrid(
        jnp.asarray(t_vec), jnp.asarray(y_vec), jnp.asarray(x_vec), indexing="ij"
    )
    return jnp.stack([tt.reshape(-1), xx.reshape(-1), yy.reshape(-1)], axis=-1)


def rect_grid(
    extents: Sequence[Tuple[float, float]],
    shape: Sequence[int],
    uniform: bool = True,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """2-D rectangle grid with (n1+1)x(n2+1) nodes like the reference drivers."""
    (lx, ux), (ly, uy) = extents
    n1, n2 = shape
    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x_vec = linspace_or_random(k1, lx, ux, n1 + 1, uniform)
    y_vec = linspace_or_random(k2, ly, uy, n2 + 1, uniform)
    return tensor_grid(x_vec, y_vec)


def split_indices(
    key, n_total: int, counts: Dict[str, int], order: Sequence[str] = ("PDE", "Vel", "Pres", "Test")
) -> Dict[str, np.ndarray]:
    """Disjoint random index subsets, reference-style.

    Matches ``np.split(np.random.permutation(n), np.cumsum(counts))[:-1]``
    (poiseuille_flow.py:106-109).  Returned as host numpy arrays — they index
    static data at trace time.
    """
    perm = np.asarray(jax.random.permutation(key, n_total))
    sizes = [counts[k] for k in order]
    splits = np.split(perm, np.cumsum(sizes))[:-1]
    return {k: v for k, v in zip(order, splits)}


def sample_box(key, n: int, minval, maxval, dtype=None) -> jnp.ndarray:
    """Uniform sampling in an axis-aligned box; degenerate axes give edges.

    Mirrors the reference's per-edge ``tf.random.uniform`` boundary sampler
    (poiseuille_flow.py:136-142).
    """
    dtype = dtype or config.get_dtype()
    minval = jnp.asarray(minval, dtype=dtype)
    maxval = jnp.asarray(maxval, dtype=dtype)
    u = jax.random.uniform(key, (n, minval.shape[-1]), dtype=dtype)
    return minval + u * (maxval - minval)


def rect_boundary_points(
    key,
    extents: Sequence[Tuple[float, float]],
    n_per_edge: int,
    time_horizon: Optional[float] = None,
) -> Dict[str, jnp.ndarray]:
    """The four reference edges {BOT, DX, TOP, SX} of a rectangle.

    With ``time_horizon`` set, points get a leading uniformly-sampled t
    coordinate (cavity_unsteady.py:129-137).
    """
    (lx, ux), (ly, uy) = extents
    edges = {
        "BOT": ([lx, ly], [ux, ly]),
        "DX": ([ux, ly], [ux, uy]),
        "TOP": ([lx, uy], [ux, uy]),
        "SX": ([lx, ly], [lx, uy]),
    }
    keys = jax.random.split(key, len(edges))
    out = {}
    for k, (name, (mn, mx)) in zip(keys, edges.items()):
        if time_horizon is not None:
            mn = [0.0] + list(mn)
            mx = [time_horizon] + list(mx)
        out[name] = sample_box(k, n_per_edge, mn, mx)
    return out


def initial_condition_points(
    key, extents: Sequence[Tuple[float, float]], n: int
) -> jnp.ndarray:
    """t = 0 slice samples for the unsteady case (cavity_unsteady.py:131)."""
    (lx, ux), (ly, uy) = extents
    return sample_box(key, n, [0.0, lx, ly], [0.0, ux, uy])


def generate_noise(key, n: int, factor: float = 0.0, sd: float = 1.0, mean: float = 0.0):
    """factor * N(mean, sd) — reference generate_noise (poiseuille_flow.py:153-155)."""
    dtype = config.get_dtype()
    return (mean + sd * jax.random.normal(key, (n,), dtype=dtype)) * factor


def spread(vec) -> float:
    """max - min; the reference's normalization constant (poiseuille_flow.py:125)."""
    v = np.asarray(vec)
    return float(np.max(v) - np.min(v))


class Normalization:
    """Velocity/pressure spread-normalization bundle (SURVEY.md §2.2 stage 5).

    norm_vel = max(spread(u), spread(v)); norm_pre = spread(p); the momentum
    residual is renormalized by 1/max(norm_pre, norm_vel)
    (poiseuille_flow.py:125-132, 195-197).  This pre-normalization is what
    makes float32 TPU training match the float64 reference accuracy.
    """

    def __init__(self, u_ex, v_ex, p_ex):
        self.norm_vel = max(spread(u_ex), spread(v_ex)) or 1.0
        self.norm_pre = spread(p_ex) or 1.0

    @property
    def residual_scale(self) -> float:
        return 1.0 / max(self.norm_pre, self.norm_vel)
