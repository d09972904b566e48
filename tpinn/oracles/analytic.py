"""Closed-form exact solutions for the analytic test cases.

Sources in the reference drivers:
* Poisson: u = sin(x)sin(y), f = 2 sin(x)sin(y)
  (Examples/Poisson_Problem/poisson.py:26-27); mixed-BC variant adds the
  Neumann data u_x = sin(y) on the x-edges (poisson_misto.py:75-80).
* Poiseuille: plane channel with pressure drop, lava parameters
  (poiseuille_flow.py:74-80,113-115).
* Colliding flow: polynomial Stokes solution
  (colliding_flow.py:71-73).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

# -- Poisson -----------------------------------------------------------------


def poisson_exact(x):
    return jnp.sin(x[:, 0]) * jnp.sin(x[:, 1])


def poisson_forcing(x):
    return 2.0 * jnp.sin(x[:, 0]) * jnp.sin(x[:, 1])


def poisson_neumann_x(x):
    """∂u/∂x = cos(x)sin(y); on edge x=0 or x=2π this equals sin(y)."""
    return jnp.cos(x[:, 0]) * jnp.sin(x[:, 1])


# -- Poiseuille (lava channel, reference parameters) -------------------------


@dataclasses.dataclass(frozen=True)
class PoiseuilleParams:
    rho: float = 3100.0  # lava density
    mu: float = 890.0  # lava viscosity
    L: float = 1.0  # channel length
    half_height: float = 0.05  # delta = (Ue_y - Le_y)/2 with Ue_y = 0.1
    p_in: float = 1e6
    p_out: float = 0.0

    @property
    def p_x(self) -> float:
        return self.p_out - self.p_in


def poiseuille_u(x, prm: PoiseuilleParams = PoiseuilleParams()):
    """u(y) = -P_x * y (2 - y/delta) * delta / (2 mu)  (reference :114)."""
    return (
        -prm.p_x
        * x[:, 1]
        * (2.0 - x[:, 1] / prm.half_height)
        * prm.half_height
        / (2.0 * prm.mu)
    )


def poiseuille_v(x, prm: PoiseuilleParams = PoiseuilleParams()):
    return 0.0 * x[:, 0]


def poiseuille_p(x, prm: PoiseuilleParams = PoiseuilleParams()):
    return (prm.p_out - prm.p_in) / prm.L * x[:, 0] + prm.p_in


# -- Colliding flow (polynomial Stokes solution) ------------------------------


def colliding_u(x):
    return 20.0 * x[:, 0] * x[:, 1] ** 3


def colliding_v(x):
    return 5.0 * x[:, 0] ** 4 - 5.0 * x[:, 1] ** 4


def colliding_p(x):
    return 60.0 * x[:, 0] ** 2 * x[:, 1] - 20.0 * x[:, 1] ** 3
