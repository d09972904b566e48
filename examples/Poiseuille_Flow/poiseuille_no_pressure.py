"""Velocity-only Poiseuille variant — pressure eliminated via known forcing
(reference: Examples_Old/Poiseuille/poiseuille_no_pressure.py).

The model outputs only (u, v); the momentum residual uses the prescribed
pressure gradient P_x/L as a forcing term instead of a learned pressure.
Demonstrates non-(u,v,p) output heads and the old API's ``create_rhs``
pattern (Examples_Old/Poiseuille/poiseuille.py:86-95).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (reference import sandwich)

import argparse
import os

import jax
import jax.numpy as jnp

import tpinn as ns
from tpinn.experimental.physics import tens_style as operator
from tpinn.geometry import sample_box
from tpinn.oracles import analytic

PRM = analytic.PoiseuilleParams()


def create_rhs(x, force=None, noise=None):
    """Generic RHS builder (reference Examples_Old create_rhs)."""
    n = x.shape[0]
    dtype = ns.config.get_dtype()
    base = jnp.zeros((n,), dtype=dtype)
    if force is not None:
        base = base + (force(x) if callable(force) else float(force))
    if noise is not None:
        base = base + noise
    return base


def main(epochs: int = 3000, out_dir: str = None, second_round: str = "jax"):
    cwd = out_dir or os.path.dirname(os.path.abspath(__file__))
    dim = 2
    extents = [(0.0, 1.0), (0.0, 0.1)]
    num_PDE, num_BC, num_test = 800, 50, 1000

    ks = jax.random.split(jax.random.PRNGKey(2), 10)
    model = ns.models.MLP(2, 2, width=32, depth=3, seed=2,
                          input_extents=[(0.0, 1.0), (0.0, 0.1)])

    (lx, ux), (ly, uy) = extents
    x_PDE = sample_box(ks[0], num_PDE, [lx, ly], [ux, uy])
    walls = jnp.concatenate(
        [
            sample_box(ks[1], num_BC, [lx, ly], [ux, ly]),  # bottom
            sample_box(ks[2], num_BC, [lx, uy], [ux, uy]),  # top
        ],
        axis=0,
    )
    inflow = sample_box(ks[3], num_BC, [lx, ly], [lx, uy])
    x_test = sample_box(ks[4], num_test, [lx, ly], [ux, uy])

    norm_vel = float(jnp.max(analytic.poiseuille_u(x_test, PRM)))
    u_in = analytic.poiseuille_u(inflow, PRM) / norm_vel
    u_test = analytic.poiseuille_u(x_test, PRM) / norm_vel
    v_test = analytic.poiseuille_v(x_test, PRM) / norm_vel

    # prescribed pressure gradient: dp/dx = (P_end - P_str)/L, dp/dy = 0
    dpdx = PRM.p_x / PRM.L

    def PDE_MOM(k):
        with ns.GradientTape(persistent=True) as tape:
            tape.watch(x_PDE)
            u_vect = model(x_PDE)
            u_eq = u_vect[:, k] * norm_vel
            grad_eq = operator.gradient_scalar(tape, u_eq, x_PDE)
            lapl_eq = operator.laplacian_scalar(tape, u_eq, x_PDE, dim)
            conv = norm_vel * (
                u_vect[:, 0] * grad_eq[:, 0] + u_vect[:, 1] * grad_eq[:, 1]
            )
            forcing = dpdx if k == 0 else 0.0
            r = PRM.rho * conv - PRM.mu * lapl_eq + forcing
        return r / abs(dpdx)

    def PDE_MASS():
        with ns.GradientTape(persistent=True) as tape:
            tape.watch(x_PDE)
            uv = model(x_PDE)[:, 0:2]
            div = operator.divergence_vector(tape, uv, x_PDE, dim)
        return div

    LMS = ns.LossMeanSquares
    losses = [
        LMS("PDE_MASS", PDE_MASS, weight=1e1),
        LMS("PDE_MOMU", lambda: PDE_MOM(0)),
        LMS("PDE_MOMV", lambda: PDE_MOM(1)),
        LMS("BCD_walls_u", lambda: model(walls)[:, 0] - create_rhs(walls)),
        LMS("BCD_walls_v", lambda: model(walls)[:, 1] - create_rhs(walls)),
        LMS("BCD_in_u", lambda: model(inflow)[:, 0] - u_in),
        LMS("BCD_in_v", lambda: model(inflow)[:, 1] - create_rhs(inflow)),
    ]
    loss_test = [
        LMS("u_test", lambda: model(x_test)[:, 0] - u_test),
        LMS("v_test", lambda: model(x_test)[:, 1] - v_test),
    ]

    pb = ns.OptimizationProblem(model.variables, losses, loss_test)
    ns.minimize(pb, "keras", ns.optimizers.Adam(1e-2), num_epochs=100)
    if second_round == "scipy":
        ns.minimize(pb, "scipy", "BFGS", num_epochs=epochs)
    else:
        ns.minimize(pb, "jax", "L-BFGS", num_epochs=epochs)

    os.makedirs(os.path.join(cwd, "Images"), exist_ok=True)
    pb.save_history(os.path.join(cwd, "Images", "Poiseuille_no_pressure_history.json"))
    finals = {k: v["log"][-1] for k, v in pb.history.losses_test.items()}
    print("final test losses:", finals)
    return pb, model


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--second-round", default="jax", choices=["scipy", "jax"])
    args = ap.parse_args()
    main(args.epochs, second_round=args.second_round)
