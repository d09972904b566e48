"""Poisson problem with mixed Dirichlet/Neumann BCs
(reference: Examples/Poisson_Problem/poisson_misto.py).

    -Δu = 2 sin(x) sin(y)   in Ω = (0, 2π)²
       u = 0                on y-edges (Dirichlet)
     u_x = sin(y)           on x-edges (Neumann, via gradient_scalar)

Weights PDE=1e2 and a long L-BFGS round per the reference (:83, :93).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (reference import sandwich)

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

import tpinn as ns
from tpinn.experimental.physics import tens_style as operator
from tpinn.geometry import sample_box
from tpinn.oracles import analytic


def main(epochs: int = 7500, save_plots: bool = True, out_dir: str = None,
         second_round: str = "scipy"):
    cwd = out_dir or os.path.dirname(os.path.abspath(__file__))
    dim = 2
    W = 2 * np.pi
    num_PDE, num_BC, num_test = 200, 20, 1000

    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    model = ns.models.MLP(2, 1, width=20, depth=3, seed=1,
                          input_extents=[(0.0, W), (0.0, W)])

    x_PDE = sample_box(ks[0], num_PDE, [0, 0], [W, W])
    x_BC_D = jnp.concatenate(
        [
            sample_box(ks[1], num_BC, [0, 0], [W, 0]),  # y = 0
            sample_box(ks[2], num_BC, [0, W], [W, W]),  # y = 2π
        ],
        axis=0,
    )
    x_BC_N = jnp.concatenate(
        [
            sample_box(ks[3], num_BC, [0, 0], [0, W]),  # x = 0
            sample_box(ks[4], num_BC, [W, 0], [W, W]),  # x = 2π
        ],
        axis=0,
    )
    x_test = sample_box(ks[5], num_test, [0, 0], [W, W])
    u_test = analytic.poisson_exact(x_test)[:, None]
    f = analytic.poisson_forcing(x_PDE)
    g_N = analytic.poisson_neumann_x(x_BC_N)

    def PDE():
        with ns.GradientTape(persistent=True) as tape:
            tape.watch(x_PDE)
            u = model(x_PDE)
            laplacian = operator.laplacian_scalar(tape, u, x_PDE, dim)
        return -laplacian - f

    def BC_N():
        with ns.GradientTape(persistent=True) as tape:
            tape.watch(x_BC_N)
            u = model(x_BC_N)
            du = operator.gradient_scalar(tape, u, x_BC_N)
        return du[:, 0] - g_N

    # per-point residuals: enable the LM round's fast Gram (see
    # tpinn.optimize._minimize_jax_lm / LossMeanSquares.point_residual)
    from tpinn.pipeline import taylor_tri_fn

    tri = taylor_tri_fn(model, dim)

    def pde_pt(params, xi, f_i):
        _, _, hdiag = tri(params, xi[None, :])
        return -(hdiag[0, 0, 0] + hdiag[0, 0, 1]) - f_i

    def bcd_pt(params, xi):
        return model.apply(params, xi[None, :])[0, 0]

    def bcn_pt(params, xi, g_i):
        _, jac, _ = tri(params, xi[None, :])
        return jac[0, 0, 0] - g_i

    # Fused one-pass Poisson kernel on TPU (same routing as poisson.py:
    # LM-bound runs keep the jet closure for the per-point-Gram fast path)
    from tpinn.losses import PrecomputedMeanSquares
    from tpinn.pipeline import FusedPoissonObjective, use_fused_pde_losses

    if second_round not in ("lm", "jax-lm", "gn") and use_fused_pde_losses(
            model, False, dim):
        fused = FusedPoissonObjective(model, x_PDE, f, weight=1e2)
        pde_loss = PrecomputedMeanSquares("PDE", fused.loss_fn(), weight=1e2)
    else:
        pde_loss = ns.LossMeanSquares("PDE", PDE, weight=1e2,
                                      point_residual=(pde_pt, (x_PDE, f)))
    losses = [
        pde_loss,
        ns.LossMeanSquares("BC_D", lambda: model(x_BC_D),
                           point_residual=(bcd_pt, (x_BC_D,))),
        ns.LossMeanSquares("BC_N", BC_N,
                           point_residual=(bcn_pt, (x_BC_N, g_N))),
    ]
    loss_test = ns.LossMeanSquares("fit", lambda: model(x_test) - u_test)

    pb = ns.OptimizationProblem(model.variables, losses, loss_test)
    ns.minimize(pb, "keras", ns.optimizers.Adam(learning_rate=1e-2), num_epochs=100)
    if second_round == "scipy":
        ns.minimize(pb, "scipy", "L-BFGS-B", num_epochs=epochs)
    elif second_round in ("jax-bfgs", "bfgs"):
        ns.minimize(pb, "jax", "BFGS", num_epochs=epochs)
    elif second_round in ("lm", "jax-lm", "gn"):
        ns.minimize(pb, "jax", "LM", num_epochs=epochs)
    else:
        ns.minimize(pb, "jax", "L-BFGS", num_epochs=epochs)

    os.makedirs(os.path.join(cwd, "Images"), exist_ok=True)
    history_file = os.path.join(cwd, "Images", "Poisson_misto_history_loss.json")
    pb.save_history(history_file)
    if save_plots:
        ns.utils.plot_history(history_file)

    # sup-norm check against the exact solution (reference App. A.2: 0.002)
    out = model(x_test)
    sup_err = float(jnp.max(jnp.abs(out[:, 0] - u_test[:, 0])))
    print(f"final global loss: {pb.history.loss_global[-1]:.3e}")
    print(f"final test MSE:    {pb.history.losses_test['fit']['log'][-1]:.3e}")
    print(f"||u - u_ex||_inf:  {sup_err:.4f}")
    return pb, model


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=7500)
    ap.add_argument("--second-round", default="scipy", choices=["scipy", "jax", "jax-bfgs", "lm"])
    ap.add_argument("--no-plots", action="store_true")
    args = ap.parse_args()
    main(args.epochs, save_plots=not args.no_plots, second_round=args.second_round)
