"""Poisson problem, Dirichlet BCs (reference: Examples/Poisson_Problem/poisson.py).

    -Δu = 2 sin(x) sin(y)   in Ω = (0, 2π)²
       u = 0                on ∂Ω
    u_exact = sin(x) sin(y)

Written in the nisaba-compatible style (``import tpinn as ns``) to
demonstrate API parity; the tape-based loss closures compile to a single
fused XLA graph per training step.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (reference import sandwich)

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

import tpinn as ns
from tpinn.experimental.physics import tens_style as operator
from tpinn.geometry import sample_box
from tpinn.oracles import analytic


def main(epochs: int = 500, save_plots: bool = True, out_dir: str = None,
         second_round: str = "scipy"):
    cwd = out_dir or os.path.dirname(os.path.abspath(__file__))
    dim = 2
    W = 2 * np.pi

    num_PDE, num_BC, num_test = 200, 20, 1000

    # seeded sampling for reproducibility (reference poisson.py:37-38)
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    model = ns.models.MLP(2, 1, width=20, depth=3, seed=1,
                          input_extents=[(0.0, W), (0.0, W)])

    x_PDE = sample_box(ks[0], num_PDE, [0, 0], [W, W])
    x_BC = jnp.concatenate(
        [
            sample_box(ks[1], num_BC, [0, 0], [0, W]),
            sample_box(ks[2], num_BC, [W, 0], [W, W]),
            sample_box(ks[3], num_BC, [0, 0], [W, 0]),
            sample_box(ks[4], num_BC, [0, W], [W, W]),
        ],
        axis=0,
    )
    x_test = sample_box(ks[5], num_test, [0, 0], [W, W])
    u_test = analytic.poisson_exact(x_test)[:, None]
    f = analytic.poisson_forcing(x_PDE)

    def PDE():
        with ns.GradientTape(persistent=True) as tape:
            tape.watch(x_PDE)
            u = model(x_PDE)
            laplacian = operator.laplacian_scalar(tape, u, x_PDE, dim)
        return -laplacian - f

    # per-point residuals: enable the LM round's fast Gram (see
    # tpinn.optimize._minimize_jax_lm / LossMeanSquares.point_residual)
    from tpinn.pipeline import taylor_tri_fn

    tri = taylor_tri_fn(model, dim)

    def pde_pt(params, xi, f_i):
        _, _, hdiag = tri(params, xi[None, :])
        return -(hdiag[0, 0, 0] + hdiag[0, 0, 1]) - f_i

    def bc_pt(params, xi):
        return model.apply(params, xi[None, :])[0, 0]

    # Fused one-pass Poisson kernel on TPU (loss + log MSE + parameter
    # grads in ONE launch, tpinn.pallas.poisson_residual_weighted_obj);
    # LM-bound runs keep the jet closure — the LM round builds its
    # per-point Gram from point_residual (same routing as tpinn.driver).
    from tpinn.losses import PrecomputedMeanSquares
    from tpinn.pipeline import FusedPoissonObjective, use_fused_pde_losses

    if second_round not in ("lm", "jax-lm", "gn") and use_fused_pde_losses(
            model, False, dim):
        fused = FusedPoissonObjective(model, x_PDE, f, weight=2.0)
        pde_loss = PrecomputedMeanSquares("PDE", fused.loss_fn(), weight=2.0)
    else:
        pde_loss = ns.LossMeanSquares("PDE", PDE, weight=2.0,
                                      point_residual=(pde_pt, (x_PDE, f)))
    losses = [
        pde_loss,
        ns.LossMeanSquares("BC", lambda: model(x_BC),
                           point_residual=(bc_pt, (x_BC,))),
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
    history_file = os.path.join(cwd, "Images", "Poisson_history_loss.json")
    pb.save_history(history_file)
    if save_plots:
        ns.utils.plot_history(history_file)
        # 3-D scatter exact vs PINN on the test points (reference
        # poisson.py:85-91)
        from tpinn import viz

        viz.scatter3d_compare(
            x_test[:, 0], x_test[:, 1], u_test[:, 0],
            np.asarray(model(x_test))[:, 0],
            filename=os.path.join(cwd, "Images", "Poisson_scatter.png"),
        )

    final_test = pb.history.losses_test["fit"]["log"][-1]
    print(f"final global loss: {pb.history.loss_global[-1]:.3e}")
    print(f"final test MSE:    {final_test:.3e}")
    return pb, model


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--second-round", default="scipy", choices=["scipy", "jax", "jax-bfgs", "lm"])
    ap.add_argument("--no-plots", action="store_true")
    ap.add_argument("--out-dir", default=None,
                    help="artifact directory (default: this example's; "
                    "smoke runs should point elsewhere so they cannot "
                    "clobber campaign artifacts)")
    args = ap.parse_args()
    main(args.epochs, save_plots=not args.no_plots,
         out_dir=args.out_dir, second_round=args.second_round)
