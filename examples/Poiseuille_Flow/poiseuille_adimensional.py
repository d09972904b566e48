"""Adimensionalized Poiseuille flow, old nisaba-script API style
(reference: Examples_Old/Poiseuille/poiseuille.py).

The early reference drivers use a different idiom than the six main cases:
per-loss ``create_rhs(x, force, noise)`` RHS builders, adimensional NS with a
1/Re viscous coefficient, ``normalization=1e4`` on the PDE losses, named
per-edge losses, and 3-D scatter post-processing.  This example reproduces
that API style on tpinn verbatim (it deliberately bypasses
``StandardNSDriver`` — the point is old-API parity).

    u_x + v_y = 0                                    in (0,1) x (0,H)
    (u u_x + v u_y) - (u_xx + u_yy)/Re + p_x = 0
    (u v_x + v v_y) - (v_xx + v_yy)/Re + p_y = 0
    u = v = 0                                        on y = {0, H}
    1/Re u_x - p = p_end ,  v_x = 0                  on x = 1 (traction outflow)
    u = u_ex, v = 0                                  on x = 0 (inflow)

    p_ex(x) = (p_end - p_str) x + p_str,  u_ex(y) = -Re p_x y (2*delta - y)/2

Deliberately NOT copied from the reference (SURVEY.md §7 quirks): its
``rho * Ub^2`` uses ``^`` (integer XOR, not power); here the
adimensionalization uses ``**`` so the exact solution satisfies the residuals
to machine precision.  The reference's division of ``p_exact`` by ``rho``
(and the matching ``* rho`` on ``dp`` in the residual) is kept — it is a
pressure-output rescaling that keeps the network's p head O(0.1) instead of
O(300), which f32 training needs (unscaled, the TPU run diverges).
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

# fluid & flow setup (reference :30-37: lava channel)
DIM = 2
RHO, MU, UB, L_DIM, H_DIM = 3100.0, 890.0, 1.0, 1.0, 0.1
P_STR, P_END = 1e6, 0.0

# adimensionalization (reference :39-45, with ** not ^)
RE = RHO * UB * L_DIM / MU
L, H = 1.0, H_DIM / L_DIM
DELTA = H / 2
p_str = P_STR / (RHO * UB**2)
p_end = P_END / (RHO * UB**2)
P_X = p_end - p_str
# pressure-output rescaling (reference :52,137: network predicts p*/rho so
# the head stays O(0.1); the residual multiplies its gradient back by rho)
P_SCALE = RHO

u_exact = lambda x: -RE * P_X * x[:, 1] * (2 * DELTA - x[:, 1]) / 2
v_exact = lambda x: 0 * x[:, 0]
p_exact = lambda x: ((p_end - p_str) / L * x[:, 0] + p_str) / P_SCALE


def main(epochs: int = 1000, save_plots: bool = True, out_dir: str = None,
         second_round: str = "scipy", noise: float = 0.0):
    cwd = out_dir or os.path.dirname(os.path.abspath(__file__))
    num_PDE, num_BC, num_hint, num_test = 200, 20, 10, 1000

    ks = jax.random.split(jax.random.PRNGKey(1), 10)
    model = ns.models.MLP(2, 3, width=20, depth=3, seed=1,
                          input_extents=[(0.0, L), (0.0, H)])

    x_PDE = sample_box(ks[0], num_PDE, [0, 0], [L, H])
    x_hint = sample_box(ks[1], num_hint, [0, 0], [L, H])
    x_BC_x0 = sample_box(ks[2], num_BC, [0, 0], [0, H])
    x_BC_x1 = sample_box(ks[3], num_BC, [L, 0], [L, H])
    x_BC_y0 = sample_box(ks[4], num_BC, [0, 0], [L, 0])
    x_BC_y1 = sample_box(ks[5], num_BC, [0, H], [L, H])
    x_test = sample_box(ks[6], num_test, [0, 0], [L, H])

    def create_rhs(x, force, noise_factor: float = 0.0, key=None):
        """Old-API RHS builder (reference :86-95 family): None -> zeros,
        float -> constant, callable -> force(x); optional gaussian noise."""
        n = x.shape[0]
        if force is None:
            rhs = jnp.zeros((n,), dtype=ns.config.get_dtype())
        elif isinstance(force, float):
            rhs = jnp.full((n,), force, dtype=ns.config.get_dtype())
        else:
            rhs = jnp.asarray(force(x), dtype=ns.config.get_dtype())
        if noise_factor and key is not None:
            rhs = rhs + noise_factor * jax.random.normal(
                key, (n,), dtype=ns.config.get_dtype())
        return rhs

    def PDE_MASS():
        with ns.GradientTape(persistent=True) as tape:
            tape.watch(x_PDE)
            u_vect = model(x_PDE)[:, 0:2]
            div = operator.divergence_vector(tape, u_vect, x_PDE, DIM)
        return div

    def PDE_MOM(x, k, force):
        with ns.GradientTape(persistent=True) as tape:
            tape.watch(x)
            u_vect = model(x)
            u, v = u_vect[:, 0], u_vect[:, 1]
            u_eq = u_vect[:, k]
            grad_eq = operator.gradient_scalar(tape, u_eq, x)
            dp = operator.gradient_scalar(tape, u_vect[:, 2], x)[:, k] * P_SCALE
            lapl_eq = operator.laplacian_scalar(tape, u_eq, x, DIM)
        rhs = create_rhs(x, force)
        return (u * grad_eq[:, 0] + v * grad_eq[:, 1]) - lapl_eq / RE + dp - rhs

    def BC_D(x, k, g_bc=None, key=None):
        return model(x)[:, k] - create_rhs(x, g_bc, noise, key)

    def BC_N(x, k, j, pr=None):
        with ns.GradientTape(persistent=True) as tape:
            tape.watch(x)
            uk = model(x)[:, k]
            duk_j = operator.gradient_scalar(tape, uk, x)[:, j]
        p = model(x)[:, 2] * P_SCALE * (k == j)
        rhs = create_rhs(x, pr) * (k == j)
        return 1 / RE * duk_j - p - rhs

    def exact_value(x, k, sol=None, key=None):
        return model(x)[:, k] - create_rhs(x, sol, noise, key)

    PDE_losses = [
        ns.LossMeanSquares("PDE_MASS", PDE_MASS, normalization=1e4, weight=1e0),
        ns.LossMeanSquares("PDE_MOMU", lambda: PDE_MOM(x_PDE, 0, None),
                           normalization=1e4, weight=1e-2),
        ns.LossMeanSquares("PDE_MOMV", lambda: PDE_MOM(x_PDE, 1, None),
                           normalization=1e4, weight=1e-2),
    ]
    BCD_losses = [
        ns.LossMeanSquares("BCD_x0_u", lambda: BC_D(x_BC_x0, 0, u_exact, ks[7]), weight=1e2),
        ns.LossMeanSquares("BCD_x0_v", lambda: BC_D(x_BC_x0, 1), weight=1e2),
        ns.LossMeanSquares("BCD_y0_u", lambda: BC_D(x_BC_y0, 0), weight=1e0),
        ns.LossMeanSquares("BCD_y0_v", lambda: BC_D(x_BC_y0, 1), weight=1e0),
        ns.LossMeanSquares("BCD_y1_u", lambda: BC_D(x_BC_y1, 0), weight=1e0),
        ns.LossMeanSquares("BCD_y1_v", lambda: BC_D(x_BC_y1, 1), weight=1e0),
    ]
    BCN_losses = [
        # the traction residual carries p * P_SCALE ~ O(300): normalize it
        # back to O(1) (this is what LossMeanSquares' `normalization` is
        # for — cf. the reference's 1e4 PDE normalizations); without it the
        # loss starts at ~3e6 and float32 Adam diverges
        ns.LossMeanSquares("BCN_x1_u", lambda: BC_N(x_BC_x1, 0, 0, p_end),
                           weight=1e2, normalization=P_SCALE),
        ns.LossMeanSquares("BCN_x1_v", lambda: BC_N(x_BC_x1, 1, 0), weight=1e2),
    ]
    EXC_losses = [
        ns.LossMeanSquares("exact_u", lambda: exact_value(x_hint, 0, u_exact, ks[8])),
        ns.LossMeanSquares("exact_v", lambda: exact_value(x_hint, 1, v_exact)),
        ns.LossMeanSquares("exact_p", lambda: exact_value(x_hint, 2, p_exact, ks[9])),
    ]
    losses = PDE_losses + BCD_losses + BCN_losses + EXC_losses
    loss_test = [
        ns.LossMeanSquares("u_fit", lambda: exact_value(x_test, 0, u_exact)),
        ns.LossMeanSquares("v_fit", lambda: exact_value(x_test, 1, v_exact)),
        ns.LossMeanSquares("p_fit", lambda: exact_value(x_test, 2, p_exact)),
    ]

    pb = ns.OptimizationProblem(model.variables, losses, loss_test)
    ns.minimize(pb, "keras", ns.optimizers.Adam(learning_rate=1e-2), num_epochs=100)
    if second_round == "scipy":
        ns.minimize(pb, "scipy", "L-BFGS-B", num_epochs=epochs)
    elif second_round in ("jax-bfgs", "bfgs"):
        ns.minimize(pb, "jax", "BFGS", num_epochs=epochs)
    else:
        ns.minimize(pb, "jax", "L-BFGS", num_epochs=epochs)

    os.makedirs(os.path.join(cwd, "Images"), exist_ok=True)
    history_file = os.path.join(cwd, "Images", "Poiseuille_adim_history_loss.json")
    pb.save_history(history_file)

    out = model(x_test)
    if save_plots:
        ns.utils.plot_history(history_file)
        from tpinn import viz

        for k, (name, sol) in enumerate(
            [("u", u_exact), ("v", v_exact), ("p", p_exact)]
        ):
            viz.scatter3d_compare(
                x_test[:, 0], x_test[:, 1], sol(x_test), out[:, k],
                filename=os.path.join(cwd, "Images", f"Poiseuille_adim_{name}.png"),
            )

    tests = {n: pb.history.losses_test[n]["log"][-1]
             for n in ("u_fit", "v_fit", "p_fit")}
    print(f"Reynolds Number -> {RE}")
    print("final global loss: %.3e" % pb.history.loss_global[-1])
    print("final test losses:", {k: "%.3e" % v for k, v in tests.items()})
    return pb, model


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--second-round", default="scipy",
                    choices=["scipy", "scipy-parity", "jax", "jax-bfgs"])
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--no-plots", action="store_true")
    args = ap.parse_args()
    main(args.epochs, save_plots=not args.no_plots,
         second_round=args.second_round, noise=args.noise)
