"""Colliding flow with a mean-pressure gauge penalty instead of a pressure
fitting point (reference: Examples/Colliding_Flow/colliding_flow_pressmean.py).

Demonstrates the generic ``ns.Loss`` with ``non_negative=True`` and the
``normalization`` divisor on residual losses (reference :177-196), written in
the nisaba-compatible tape style.
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


def main(epochs: int = 5000, out_dir: str = None, second_round: str = "scipy",
         use_noise: bool = False):
    cwd = out_dir or os.path.dirname(os.path.abspath(__file__))
    dim = 2

    num_PDE, num_BCD, num_col, num_pres = 1000, 400, 5, 50

    ks = jax.random.split(jax.random.PRNGKey(1), 10)
    model = ns.models.MLP(2, 3, width=32, depth=3, seed=1,
                          input_extents=[(-1.0, 1.0), (-1.0, 1.0)])

    x_PDE = sample_box(ks[0], num_PDE, [-1, -1], [1, 1])
    x_BCD = jnp.concatenate(
        [
            sample_box(ks[1], num_BCD // 4, [-1, -1], [-1, 1]),
            sample_box(ks[2], num_BCD // 4, [1, -1], [1, 1]),
            sample_box(ks[3], num_BCD // 4, [-1, -1], [1, -1]),
            sample_box(ks[4], num_BCD // 4, [-1, 1], [1, 1]),
        ],
        axis=0,
    )
    x_col = sample_box(ks[5], num_col, [-1, -1], [1, 1])
    x_pres = sample_box(ks[6], num_pres, [-1, -1], [1, 1])

    u_exact, v_exact, p_exact = (
        analytic.colliding_u,
        analytic.colliding_v,
        analytic.colliding_p,
    )
    vel_max = 20.0
    p_max = 80.0

    noise_x = ns.geometry.generate_noise(ks[7], num_BCD, 1e-1 if use_noise else 0.0)
    noise_y = ns.geometry.generate_noise(ks[8], num_BCD, 1e-1 if use_noise else 0.0)

    def PDE_MASS():
        with ns.GradientTape(persistent=True) as tape:
            tape.watch(x_PDE)
            u_vect = model(x_PDE)[:, 0:2] * vel_max
            div = operator.divergence_vector(tape, u_vect, x_PDE, dim)
        return div

    def PDE_MOM(k):
        with ns.GradientTape(persistent=True) as tape:
            tape.watch(x_PDE)
            u_vect = model(x_PDE)
            p = u_vect[:, 2] * p_max
            u_eq = u_vect[:, k] * vel_max
            dp = operator.gradient_scalar(tape, p, x_PDE)[:, k]
            lapl_eq = operator.laplacian_scalar(tape, u_eq, x_PDE, dim)
        return -(lapl_eq) + dp

    def BC_D(k, sol, norm, noise):
        uk = model(x_BCD)[:, k]
        return uk - (sol(x_BCD) + noise) / norm

    def COL(x, k, sol, norm):
        uk = model(x)[:, k]
        return uk - sol(x) / norm

    def PRESS_0():
        uk = model(x_pres)[:, 2]
        return jnp.abs(jnp.mean(uk))

    LMS = ns.LossMeanSquares
    losses = [
        LMS("PDE_MASS", PDE_MASS, normalization=1e4, weight=1e0),
        LMS("PDE_MOMU", lambda: PDE_MOM(0), normalization=1e4, weight=1e-2),
        LMS("PDE_MOMV", lambda: PDE_MOM(1), normalization=1e4, weight=1e-2),
        LMS("BCD_u", lambda: BC_D(0, u_exact, vel_max, noise_x), weight=1e0),
        LMS("BCD_v", lambda: BC_D(1, v_exact, vel_max, noise_y), weight=1e0),
        LMS("COL_u", lambda: COL(x_col, 0, u_exact, vel_max), weight=1e0),
        LMS("COL_v", lambda: COL(x_col, 1, v_exact, vel_max), weight=1e0),
        ns.Loss("PRESS_0", PRESS_0, normalization=1e0, weight=1e-2,
                non_negative=True),
    ]
    x_test = sample_box(ks[9], 2000, [-1, -1], [1, 1])
    loss_test = [
        LMS("u_test", lambda: COL(x_test, 0, u_exact, vel_max)),
        LMS("v_test", lambda: COL(x_test, 1, v_exact, vel_max)),
        LMS("p_test", lambda: COL(x_test, 2, p_exact, p_max)),
    ]

    pb = ns.OptimizationProblem(model.variables, losses, loss_test)
    ns.minimize(pb, "keras", ns.optimizers.Adam(learning_rate=1e-2), num_epochs=100)
    # shared routing table (same semantics as the StandardNSDriver cases)
    ns.driver.run_second_round(pb, second_round, epochs)

    os.makedirs(os.path.join(cwd, "Images"), exist_ok=True)
    pb.save_history(os.path.join(cwd, "Images", "Colliding_pressmean_history.json"))
    print("final test losses:",
          {k: v["log"][-1] for k, v in pb.history.losses_test.items()})
    return pb, model


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5000)
    ap.add_argument("--second-round", default="scipy", choices=list(ns.driver.SECOND_ROUND_CHOICES))
    ap.add_argument("--noise", action="store_true")
    args = ap.parse_args()
    main(args.epochs, second_round=args.second_round, use_noise=args.noise)
