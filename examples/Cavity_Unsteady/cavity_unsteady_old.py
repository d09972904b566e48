"""Unsteady lid-driven cavity, old nisaba-script API style
(reference: Examples_Old/Lid_Driven_Cavity/cavity_unsteady.py).

The old unsteady driver differs from the new Test_Case pipeline in the knobs
the framework must support (SURVEY.md §2.2 "Old Cavity unsteady"):

* ``random.sample`` index subsets over the FULL space-time grid for the
  PDE / collocation / pressure / test sets (reference :146-152), instead of
  a disjoint permutation split;
* per-group enable flags (``use_pdelosses``/``use_boundaryc``/
  ``use_initialco``/``coll_velocity``/``coll_pressure``, reference :64-71);
* BC points sampled uniformly in (t, edge) space and ICs at t=0
  (reference :155-161);
* an initial-condition PRESSURE loss ``CI_p`` (reference :310-312) — the
  new driver pins only u, v at t=0;
* ``PDE_MASS`` at normalization 1e0 but momentum at 1e4, all at weight
  1e-2 (reference :295-298);
* 100-file per-timestep h5 ingest with per-step pressure mean-recentering
  (reference :99-137);
* per-time-stamp contour figures ``..._Graphic_i_of_n.jpg``
  (reference :369-445).

Reference quirks handled deliberately (not copied):
* the reference's ``generate_noise`` concatenates x/y noise into one
  2N-vector and ``BC_D`` then indexes ``noise[k]`` — a SCALAR (element k),
  so every "noisy" BC actually gets one constant offset.  Here the intended
  per-component half is used.
* the reference de-normalizes plotted u with ``v_max`` (:407-409); here
  ``vel_max`` (the shared constant actually used in training) is used.

Physics (reference :31-42): unsteady NS, nu = 1, U = 1, T = 1e-2, dt = 1e-4.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (reference import sandwich)

import argparse
import os
import random

import jax
import jax.numpy as jnp
import numpy as np

import tpinn as ns
from tpinn.experimental.physics import tens_style as operator
from tpinn.models import Model

problem_name = "Lid Driven Cavity - Unsteady"

# case study (reference :45-52)
DIM = 3
A, B = 0.0, 1.0
U = 1.0
T = 1e-2
DT = 1e-4


def main(epochs: int = 5000, use_noise: bool = True,
         second_round: str = "scipy", save_plots: bool = True,
         out_dir: str = None,
         num_PDE: int = 10000, num_BC: int = 5000, num_CI: int = 9000,
         num_col: int = 1000, num_pres: int = 2500, num_test: int = 7500,
         use_pdelosses: bool = True, use_boundaryc: bool = True,
         use_initialco: bool = True, coll_velocity: bool = True,
         coll_pressure: bool = True):
    cwd = out_dir or os.path.dirname(os.path.abspath(__file__))
    np.random.seed(1)  # reference :17-18 reproducibility seeds
    random.seed(1)
    key = jax.random.PRNGKey(1)
    dtype = ns.config.get_dtype()

    # ----- space-time grid (reference :76-95) -----------------------------
    n1 = n2 = 100
    num_times = int(T / DT)
    time_vector = np.arange(0.0, T, step=DT)
    xs = np.linspace(A, B, n1 + 1)
    ys = np.linspace(A, B, n2 + 1)
    # (t, x, y) rows, x fastest then y then t (reference :88-94)
    tt, jj, ii = np.meshgrid(time_vector, ys, xs, indexing="ij")
    var_np = np.stack([tt.ravel(), ii.ravel(), jj.ravel()], axis=1)
    N = var_np.shape[0]
    var = jnp.asarray(var_np, dtype=dtype)

    # ----- per-timestep h5 ingest (reference :99-137) ---------------------
    from tpinn.oracles.generate import generate_cavity_unsteady
    from tpinn.oracles import io as oio

    data_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "data")
    folder = generate_cavity_unsteady(data_dir, U=U, T=T, dt=DT)
    u_np, v_np, p_np = oio.read_unsteady_series_h5(folder, num_times)
    u_num = jnp.asarray(u_np, dtype=dtype)
    v_num = jnp.asarray(v_np, dtype=dtype)
    p_num = jnp.asarray(p_np, dtype=dtype)

    # ----- random.sample index subsets (reference :146-152) ---------------
    sequence = list(range(N))
    subset_PDE = jnp.asarray(random.sample(sequence, num_PDE))
    subset_col = jnp.asarray(random.sample(sequence, num_col))
    subset_pres = jnp.asarray(random.sample(sequence, num_pres))
    subset_test = jnp.asarray(random.sample(sequence, num_test))
    x_PDE = jnp.take(var, subset_PDE, axis=0)

    ks = jax.random.split(key, 9)
    box = lambda k, n, lo, hi: jax.random.uniform(
        k, (n, 3), dtype=dtype,
        minval=jnp.asarray(lo, dtype), maxval=jnp.asarray(hi, dtype))
    x_BC_x0 = box(ks[0], num_BC, [0, A, A], [T, A, B])
    x_BC_x1 = box(ks[1], num_BC, [0, B, A], [T, B, B])
    x_BC_y0 = box(ks[2], num_BC, [0, A, A], [T, B, A])
    x_BC_y1 = box(ks[3], num_BC, [0, A, B], [T, B, B])
    x_CI = box(ks[4], num_CI, [0, A, A], [0, B, B])

    # ----- normalization constants (reference :173-177) -------------------
    vel_max = float(max(np.max(u_np) - np.min(u_np),
                        np.max(v_np) - np.min(v_np)))
    p_max = float(np.max(p_np) - np.min(p_np))

    # ----- model: 3x32 tanh on (t,x,y) (reference :181-186) ---------------
    model = Model([3, 32, 32, 32, 3], activation="tanh", seed=1,
                  input_extents=[(0.0, T), (A, B), (A, B)])

    # ----- rhs + noise (reference :190-222) -------------------------------
    def create_rhs(x, force, noise=None):
        n = x.shape[0]
        rhs = jnp.zeros((n,), dtype=dtype)
        if isinstance(force, (int, float)) and force:
            rhs = rhs + force
        elif callable(force):
            rhs = jnp.asarray(force(x), dtype=dtype)
        if noise is not None:
            rhs = rhs + noise
        return rhs

    def generate_noise(x, factor, k):
        # per-component pair (the reference's concat+[k] scalar quirk is
        # deliberately NOT copied — see module docstring)
        kx, ky = jax.random.split(k)
        n = x.shape[0]
        return (factor * jax.random.normal(kx, (n,), dtype=dtype),
                factor * jax.random.normal(ky, (n,), dtype=dtype))

    if use_noise:  # reference :212-217: factor 1e-1 per edge
        BCD_noise_x0 = generate_noise(x_BC_x0, 1e-1, ks[5])
        BCD_noise_x1 = generate_noise(x_BC_x1, 1e-1, ks[6])
        BCD_noise_y0 = generate_noise(x_BC_y0, 1e-1, ks[7])
        BCD_noise_y1 = generate_noise(x_BC_y1, 1e-1, ks[8])
    else:
        BCD_noise_x0 = BCD_noise_x1 = (None, None)
        BCD_noise_y0 = BCD_noise_y1 = (None, None)

    # ----- PDE losses (reference :226-257) --------------------------------
    def PDE_MASS(x):
        with ns.GradientTape(persistent=True) as tape:
            tape.watch(x)
            u_vect = model(x)[:, 0:2] * vel_max
            du_x = operator.gradient_scalar(tape, u_vect[:, 0], x)[:, 1]
            dv_y = operator.gradient_scalar(tape, u_vect[:, 1], x)[:, 2]
        return du_x + dv_y

    def PDE_MOM(x, k, force):
        with ns.GradientTape(persistent=True) as tape:
            tape.watch(x)
            u_vect = model(x)
            p = u_vect[:, 2] * p_max
            u_eq = u_vect[:, k] * vel_max
            dp = operator.gradient_scalar(tape, p, x)[:, k + 1]
            du = operator.gradient_scalar(tape, u_eq, x)
            du_t, du_x, du_y = du[:, 0], du[:, 1], du[:, 2]
            du_xx = operator.gradient_scalar(tape, du_x, x)[:, 1]
            du_yy = operator.gradient_scalar(tape, du_y, x)[:, 2]
            conv1 = vel_max * u_vect[:, 0] * du_x
            conv2 = vel_max * u_vect[:, 1] * du_y
        rhs = create_rhs(x, force)
        return du_t - du_xx - du_yy + dp + conv1 + conv2 - rhs

    # ----- boundary / initial / collocation losses (reference :261-292) ---
    def BC_D(x, k, f, norm=1.0, noise=(None, None)):
        return model(x)[:, k] - create_rhs(x, f, noise[k]) / norm

    def BC_IN(x, k, f, norm=1.0):
        return model(x)[:, k] - create_rhs(x, f) / norm

    def col_pressure(idx, sol, norm):
        p = model(jnp.take(var, idx, axis=0))[:, 2]
        return p - jnp.take(sol, idx) / norm

    def col_velocity(idx, k, sol, norm):
        u = model(jnp.take(var, idx, axis=0))[:, k]
        return u - jnp.take(sol, idx) / norm

    def exact_value(idx, k, sol, norm):
        uk = model(jnp.take(var, idx, axis=0))[:, k]
        return uk - jnp.take(sol, idx) / norm

    LMS = ns.LossMeanSquares
    losses = []
    if use_pdelosses:  # reference :295-298 (MASS at 1e0, MOM at 1e4)
        losses += [
            LMS('PDE_MASS', lambda: PDE_MASS(x_PDE), normalization=1e0,
                weight=1e-2),
            LMS('PDE_MOMU', lambda: PDE_MOM(x_PDE, 0, 0),
                normalization=1e4, weight=1e-2),
            LMS('PDE_MOMV', lambda: PDE_MOM(x_PDE, 1, 0),
                normalization=1e4, weight=1e-2),
        ]
    if use_boundaryc:  # reference :300-308
        losses += [
            LMS('BCD_u_x0', lambda: BC_D(x_BC_x0, 0, 0, vel_max,
                                         BCD_noise_x0)),
            LMS('BCD_v_x0', lambda: BC_D(x_BC_x0, 1, 0, vel_max,
                                         BCD_noise_x0)),
            LMS('BCD_u_x1', lambda: BC_D(x_BC_x1, 0, 0, vel_max,
                                         BCD_noise_x1)),
            LMS('BCD_v_x1', lambda: BC_D(x_BC_x1, 1, 0, vel_max,
                                         BCD_noise_x1)),
            LMS('BCD_u_y0', lambda: BC_D(x_BC_y0, 0, 0, vel_max,
                                         BCD_noise_y0)),
            LMS('BCD_v_y0', lambda: BC_D(x_BC_y0, 1, 0, vel_max,
                                         BCD_noise_y0)),
            LMS('BCD_u_y1', lambda: BC_D(x_BC_y1, 0, U, vel_max,
                                         BCD_noise_y1)),
            LMS('BCD_v_y1', lambda: BC_D(x_BC_y1, 1, 0, vel_max,
                                         BCD_noise_y1)),
        ]
    if use_initialco:  # reference :310-312, incl. the CI_p pressure pin
        losses += [
            LMS('CI_u', lambda: BC_IN(x_CI, 0, 0, vel_max)),
            LMS('CI_v', lambda: BC_IN(x_CI, 1, 0, vel_max)),
            LMS('CI_p', lambda: BC_IN(x_CI, 2, 0, p_max)),
        ]
    if coll_velocity:  # reference :314-316
        losses += [
            LMS('COL_u', lambda: col_velocity(subset_col, 0, u_num,
                                              vel_max)),
            LMS('COL_v', lambda: col_velocity(subset_col, 1, v_num,
                                              vel_max)),
        ]
    if coll_pressure:  # reference :318
        losses += [LMS('COL_p', lambda: col_pressure(subset_col, p_num,
                                                     p_max))]

    loss_test = [
        LMS('u_fit', lambda: exact_value(subset_test, 0, u_num, vel_max)),
        LMS('v_fit', lambda: exact_value(subset_test, 1, v_num, vel_max)),
        LMS('p_fit', lambda: exact_value(subset_test, 2, p_num, p_max)),
    ]

    # ----- training (reference :335-345) ----------------------------------
    images = os.path.join(cwd, "Images")
    os.makedirs(images, exist_ok=True)
    pb = ns.OptimizationProblem(model.variables, losses, loss_test,
                                callbacks=[])
    pb.callbacks.append(ns.utils.HistoryPlotCallback(
        frequency=100, gui=False,
        filename=os.path.join(images, f"{problem_name}_LossTrend.png"),
        filename_history=os.path.join(
            images, f"{problem_name}_history_loss.json")))
    ns.minimize(pb, 'keras', ns.optimizers.Adam(learning_rate=1e-2),
                num_epochs=100)
    if second_round == "scipy":
        ns.minimize(pb, 'scipy', 'BFGS', num_epochs=epochs)
    elif second_round == "jax-bfgs":
        ns.minimize(pb, 'jax', 'BFGS', num_epochs=epochs)
    elif second_round != "none":
        ns.minimize(pb, 'jax', 'L-BFGS', num_epochs=epochs)

    # ----- per-time-stamp contours (reference :369-445) -------------------
    if save_plots:
        import pandas as pd

        from tpinn import viz

        n_time_stamp = 4
        time_steps = np.linspace(0, T, n_time_stamp + 1)
        grid_x, grid_y = np.meshgrid(np.linspace(A, B, 100),
                                     np.linspace(A, B, 100))
        df2 = pd.read_csv(os.path.join(
            folder, "navier-stokes_SI_cavity_unsteady_r.csv"))
        for i, t in enumerate(time_steps):
            tq = T - DT if t == T else t
            sl = df2[(df2["t"] >= tq - DT / 4) & (df2["t"] <= tq + DT / 4)]
            p_ex = sl["p"].to_numpy().reshape(grid_x.shape)
            p_ex = p_ex - np.mean(p_ex)
            u_ex = sl["ux"].to_numpy().reshape(grid_x.shape)
            v_ex = sl["uy"].to_numpy().reshape(grid_x.shape)
            grid = jnp.asarray(np.stack(
                [np.full(grid_x.size, tq), grid_x.ravel(), grid_y.ravel()],
                axis=-1), dtype)
            out = np.asarray(model(grid))
            u_pinn = out[:, 0].reshape(grid_x.shape) * vel_max
            v_pinn = out[:, 1].reshape(grid_x.shape) * vel_max
            p_pinn = out[:, 2].reshape(grid_x.shape) * p_max
            viz.contour_compare(
                grid_x, grid_y, [u_ex, v_ex, p_ex],
                [u_pinn, v_pinn, p_pinn],
                titles=("u-velocity", "v-velocity", "Pressure"),
                problem_name="Solutions when t = {0:.4f}".format(tq),
                filename=os.path.join(
                    images, "{}_Graphic_{}_of_{}.jpg".format(
                        problem_name, i + 1, n_time_stamp + 1)))

    # ----- recap (reference :450-461) -------------------------------------
    final_test = {n: d["log"][-1]
                  for n, d in pb.history.losses_test.items() if d["log"]}
    print("\nSIMULATION OPTIONS RECAP...")
    print("\tEpochs             ->", epochs)
    print("\tPinns points       ->", num_PDE)
    print("\tBoundary points    ->", num_BC)
    print("\tInitial  points    ->", num_CI)
    print("\tCollocation points ->", num_col)
    print("\tPressure points    ->", num_pres)
    print("\tTest points        ->", num_test)
    print("final test losses:", {k: f"{v:.3e}" for k, v in
                                 final_test.items()})
    return pb, model


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5000)
    ap.add_argument("--second-round", default="scipy",
                    choices=["scipy", "jax", "jax-bfgs", "none"])
    ap.add_argument("--no-noise", action="store_true")
    ap.add_argument("--no-plots", action="store_true")
    args = ap.parse_args()
    main(epochs=args.epochs, use_noise=not args.no_noise,
         second_round=args.second_round, save_plots=not args.no_plots)
