"""CSV-driven lid-driven cavity, old nisaba-script API style
(reference: Examples_Old/Lid_Driven_Cavity/cavity_steady.py).

The old driver differs from the new Test_Case pipeline in every knob the
framework must support (SURVEY.md §2.2 "Old Cavity steady"):

* data ingest from the FEM random-point CSV, sliced POSITIONALLY into
  PDE / collocation / test / pressure sets (reference :78-86) instead of a
  shuffled split of a tensor grid;
* a 32/32/64 tanh architecture (reference :110-115), not the canonical 3x32;
* ``normalization=1e4, weight=1e-2`` on the PDE losses (reference :218-220);
* a ``press_mode`` switch {"Collocation", "Mean", "None"} — the "Mean" gauge
  is the |mean(p)| - p_mean penalty ``PRESS_MEAN`` at weight 1e-6
  (reference :210-214, :237);
* ``load_mode`` / ``save_mode`` checkpointing through
  ``Saved_Model/<name>.{json,h5}`` Keras files (reference :22-27, :262-289);
* seeded reproducibility (np/tf seed 1, reference :16-17);
* artifacts under ``Images/`` (loss trend + history JSON, reference :258-260)
  rather than an autonumbered experiment folder.

Physics (reference :30-35): steady NS with nu = 1, lid velocity U = 500
(Re = 500), zero forcing.  Exact data comes from the tpinn JAX cavity oracle
writing the reference FEM file layout (navier-stokes_cavity_steady.csv,
fluid_solver_steady.py:106-118).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (reference import sandwich)

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

import tpinn as ns
from tpinn.experimental.physics import tens_style as operator
from tpinn.models import Model, model_from_json

problem_name = "Lid Driven Cavity - Steady"

# case study (reference :29-35)
DIM = 2
A, B = 0.0, 1.0
U = 500.0

# numerical options (reference :42-48)
NUM_PDE, NUM_BC, NUM_COL, NUM_PRES, NUM_TEST = 50, 50, 50, 100, 2000


def main(epochs: int = 100, use_noise: bool = False, collocation: bool = True,
         press_mode: str = "Collocation", second_round: str = "scipy",
         save_plots: bool = True, out_dir: str = None,
         load_mode: bool = False, save_mode: bool = False,
         model_name_load: str = "", model_name_save: str = ""):
    cwd = out_dir or os.path.dirname(os.path.abspath(__file__))
    np.random.seed(1)  # reference :16-17 reproducibility seeds
    key = jax.random.PRNGKey(1)

    # ----- CSV ingest, positional slices (reference :38-40, :78-86) -------
    from tpinn.oracles.generate import generate_cavity_steady

    data_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "data")
    folder = generate_cavity_steady(data_dir, U=U, n_solver=128, t_end=40.0)
    df = pd.read_csv(os.path.join(folder, "navier-stokes_cavity_steady.csv"))
    x_num = df[["x", "y"]].to_numpy()
    u_num = df[["ux"]].to_numpy()
    v_num = df[["uy"]].to_numpy()
    p_num = df[["p"]].to_numpy()

    dtype = ns.config.get_dtype()
    as_t = lambda a: jnp.asarray(a, dtype=dtype)
    i_col, i_test = NUM_PDE, NUM_PDE + NUM_COL
    i_pres = i_test + NUM_TEST
    x_PDE = as_t(x_num[:NUM_PDE])
    x_col = as_t(x_num[i_col:i_test])
    x_test = as_t(x_num[i_test:i_pres])
    x_pres = as_t(x_num[i_pres:i_pres + NUM_PRES])

    # random per-edge BC points (reference :81-84)
    ks = jax.random.split(key, 8)
    edge = lambda k, lo, hi: jax.random.uniform(
        k, (NUM_BC, 2), dtype=dtype,
        minval=jnp.asarray(lo, dtype), maxval=jnp.asarray(hi, dtype))
    x_BC_x0 = edge(ks[0], [A, A], [A, B])
    x_BC_x1 = edge(ks[1], [B, A], [B, B])
    x_BC_y0 = edge(ks[2], [A, A], [B, A])
    x_BC_y1 = edge(ks[3], [A, B], [B, B])
    x_BCD_0 = jnp.concatenate([x_BC_x0, x_BC_x1, x_BC_y0], axis=0)

    # ----- normalization constants (reference :96-104) --------------------
    vel_max = float(max(np.max(u_num) - np.min(u_num),
                        np.max(v_num) - np.min(v_num)))
    p_max = float(np.max(p_num) - np.min(p_num))
    p_mean = float(np.mean(p_num[i_pres:i_pres + NUM_PRES]))

    # ----- model: 32/32/64 tanh (reference :110-115) ----------------------
    model = Model([2, 32, 32, 64, 3], activation="tanh", seed=1,
                  input_extents=[(A, B), (A, B)])

    # ----- rhs + noise (reference :119-145) -------------------------------
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

    def generate_noise(x, factor=0.0, k=None):
        return factor * jax.random.normal(k, (x.shape[0],), dtype=dtype)

    if use_noise:  # reference :137-141: factor 1e-1 on all Dirichlet groups
        BCD_noise_x = generate_noise(x_BCD_0, 1e-1, ks[4])
        BCD_noise_y = generate_noise(x_BCD_0, 1e-1, ks[5])
        BCD_noise_x_up = generate_noise(x_BC_y1, 1e-1, ks[6])
        BCD_noise_y_up = generate_noise(x_BC_y1, 1e-1, ks[7])
    else:
        BCD_noise_x = BCD_noise_y = None
        BCD_noise_x_up = BCD_noise_y_up = None

    # the reference adds the SAME full-length noise vector to every BC edge
    # slice; its x0/x1/y0 losses each see the first NUM_BC entries
    _slc = lambda noise: None if noise is None else noise[:NUM_BC]

    # ----- PDE losses (reference :149-180) --------------------------------
    def PDE_MASS(x):
        with ns.GradientTape(persistent=True) as tape:
            tape.watch(x)
            u_vect = model(x)[:, 0:2] * vel_max
            div = operator.divergence_vector(tape, u_vect, x, DIM)
        return div

    def PDE_MOM(x, k, force):
        with ns.GradientTape(persistent=True) as tape:
            tape.watch(x)
            u_vect = model(x)
            p = u_vect[:, 2] * p_max
            u_eq = u_vect[:, k] * vel_max
            dp = operator.gradient_scalar(tape, p, x)[:, k]
            lapl_eq = operator.laplacian_scalar(tape, u_eq, x, DIM)
            du_x = operator.gradient_scalar(tape, u_eq, x)[:, 0]
            du_y = operator.gradient_scalar(tape, u_eq, x)[:, 1]
            conv1 = vel_max * u_vect[:, 0] * du_x
            conv2 = vel_max * u_vect[:, 1] * du_y
        rhs = create_rhs(x, force)
        return -lapl_eq + dp + conv1 + conv2 - rhs

    # ----- boundary / collocation / test losses (reference :184-214) ------
    def BC_D(x, k, f, norm=1.0, noise=None):
        return model(x)[:, k] - create_rhs(x, f, noise) / norm

    def col_velocity(x, k, sol, norm):
        return model(x)[:, k] - jnp.squeeze(as_t(sol[i_col:i_test] / norm))

    def col_pressure(x, sol, norm):
        return (model(x)[:, 2]
                - jnp.squeeze(as_t(sol[i_pres:i_pres + NUM_PRES] / norm)))

    def exact_value(x, k, sol, norm):
        return model(x)[:, k] - jnp.squeeze(as_t(sol[i_test:i_pres] / norm))

    def PRESS_MEAN(x, p, norm):
        uk_mean = jnp.abs(jnp.mean(model(x)[:, 2]))
        return uk_mean - create_rhs(x, p / norm)

    LMS = ns.LossMeanSquares
    losses = [
        LMS('PDE_MASS', lambda: PDE_MASS(x_PDE), normalization=1e4,
            weight=1e-2),
        LMS('PDE_MOMU', lambda: PDE_MOM(x_PDE, 0, 0), normalization=1e4,
            weight=1e-2),
        LMS('PDE_MOMV', lambda: PDE_MOM(x_PDE, 1, 0), normalization=1e4,
            weight=1e-2),
        LMS('BCD_u_x0', lambda: BC_D(x_BC_x0, 0, 0, vel_max,
                                     _slc(BCD_noise_x))),
        LMS('BCD_v_x0', lambda: BC_D(x_BC_x0, 1, 0, vel_max,
                                     _slc(BCD_noise_y))),
        LMS('BCD_u_x1', lambda: BC_D(x_BC_x1, 0, 0, vel_max,
                                     _slc(BCD_noise_x))),
        LMS('BCD_v_x1', lambda: BC_D(x_BC_x1, 1, 0, vel_max,
                                     _slc(BCD_noise_y))),
        LMS('BCD_u_y0', lambda: BC_D(x_BC_y0, 0, 0, vel_max,
                                     _slc(BCD_noise_x))),
        LMS('BCD_v_y0', lambda: BC_D(x_BC_y0, 1, 0, vel_max,
                                     _slc(BCD_noise_y))),
        LMS('BCD_u_y1', lambda: BC_D(x_BC_y1, 0, U, vel_max,
                                     BCD_noise_x_up)),
        LMS('BCD_v_y1', lambda: BC_D(x_BC_y1, 1, 0, vel_max,
                                     BCD_noise_y_up)),
    ]
    if collocation:
        losses += [
            LMS('COL_u', lambda: col_velocity(x_col, 0, u_num, vel_max)),
            LMS('COL_v', lambda: col_velocity(x_col, 1, v_num, vel_max)),
        ]
    if press_mode == "Collocation":
        losses += [LMS('COL_p', lambda: col_pressure(x_pres, p_num, p_max))]
    elif press_mode == "Mean":
        losses += [LMS('MEAN_p', lambda: PRESS_MEAN(x_pres, p_mean, p_max),
                       weight=1e-6)]

    loss_test = [
        LMS('u_fit', lambda: exact_value(x_test, 0, u_num, vel_max)),
        LMS('v_fit', lambda: exact_value(x_test, 1, v_num, vel_max)),
        LMS('p_fit', lambda: exact_value(x_test, 2, p_num, p_max)),
    ]

    # ----- training / load mode (reference :256-289) ----------------------
    images = os.path.join(cwd, "Images")
    os.makedirs(images, exist_ok=True)
    loss_image_file = os.path.join(images,
                                   f"{problem_name}_LossTrend.png")
    history_file = os.path.join(images,
                                f"{problem_name}_history_loss.json")
    saved_dir = os.path.join(cwd, "Saved_Model")

    pb = ns.OptimizationProblem(model.variables, losses, loss_test,
                                callbacks=[])
    if not load_mode:
        pb.callbacks.append(ns.utils.HistoryPlotCallback(
            frequency=100, gui=False, filename=loss_image_file,
            filename_history=history_file))
        ns.minimize(pb, 'keras', ns.optimizers.Adam(learning_rate=1e-2),
                    num_epochs=100)
        if second_round == "scipy":
            ns.minimize(pb, 'scipy', 'BFGS', num_epochs=epochs)
        elif second_round == "jax-bfgs":
            ns.minimize(pb, 'jax', 'BFGS', num_epochs=epochs)
        elif second_round != "none":
            ns.minimize(pb, 'jax', 'L-BFGS', num_epochs=epochs)

    if load_mode and model_name_load:
        with open(os.path.join(saved_dir,
                               f"{model_name_load}.json")) as f:
            model = model_from_json(f.read())
        model.load_weights(os.path.join(saved_dir,
                                        f"{model_name_load}.h5"))

    if save_mode and model_name_save:
        os.makedirs(saved_dir, exist_ok=True)
        with open(os.path.join(saved_dir, f"{model_name_save}.json"),
                  "w") as f:
            f.write(model.to_json())
        model.save_weights(os.path.join(saved_dir, f"{model_name_save}.h5"))

    # ----- regular-grid contours (reference :293-360) ---------------------
    if save_plots:
        from tpinn import viz
        from tpinn.oracles import io as oio

        grid_x, grid_y = np.meshgrid(np.linspace(A, B, 100),
                                     np.linspace(A, B, 100))
        csv = oio.read_regular_csv(
            os.path.join(folder, "navier-stokes_cavity_steady_r.csv"))
        my_u = csv["ux"].reshape(grid_x.shape)
        my_v = csv["uy"].reshape(grid_x.shape)
        my_p = csv["p"].reshape(grid_x.shape)
        grid = jnp.asarray(
            np.stack([grid_x.ravel(), grid_y.ravel()], axis=-1), dtype)
        out = np.asarray(model(grid))
        u = out[:, 0].reshape(grid_x.shape) * vel_max
        v = out[:, 1].reshape(grid_x.shape) * vel_max
        p = out[:, 2].reshape(grid_x.shape) * p_max
        viz.contour_compare(
            grid_x, grid_y, [my_u, my_v, my_p], [u, v, p],
            titles=("u-velocity", "v-velocity", "Pressure"),
            problem_name=problem_name,
            filename=os.path.join(images, f"{problem_name}_Contours.png"))

    # ----- recap (reference :363-371) -------------------------------------
    final_test = {n: d["log"][-1]
                  for n, d in pb.history.losses_test.items() if d["log"]}
    print("\nSIMULATION OPTIONS RECAP...")
    print("\tEpochs             ->", epochs)
    print("\tPinns points       ->", NUM_PDE)
    print("\tBoundary points    ->", NUM_BC)
    print("\tCollocation points ->", NUM_COL)
    print("\tPressure points    ->", NUM_PRES)
    print("\tTest points        ->", NUM_TEST)
    pm = float(np.mean(np.asarray(model(x_test))[:, 2]))
    print("\tPressure mean -> {:e}".format(pm))
    print("final test losses:", {k: f"{v:.3e}" for k, v in final_test.items()
                                 if v is not None})
    return pb, model


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--second-round", default="scipy",
                    choices=["scipy", "jax", "jax-bfgs", "none"])
    ap.add_argument("--use-noise", action="store_true")
    ap.add_argument("--press-mode", default="Collocation",
                    choices=["Collocation", "Mean", "None"])
    ap.add_argument("--no-plots", action="store_true")
    ap.add_argument("--load", default="", metavar="NAME")
    ap.add_argument("--save", default="", metavar="NAME")
    args = ap.parse_args()
    main(epochs=args.epochs, use_noise=args.use_noise,
         press_mode=args.press_mode, second_round=args.second_round,
         save_plots=not args.no_plots,
         load_mode=bool(args.load), model_name_load=args.load,
         save_mode=bool(args.save), model_name_save=args.save)
