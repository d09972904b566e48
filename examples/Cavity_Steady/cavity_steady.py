"""Steady lid-driven cavity, U=500 — FEM-data-driven case
(reference: Examples/Cavity_Steady/cavity_steady.py).

Exact data comes from the JAX-native cavity oracle (tpinn.oracles.cavity)
instead of the reference's absent FEniCS export; the file layout on disk is
identical (navier-stokes_cavity_steady.h5 + _r.csv), generated and cached on
first run.

Physics note: the momentum residual here uses the correct sign
−ν(∂²u/∂x² + ∂²u/∂y²); the reference driver's ``du_xx - du_yy`` expression
(cavity_steady.py:185) flips one viscous term's sign — a bug we do not
replicate.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (reference import sandwich)

import argparse
import os

import numpy as np

from tpinn.config import SimulationOptions
from tpinn.driver import CaseSpec, StandardNSDriver
from tpinn.oracles import generate, io
from tpinn.pipeline import NSPhysics

U_LID = 500.0

LOSS_GROUPS = {
    "Test_Loss": ["u_test", "v_test", "p_test"],
    "Equations_Residuals": ["PDE_MASS", "PDE_MOMU", "PDE_MOMV"],
    "Boundary_Cond_U": ["BCD_u_x0", "BCD_u_x1", "BCD_u_y0", "BCD_u_y1"],
    "Boundary_Cond_V": ["BCD_v_x0", "BCD_v_x1", "BCD_v_y0", "BCD_v_y1"],
    "Fitting Loss": ["Fit_u", "Fit_v", "Fit_p"],
}


def load_exact(data_dir: str, n_solver: int = 128):
    folder = generate.generate_cavity_steady(
        data_dir, U=U_LID, n_solver=n_solver, t_end=40.0
    )
    u, v, p = io.read_fields_h5(
        os.path.join(folder, "navier-stokes_cavity_steady.h5")
    )
    p = p - np.mean(p)  # FEM pressure recentering (reference :105)
    return u, v, p


def build_spec(exact_data) -> CaseSpec:
    return CaseSpec(
        name="Cavity_Steady",
        extents=[(0.0, 1.0), (0.0, 1.0)],
        grid_shape=(100, 100),
        physics=NSPhysics(conv=1.0, visc=1.0),  # ν = 1 (Re = U·L/ν = 500)
        exact_data=exact_data,
        bnd_val={
            0: {"BOT": 0.0, "DX": 0.0, "TOP": U_LID, "SX": 0.0},
            1: {"BOT": 0.0, "DX": 0.0, "TOP": 0.0, "SX": 0.0},
        },
        weights={"PDE_MASS": 1e1},
        pressure_gauge="fit",
    )


def default_options() -> SimulationOptions:
    # reference run #014: 1000 PDE / 1000 BC / 100 vel + 1 pres, 1% noise
    return SimulationOptions(
        epochs=10000, noise_fit=0.01, noise_bnd=0.01,
        n_pde=1000, n_bc=1000, n_ic=100, n_vel=100, n_pres=1, n_test=1000,
    )


def main(epochs=None, save_results=True, base_dir=None, second_round="scipy",
         seed=0, n_solver=128, load_from=None, resume_from=None):
    cwd = base_dir or os.path.dirname(os.path.abspath(__file__))
    opts_file = os.path.join(cwd, "simulation_options.txt")
    opts = (SimulationOptions.from_file(opts_file)
            if os.path.exists(opts_file) else default_options())
    if epochs is not None:
        opts.epochs = epochs

    exact = load_exact(os.path.join(cwd, "data"), n_solver=n_solver)
    driver = StandardNSDriver(
        build_spec(exact), opts, base_dir=cwd, save_results=save_results,
        seed=seed, second_round=second_round,
    )
    if load_from:
        # reference load_mode: reload a trained model and skip training
        # (Examples_Old/Lid_Driven_Cavity/cavity_steady.py:262-279)
        from tpinn.checkpoint import load_experiment

        loaded, history = load_experiment(load_from)
        driver.model.params = loaded.params
        driver.train(skip_training=True, callbacks=False)
        if history is not None:
            driver.pb.history = history
    else:
        driver.train(resume_from=resume_from)

    # exact fields on the plotting grid, from the cached oracle csv
    csv = io.read_regular_csv(
        os.path.join(cwd, "data", "SteadyCase",
                     "navier-stokes_cavity_steady_r.csv")
    )
    shape = (100, 100)
    p_grid = csv["p"].reshape(shape)
    exact_grids = (
        csv["ux"].reshape(shape),
        csv["uy"].reshape(shape),
        p_grid - np.mean(p_grid),
    )
    driver.save_artifacts(loss_groups=LOSS_GROUPS, exact_grids=exact_grids)
    print("final test losses:", driver.final_test_losses())
    return driver


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--second-round", default="scipy",
                    choices=["scipy", "scipy-parity", "jax", "jax-bfgs",
                             "lm", "adam", "none"],
                    help="second optimizer round. 'scipy' routes to the"
                         " resumable on-device dense BFGS (host-scipy"
                         " optimizer state cannot be checkpointed, so a"
                         " killed round would lose its Hessian);"
                         " 'scipy-parity' forces the reference's"
                         " host-scipy round")
    ap.add_argument("--scratch", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", default=None, metavar="FOLDER",
                    help="resume: load Weights.h5+history from FOLDER, run only the second round")
    ap.add_argument("--n-solver", type=int, default=128)
    ap.add_argument("--load", default=None, metavar="FOLDER",
                    help="reload a saved experiment and skip training")
    args = ap.parse_args()
    main(args.epochs, save_results=not args.scratch,
         second_round=args.second_round, seed=args.seed,
         n_solver=args.n_solver, load_from=args.load,
         resume_from=args.resume)
