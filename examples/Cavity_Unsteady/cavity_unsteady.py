"""Unsteady lid-driven cavity, (t, x, y) input — space-time PINN
(reference: Examples/Cavity_Unsteady/cavity_unsteady.py).

U=1, ν=1, T=1e-2, dt=1e-4: 100 time slices × 101² spatial nodes ≈ 10⁶
candidate space-time points; per-timestep exact data from the JAX cavity
oracle in the reference's per-step h5 layout.  Momentum residual gains the
∂t U term (input column 0 = t, reference :188).
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

T_HORIZON = 1e-2
DT = 1e-4

LOSS_GROUPS = {
    "Test_Loss": ["u_test", "v_test", "p_test"],
    "Equations_Residuals": ["PDE_MASS", "PDE_MOMU", "PDE_MOMV"],
    "Initial_Conditions": ["IC_u", "IC_v", "IC_p"],
    "Fitting Loss": ["Fit_u", "Fit_v"],
}


def load_exact(data_dir: str):
    folder = generate.generate_cavity_unsteady(
        data_dir, U=1.0, nu=1.0, T=T_HORIZON, dt=DT, n=100
    )
    n_times = int(round(T_HORIZON / DT))
    return io.read_unsteady_series_h5(folder, n_times)


def build_spec(exact_data) -> CaseSpec:
    return CaseSpec(
        name="Cavity_Unsteady",
        extents=[(0.0, 1.0), (0.0, 1.0)],
        grid_shape=(100, 100),
        physics=NSPhysics(conv=1.0, visc=1.0, time=1.0),
        exact_data=exact_data,
        bnd_val={
            0: {"BOT": 0.0, "DX": 0.0, "TOP": 1.0, "SX": 0.0},
            1: {"BOT": 0.0, "DX": 0.0, "TOP": 0.0, "SX": 0.0},
        },
        # converged weights from Report.pdf Tables 1-2 (BASELINE.md)
        weights={"PDE_MASS": 1e1, "PDE_MOMU": 1e0, "PDE_MOMV": 1e0},
        unsteady=True,
        time_horizon=T_HORIZON,
        dt=DT,
    )


def default_options() -> SimulationOptions:
    # reference run #011: 10000 PDE / 1000 BC / 1000 IC / 50 vel, 5% noise
    return SimulationOptions(
        epochs=5000, noise_fit=0.05, noise_bnd=0.05,
        n_pde=10000, n_bc=1000, n_ic=1000, n_vel=50, n_pres=0, n_test=1000,
    )


def main(epochs=None, save_results=True, base_dir=None, second_round="scipy",
         seed=0, resume_from=None, pde_weights=None):
    cwd = base_dir or os.path.dirname(os.path.abspath(__file__))
    opts_file = os.path.join(cwd, "simulation_options.txt")
    opts = (SimulationOptions.from_file(opts_file)
            if os.path.exists(opts_file) else default_options())
    if epochs is not None:
        opts.epochs = epochs

    exact = load_exact(os.path.join(cwd, "data"))
    spec = build_spec(exact)
    if pde_weights is not None:
        # physics-weighted polish (RESULTS_TPU.md round 4, commit 549f370):
        # boosting the PDE weights makes the noise-free physics dominate the
        # LM least-squares system so the noisy fit/BC rows regularize
        # instead of being overfit.  The winning recipe is mass 1e2,
        # momentum 1e1 (scripts/cavun_polish_scan.py variant 'pde10').
        import dataclasses

        mass, momu, momv = (float(w) for w in pde_weights.split(","))
        spec = dataclasses.replace(
            spec, weights={**spec.weights, "PDE_MASS": mass,
                           "PDE_MOMU": momu, "PDE_MOMV": momv},
        )
    driver = StandardNSDriver(
        spec, opts, base_dir=cwd, save_results=save_results,
        seed=seed, second_round=second_round,
    )
    driver.train(resume_from=resume_from)
    driver.save_artifacts(loss_groups=LOSS_GROUPS)
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
    ap.add_argument("--pde-weights", default=None, metavar="MASS,MOMU,MOMV",
                    help="override the PDE loss weights (e.g. '1e2,1e1,1e1'"
                         " — the physics-weighted LM polish recipe)")
    args = ap.parse_args()
    main(args.epochs, save_results=not args.scratch,
         second_round=args.second_round, seed=args.seed,
         resume_from=args.resume, pde_weights=args.pde_weights)
