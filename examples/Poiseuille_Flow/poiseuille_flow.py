"""Poiseuille (lava channel) flow — the canonical full-pipeline case
(reference: Examples/Poiseuille_Flow/poiseuille_flow.py, SURVEY.md §3.1).

Steady dimensional Navier–Stokes in a 1 × 0.1 channel, ρ=3100, μ=890 (lava),
driven by a 1e6 Pa pressure drop: Dirichlet walls + inflow profile, Neumann
(traction) outflow, optional noisy velocity-fitting points.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (reference import sandwich)

import argparse
import os

from tpinn.config import SimulationOptions
from tpinn.driver import CaseSpec, StandardNSDriver
from tpinn.oracles import analytic
from tpinn.pipeline import NSPhysics

PRM = analytic.PoiseuilleParams()

LOSS_GROUPS = {
    "Test_Loss": ["u_test", "v_test", "p_test"],
    "Equations_Residuals": ["PDE_MASS", "PDE_MOMU", "PDE_MOMV"],
    "Boundary_Cond_U": ["BCD_u_x0", "BCN_u_x1", "BCD_u_y0", "BCD_u_y1"],
    "Boundary_Cond_V": ["BCD_v_x0", "BCN_v_x1", "BCD_v_y0", "BCD_v_y1"],
    "Fitting Loss": ["Fit_u", "Fit_v"],
}


def build_spec() -> CaseSpec:
    u_f = lambda x: analytic.poiseuille_u(x, PRM)
    v_f = lambda x: analytic.poiseuille_v(x, PRM)
    p_f = lambda x: analytic.poiseuille_p(x, PRM)
    return CaseSpec(
        name="Poiseuille_Flow",
        extents=[(0.0, 1.0), (0.0, 0.1)],
        grid_shape=(100, 25),
        physics=NSPhysics(conv=PRM.rho, visc=PRM.mu),
        exact=(u_f, v_f, p_f),
        bnd_val={
            # comp 0 (u): walls no-slip, inflow parabolic profile, outflow
            # traction = P_end = 0 (reference bnd_val, :83-91,117)
            0: {"BOT": 0.0, "TOP": 0.0, "SX": u_f, "DX": PRM.p_out},
            1: {"BOT": 0.0, "TOP": 0.0, "SX": 0.0, "DX": 0.0},
        },
        neumann={("DX", 0): 0, ("DX", 1): 0},  # σ·e_x at the outlet
        weights={"PDE_MASS": 1e1},
    )


def default_options() -> SimulationOptions:
    # reference Examples/Poiseuille_Flow/simulation_options.txt
    return SimulationOptions(
        epochs=10000, noise_fit=0.0, noise_bnd=0.0,
        n_pde=1000, n_bc=100, n_ic=100, n_vel=10, n_pres=0, n_test=1000,
    )


def main(epochs=None, save_results=True, base_dir=None, second_round="scipy",
         seed=0, resume_from=None):
    cwd = base_dir or os.path.dirname(os.path.abspath(__file__))
    opts_file = os.path.join(cwd, "simulation_options.txt")
    opts = (SimulationOptions.from_file(opts_file)
            if os.path.exists(opts_file) else default_options())
    if epochs is not None:
        opts.epochs = epochs

    driver = StandardNSDriver(
        build_spec(), opts, base_dir=cwd, save_results=save_results,
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
    ap.add_argument("--scratch", action="store_true",
                    help="write into Last_Training instead of Test_Case_#NNN")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", default=None, metavar="FOLDER",
                    help="resume: load Weights.h5+history from FOLDER, run only the second round")
    args = ap.parse_args()
    main(args.epochs, save_results=not args.scratch,
         second_round=args.second_round, seed=args.seed,
         resume_from=args.resume)
