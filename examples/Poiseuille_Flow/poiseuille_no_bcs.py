"""Poiseuille variant WITHOUT the inflow Dirichlet condition
(reference: "Examples_Old/Poiseuille/poiseuille - no BCs.py" — the x0
BC_D/BC_N losses are commented out at :153-154,161, so the inflow profile is
recovered from the physics + wall/outflow conditions + noisy velocity-fit
points alone; the low-data thesis of the project).

Config-only variant of the main case: the "SX" entries are simply omitted
from bnd_val, so no loss ever sees the inflow edge.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (reference import sandwich)

import argparse

from tpinn.config import SimulationOptions
from tpinn.driver import CaseSpec, StandardNSDriver
from tpinn.oracles import analytic
from tpinn.pipeline import NSPhysics

PRM = analytic.PoiseuilleParams()

LOSS_GROUPS = {
    "Test_Loss": ["u_test", "v_test", "p_test"],
    "Equations_Residuals": ["PDE_MASS", "PDE_MOMU", "PDE_MOMV"],
    "Fitting Loss": ["Fit_u", "Fit_v"],
}


def build_spec() -> CaseSpec:
    u_f = lambda x: analytic.poiseuille_u(x, PRM)
    v_f = lambda x: analytic.poiseuille_v(x, PRM)
    p_f = lambda x: analytic.poiseuille_p(x, PRM)
    return CaseSpec(
        name="Poiseuille_No_BCs",
        extents=[(0.0, 1.0), (0.0, 0.1)],
        grid_shape=(100, 25),
        physics=NSPhysics(conv=PRM.rho, visc=PRM.mu),
        exact=(u_f, v_f, p_f),
        bnd_val={
            # NO "SX" (inflow) entries — walls + traction outflow only
            0: {"BOT": 0.0, "TOP": 0.0, "DX": PRM.p_out},
            1: {"BOT": 0.0, "TOP": 0.0, "DX": 0.0},
        },
        neumann={("DX", 0): 0, ("DX", 1): 0},
        weights={"PDE_MASS": 1e1},
    )


def default_options() -> SimulationOptions:
    # more fit points than the main case: they carry the inflow information
    return SimulationOptions(
        epochs=10000, noise_fit=1e-3, noise_bnd=0.0,
        n_pde=1000, n_bc=100, n_ic=0, n_vel=50, n_pres=0, n_test=1000,
    )


def main(epochs=None, save_results=True, base_dir=None, second_round="scipy",
         seed=0, resume_from=None):
    import os

    cwd = base_dir or os.path.dirname(os.path.abspath(__file__))
    opts = default_options()
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
                    choices=["scipy", "scipy-parity", "jax", "jax-bfgs", "lm", "adam", "none"])
    ap.add_argument("--scratch", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", default=None, metavar="FOLDER")
    args = ap.parse_args()
    main(args.epochs, save_results=not args.scratch,
         second_round=args.second_round, seed=args.seed,
         resume_from=args.resume)
