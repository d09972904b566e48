"""Coronary stenosis flow — mesh-driven steady NS case
(reference: Examples/Coronary_Flow/coronary_flow_steady.py).

Domain nodes come from the gmsh stenosis mesh (coroParam.msh), labeled
boundary points from bpoints.npy (flags 0=NOSL, 1=INF, 2=OUT1, 3=OUT2,
reference :141-146).  Exact data is produced by the tpinn.oracles.coronary
P1-FEM solver on the same mesh.  Demonstrates the lower-level pipeline API
(mesh domains are beyond StandardNSDriver's rectangle world):

* rotated parabolic inflow Dirichlet profile (:72-75, 123-124);
* traction outflow losses with the oblique normal n=(2,1) on OUT1 and
  n=(1,0) on OUT2, weight 1e-3 (:213-227, 245-255);
* PDE weights 1e2 (mass) / 1e1 (momentum);
* exports the PINN solution as sol_pinn.h5 (:291-295) and tricontourf
  comparison figures (:363-383).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (reference import sandwich)

import argparse
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

import tpinn as ns
from tpinn import experiment, viz
from tpinn.config import SimulationOptions
from tpinn.geometry import Normalization, generate_noise, split_indices
from tpinn.oracles import coronary as coro
from tpinn.oracles import io as oio
from tpinn.oracles.mesh import read_gmsh
from tpinn.pipeline import (
    NSPhysics,
    ResidualBundle,
    dirichlet_residual,
    mass_residual,
    momentum_residual,
    neumann_residual,
)

PRM = coro.CoronaryParams()

LOSS_GROUPS = {
    "Test_Loss": ["u_test", "v_test", "p_test"],
    "Equations_Residuals": ["PDE_MASS", "PDE_MOMU", "PDE_MOMV"],
    "Boundary_Dirichlet": ["BCD_u_NS", "BCD_v_NS", "BCD_u_IN", "BCD_v_IN"],
    "Boundary_Neumann": ["BCN_u_OUT1", "BCN_v_OUT1", "BCN_u_OUT2", "BCN_v_OUT2"],
    "Fitting Loss": ["Fit_u", "Fit_v"],
}

HERE = os.path.dirname(os.path.abspath(__file__))
DEFAULT_MSH = os.path.join(HERE, "coroParam.msh")


def _asset_paths(cwd):
    msh = os.path.join(cwd, "coroParam.msh")
    bpts = os.path.join(cwd, "bpoints.npy")
    if not os.path.exists(msh):
        if os.path.exists(DEFAULT_MSH):
            shutil.copy(DEFAULT_MSH, msh)
        else:
            # no mesh shipped: REGENERATE it from the parametric stenosis
            # geometry (tpinn.oracles.coro_param re-implements
            # coroParam.geo's sten1/sten2 Bézier loop + a DistMesh-style
            # mesher — no gmsh, no reference-checkout fallback)
            from tpinn.oracles.coro_param import generate_coro_msh

            print("coroParam.msh not found — regenerating from the "
                  "parametric geometry (takes ~20 min at full density)")
            generate_coro_msh(msh)
    if not os.path.exists(bpts):
        # derive labeled boundary points from the mesh itself (parity with
        # the reference file is pinned by tests/test_reference_parity.py).
        # A regenerated mesh places boundary nodes on the exact geometry
        # but through linear interpolation arithmetic — the predicate
        # tolerance is loosened accordingly (committed-mesh nodes sit at
        # machine precision, so the loose tol is equivalent there).
        from tpinn.oracles.coronary import generate_bpoints

        np.save(bpts, generate_bpoints(msh, tol=1e-9))
    return msh, bpts


def default_options() -> SimulationOptions:
    # reference run #123: 3000 PDE / 800 BC / 50 vel fit, 1% noise, 30k epochs
    return SimulationOptions(
        epochs=30000, noise_fit=0.01, noise_bnd=0.0,
        n_pde=3000, n_bc=800, n_ic=0, n_vel=50, n_pres=0, n_test=2000,
    )


def main(epochs=None, save_results=True, base_dir=None, second_round="scipy",
         seed=0, resume_from=None, refine=0, noise_bnd=None, adam_lr=1e-2):
    cwd = base_dir or HERE
    msh_path, bpts_path = _asset_paths(cwd)
    opts_file = os.path.join(cwd, "simulation_options.txt")
    opts = (SimulationOptions.from_file(opts_file)
            if os.path.exists(opts_file) else default_options())
    if epochs is not None:
        opts.epochs = epochs
    if noise_bnd is not None:  # reference run #123 uses 0.01
        opts.noise_bnd = noise_bnd

    # ----- mesh + oracle data (generated and cached on first run)
    data_dir = os.path.join(cwd, "data")
    folder_h5 = coro.generate_coronary(data_dir, msh_path, bpts_path, PRM,
                                       refine=refine)
    h5_path = os.path.join(folder_h5, "steady_coronary_steady.h5")
    dtype = ns.config.get_dtype()
    nodes = oio.read_mesh_geometry_h5(h5_path)
    u_ex_np, v_ex_np, p_ex_np = oio.read_fields_h5(h5_path)
    dom_grid = jnp.asarray(nodes, dtype=dtype)
    u_ex, v_ex, p_ex = (jnp.asarray(a, dtype=dtype)
                        for a in (u_ex_np, v_ex_np, p_ex_np))

    key = jax.random.PRNGKey(seed)
    k_split, k_noise = jax.random.split(key)
    idx_set = split_indices(k_split, dom_grid.shape[0], opts.n_pts)

    norm = Normalization(u_ex, v_ex, p_ex)
    nv, npre = norm.norm_vel, norm.norm_pre
    sol_norm = [u_ex / nv, v_ex / nv, p_ex / npre]

    # ----- labeled boundary points (reference :141-146)
    bnd = {k: jnp.asarray(v, dtype=dtype)
           for k, v in oio.load_bpoints(bpts_path).items()}
    u_in, v_in = coro.inflow_profile(np.asarray(bnd["INF"]), PRM)
    bnd_val = {
        0: {"NOSL": jnp.zeros(bnd["NOSL"].shape[0], dtype=dtype),
            "INF": jnp.asarray(u_in, dtype=dtype) / nv},
        1: {"NOSL": jnp.zeros(bnd["NOSL"].shape[0], dtype=dtype),
            "INF": jnp.asarray(v_in, dtype=dtype) / nv},
    }

    kf = jax.random.split(k_noise, 2)
    iv = jnp.asarray(idx_set["Vel"])
    sol_noise = [
        jnp.take(sol_norm[0], iv) + generate_noise(kf[0], len(iv), opts.noise_fit),
        jnp.take(sol_norm[1], iv) + generate_noise(kf[1], len(iv), opts.noise_fit),
    ]
    if opts.noise_bnd:
        # boundary-target noise (reference :162-163: every Dirichlet group's
        # bnd_val gets noise_factor_bnd * N(0,1) per component)
        kb = jax.random.split(jax.random.fold_in(k_noise, 1), 4)
        for ki, (comp, grp) in enumerate(
                [(0, "NOSL"), (1, "NOSL"), (0, "INF"), (1, "INF")]):
            bnd_val[comp][grp] = bnd_val[comp][grp] + generate_noise(
                kb[ki], bnd_val[comp][grp].shape[0], opts.noise_bnd)

    # ----- model + losses (mesh bounding box folds input normalization
    # into the layer-0 init, see tpinn.models.Model.init)
    dg = np.asarray(dom_grid)
    model = ns.models.MLP(
        2, 3, width=32, depth=3, seed=seed,
        input_extents=[(dg[:, 0].min(), dg[:, 0].max()),
                       (dg[:, 1].min(), dg[:, 1].max())],
    )
    physics = NSPhysics(conv=1.0, visc=PRM.ni)

    x_pde = jnp.take(dom_grid, jnp.asarray(idx_set["PDE"]), axis=0)
    pde_bundle = ResidualBundle(model, x_pde)
    out1_bundle = ResidualBundle(model, bnd["OUT1"])
    out2_bundle = ResidualBundle(model, bnd["OUT2"])
    n_out1 = jnp.array([2.0, 1.0], dtype=dtype)  # oblique, unnormalized (:216)
    n_out2 = jnp.array([1.0, 0.0], dtype=dtype)

    # per-point residual protocol: lets the LM round build JᵀJ/JᵀR from
    # per-point reverse passes (~10-25x faster f64-on-TPU iteration than the
    # chunked forward-mode jacobian — see tpinn.optimize._minimize_jax_lm)
    from tpinn.pipeline import (
        dirichlet_point_residual,
        neumann_point_residual,
        pde_point_residuals,
    )

    p_mass, p_momu, p_momv = pde_point_residuals(model, physics, norm)

    def dir_pr(comp, x, rhs):
        r = jnp.broadcast_to(jnp.asarray(rhs, x.dtype), (x.shape[0],))
        return (dirichlet_point_residual(model, comp), (x, r))

    def neu_pr(comp, x, n):
        z = jnp.zeros((x.shape[0],), x.dtype)
        return (neumann_point_residual(model, comp, n, physics, norm), (x, z))

    LMS = ns.LossMeanSquares
    losses = [
        LMS("PDE_MASS", lambda: mass_residual(pde_bundle, norm), weight=1e2,
            point_residual=(p_mass, (x_pde,))),
        LMS("PDE_MOMU", lambda: momentum_residual(pde_bundle, 0, physics, norm), weight=1e1,
            point_residual=(p_momu, (x_pde,))),
        LMS("PDE_MOMV", lambda: momentum_residual(pde_bundle, 1, physics, norm), weight=1e1,
            point_residual=(p_momv, (x_pde,))),
        LMS("BCD_u_NS", lambda: dirichlet_residual(model, bnd["NOSL"], 0, bnd_val[0]["NOSL"]),
            point_residual=dir_pr(0, bnd["NOSL"], bnd_val[0]["NOSL"])),
        LMS("BCD_v_NS", lambda: dirichlet_residual(model, bnd["NOSL"], 1, bnd_val[1]["NOSL"]),
            point_residual=dir_pr(1, bnd["NOSL"], bnd_val[1]["NOSL"])),
        LMS("BCD_u_IN", lambda: dirichlet_residual(model, bnd["INF"], 0, bnd_val[0]["INF"]),
            point_residual=dir_pr(0, bnd["INF"], bnd_val[0]["INF"])),
        LMS("BCD_v_IN", lambda: dirichlet_residual(model, bnd["INF"], 1, bnd_val[1]["INF"]),
            point_residual=dir_pr(1, bnd["INF"], bnd_val[1]["INF"])),
        LMS("BCN_u_OUT1", lambda: neumann_residual(out1_bundle, 0, n_out1, physics, norm), weight=1e-3,
            point_residual=neu_pr(0, bnd["OUT1"], n_out1)),
        LMS("BCN_v_OUT1", lambda: neumann_residual(out1_bundle, 1, n_out1, physics, norm), weight=1e-3,
            point_residual=neu_pr(1, bnd["OUT1"], n_out1)),
        LMS("BCN_u_OUT2", lambda: neumann_residual(out2_bundle, 0, n_out2, physics, norm), weight=1e-3,
            point_residual=neu_pr(0, bnd["OUT2"], n_out2)),
        LMS("BCN_v_OUT2", lambda: neumann_residual(out2_bundle, 1, n_out2, physics, norm), weight=1e-3,
            point_residual=neu_pr(1, bnd["OUT2"], n_out2)),
    ]
    x_vel = jnp.take(dom_grid, iv, axis=0)
    if opts.fit_velocity:
        losses += [
            LMS("Fit_u", lambda: dirichlet_residual(model, x_vel, 0, sol_noise[0]),
                point_residual=dir_pr(0, x_vel, sol_noise[0])),
            LMS("Fit_v", lambda: dirichlet_residual(model, x_vel, 1, sol_noise[1]),
                point_residual=dir_pr(1, x_vel, sol_noise[1])),
        ]
    it = jnp.asarray(idx_set["Test"])
    x_test = jnp.take(dom_grid, it, axis=0)
    losses_test = [
        LMS("u_test", lambda: dirichlet_residual(model, x_test, 0, jnp.take(sol_norm[0], it))),
        LMS("v_test", lambda: dirichlet_residual(model, x_test, 1, jnp.take(sol_norm[1], it))),
        LMS("p_test", lambda: dirichlet_residual(model, x_test, 2, jnp.take(sol_norm[2], it))),
    ]

    # ----- train (resume_from: hybrid stage B — reload weights+history,
    # skip Adam, run only the second round; see tpinn.driver.train)
    if resume_from is not None:
        folder = resume_from
    else:
        folder = experiment.prepare_folder(cwd, save_results)
    pb = ns.OptimizationProblem(model.variables, losses, losses_test, callbacks=[])
    if resume_from is not None:
        from tpinn.history import History

        weights_path = os.path.join(resume_from, "Weights.h5")
        model.load_weights(weights_path)
        ckpt_path = os.path.join(resume_from, "checkpoint.pkl")
        if (os.path.exists(ckpt_path)
                and os.path.getmtime(ckpt_path) > os.path.getmtime(weights_path)):
            # a killed round leaves checkpoint.pkl ahead of the final-save
            # Weights.h5 — resume from the fresher crash-recovery state
            # (cast to the model dtype: stage-A checkpoints are float32)
            from tpinn.checkpoint import load_checkpoint

            ckpt = load_checkpoint(ckpt_path)
            model.variables.set(jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, model.dtype), ckpt["params"]))
            # tagged optimizer state (LM theta64+mu / dense-BFGS carry):
            # a matching second round continues exactly — in particular the
            # split-carry sub-ulp lo channel survives the process restart
            pb.resume_opt_state = ckpt.get("opt_state")
        hist_path = os.path.join(resume_from, "History_Loss.json")
        if os.path.exists(hist_path):
            pb.history = History.load(hist_path)
            pb.history.register_losses(losses, losses_test)
    pb.callbacks.append(ns.utils.HistoryPlotCallback(
        frequency=100, gui=False,
        filename=os.path.join(folder, "Loss_Trend_Full.png"),
        filename_history=os.path.join(folder, "History_Loss.json"),
    ))
    # periodic full-state flush: a killed long round can resume from
    # checkpoint.pkl instead of losing everything since the last Weights.h5
    pb.callbacks.append(ns.utils.CheckpointCallback(
        os.path.join(folder, "checkpoint.pkl"), frequency=100))
    if resume_from is None:
        ns.minimize(pb, "keras", ns.optimizers.Adam(learning_rate=1e-2), num_epochs=100)
    # single shared routing table (tpinn.driver.run_second_round): 'scipy'
    # → resumable on-device dense BFGS, 'scipy-parity' → host scipy round,
    # unknown names raise instead of silently skipping the round
    ns.driver.run_second_round(pb, second_round, opts.epochs, adam_lr=adam_lr)

    # ----- artifacts
    ns.checkpoint.save_experiment(folder, model, pb.history,
                                  opt_state=pb.last_opt_state)
    out = np.asarray(model(dom_grid))
    import h5py

    with h5py.File(os.path.join(folder, "sol_pinn.h5"), "w") as hf:
        hf.create_dataset("u_pinn", data=out[:, 0] * nv)
        hf.create_dataset("v_pinn", data=out[:, 1] * nv)
        hf.create_dataset("p_pinn", data=out[:, 2] * npre)
    viz.tricontour_compare(
        nodes[:, 0], nodes[:, 1],
        (u_ex_np, v_ex_np, p_ex_np),
        (out[:, 0] * nv, out[:, 1] * nv, out[:, 2] * npre),
        problem_name="Coronary_Flow",
        filename=os.path.join(folder, "Graphic.jpg"),
    )
    viz.plot_loss_groups(
        pb.history.to_dict(), LOSS_GROUPS,
        filename=os.path.join(folder, "Loss_Trend_Reduced.png"),
    )
    experiment.write_recap(folder, "Coronary_Flow", opts.epochs, opts.n_pts,
                           noise_fit=opts.noise_fit, noise_bnd=opts.noise_bnd,
                           echo=False)
    final = {k: v["log"][-1] for k, v in pb.history.losses_test.items()}
    print("final test losses:", final)
    return pb, model


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--second-round", default="scipy",
                    choices=list(ns.driver.SECOND_ROUND_CHOICES),
                    help="second optimizer round. 'scipy' routes to the"
                         " resumable on-device dense BFGS (host-scipy"
                         " optimizer state cannot be checkpointed, so a"
                         " killed round would lose its Hessian);"
                         " 'scipy-parity' forces the reference's"
                         " host-scipy round")
    ap.add_argument("--scratch", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", default=None, metavar="FOLDER")
    ap.add_argument("--refine", type=int, default=0,
                    help="oracle mesh refinement levels (data folder "
                         "SteadyCase_r<k>)")
    ap.add_argument("--noise-bnd", type=float, default=None,
                    help="boundary-target noise factor (reference #123: 0.01)")
    ap.add_argument("--adam-lr", type=float, default=1e-2,
                    help="peak lr for --second-round adam (cosine decay); "
                         "resume anneals want ~3e-4")
    args = ap.parse_args()
    main(args.epochs, save_results=not args.scratch,
         second_round=args.second_round, seed=args.seed,
         resume_from=args.resume, refine=args.refine,
         noise_bnd=args.noise_bnd, adam_lr=args.adam_lr)
