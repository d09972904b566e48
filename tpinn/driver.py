"""Config-driven standard case driver.

Each reference driver is a ~300–490-line script repeating 13 pipeline stages
(SURVEY.md §2.2).  ``StandardNSDriver`` implements those stages once for
rectangular (optionally space-time) domains; an example case is then ~60
lines of configuration (see examples/).  Mesh-based cases (coronary) use the
lower-level tpinn.pipeline primitives directly.

Stage parity map (reference line refs → here):
  1  experiment-folder autonumbering (poiseuille_flow.py:20-33) → tpinn.experiment
  2  simulation_options.txt         (:37-58)  → tpinn.config.SimulationOptions
  3  grid + index splits            (:95-109) → tpinn.geometry
  4  exact-solution ingestion       (:113-121)→ CaseSpec.exact / exact_data
  5  spread normalization           (:125-132)→ tpinn.geometry.Normalization
  6  noise injection                (:153-165)→ tpinn.geometry.generate_noise
  7  loss construction              (:169-258)→ tpinn.pipeline builders
  8  model                          (:228-233)→ tpinn.models.MLP
  9  two-round training             (:269-270)→ tpinn.optimize.minimize
  10 checkpointing                  (:272-275)→ tpinn.checkpoint.save_experiment
  11 post-processing contours       (:280-350)→ tpinn.viz.contour_compare
  12 loss-trend plot                (:357-385)→ tpinn.viz.plot_loss_groups
  13 recap                          (:389-406)→ tpinn.experiment.write_recap
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from tpinn import checkpoint as ckpt
from tpinn import experiment, viz
from tpinn.config import SimulationOptions
from tpinn.geometry import (
    Normalization,
    generate_noise,
    initial_condition_points,
    rect_boundary_points,
    rect_grid,
    space_time_grid,
    split_indices,
)
from tpinn.losses import Loss, LossMeanSquares
from tpinn.models import MLP, Model
from tpinn.optimize import minimize
from tpinn.optimizers import Adam
from tpinn.pipeline import (
    NSPhysics,
    ResidualBundle,
    dirichlet_residual,
    mass_residual,
    momentum_residual,
    neumann_residual,
    pressure_mean_penalty,
)
from tpinn.problem import OptimizationProblem
from tpinn.utils import CheckpointCallback, HistoryPlotCallback

BndValue = Union[float, Callable, None]


def _scaled(residual, scale):
    """Apply the exact mask-scale from sharding.shard_pair (identity when
    scale is None — the single-device / already-divisible path)."""
    return residual if scale is None else residual * scale


SECOND_ROUND_CHOICES = (
    "scipy", "scipy-parity", "scipy-host", "jax", "jax-bfgs", "bfgs",
    "lm", "jax-lm", "gn", "adam", "none",
)


def run_second_round(pb, second_round: Optional[str], epochs: int,
                     scipy_method: str = "BFGS", adam_lr: float = 1e-2):
    """Single routing table for the second optimizer round, shared by
    ``StandardNSDriver.train`` and the mesh-case example CLIs (the coronary
    example's hand-rolled copy silently no-op'd on ``scipy-parity`` and ran
    the host round for ``scipy`` — the opposite of the documented
    semantics).  Raises on an unknown name instead of skipping silently.

    * ``scipy``        → resumable ON-DEVICE dense BFGS / L-BFGS.  The host
      scipy optimizer state cannot be checkpointed (scipy owns it), so a
      killed 30k-iteration round would resume from params only, losing the
      Hessian approximation; the on-device carries checkpoint-resume exactly.
    * ``scipy-parity`` / ``scipy-host`` → the reference's actual host-scipy
      round (``scipy_*`` history labels).
    * ``jax``          → on-device L-BFGS.
    * ``jax-bfgs`` / ``bfgs`` → on-device dense BFGS.
    * ``lm`` / ``jax-lm`` / ``gn`` → Levenberg–Marquardt (epochs = LM
      iterations; tens suffice where (L-)BFGS needs 1e4–1e5).
    * ``adam``         → long cosine-decay Adam round (hybrid stage A).
    * ``none`` / None  → no second round.
    """
    if second_round in ("none", None):
        return
    if second_round == "scipy":
        method = ("BFGS" if scipy_method.upper() == "BFGS" else "L-BFGS")
        minimize(pb, "jax", method, num_epochs=epochs)
    elif second_round in ("scipy-parity", "scipy-host"):
        minimize(pb, "scipy", scipy_method, num_epochs=epochs)
    elif second_round == "jax":
        minimize(pb, "jax", "L-BFGS", num_epochs=epochs)
    elif second_round in ("jax-bfgs", "bfgs"):
        minimize(pb, "jax", "BFGS", num_epochs=epochs)
    elif second_round in ("lm", "jax-lm", "gn"):
        minimize(pb, "jax", "LM", num_epochs=epochs)
    elif second_round == "adam":
        import optax

        sched = optax.cosine_decay_schedule(adam_lr, max(epochs, 1),
                                            alpha=1e-3)
        minimize(pb, "keras", optax.adam(sched), num_epochs=epochs)
    else:
        raise ValueError(
            f"unknown second_round {second_round!r}; "
            f"choices: {SECOND_ROUND_CHOICES}"
        )


@dataclasses.dataclass
class CaseSpec:
    """Declarative description of a rectangular Navier–Stokes PINN case."""

    name: str
    extents: Sequence[Tuple[float, float]]
    physics: NSPhysics = NSPhysics()
    grid_shape: Tuple[int, int] = (100, 100)
    # exact solution: callables (u, v, p)(points)->(N,) or precomputed arrays
    exact: Optional[Tuple[Callable, Callable, Callable]] = None
    exact_data: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None
    # Dirichlet boundary values per component {0: {edge: value}, 1: {...}}
    # value: float | callable(points)->(N,) | None (edge handled by Neumann)
    bnd_val: Optional[Dict[int, Dict[str, BndValue]]] = None
    # Neumann specs {(edge, component): direction}; rhs comes from bnd_val
    neumann: Dict[Tuple[str, int], object] = dataclasses.field(default_factory=dict)
    weights: Dict[str, float] = dataclasses.field(default_factory=dict)
    unsteady: bool = False
    time_horizon: float = 0.0
    dt: float = 0.0
    width: int = 32
    depth: int = 3
    pressure_gauge: Optional[str] = None  # None | 'fit' | 'mean'
    uniform_mesh: bool = True

    @property
    def dim_in(self) -> int:
        return 3 if self.unsteady else 2

    def weight(self, key: str, default: float = 1.0) -> float:
        return float(self.weights.get(key, default))


class StandardNSDriver:
    def __init__(
        self,
        spec: CaseSpec,
        opts: SimulationOptions,
        base_dir: str = ".",
        save_results: bool = True,
        seed: int = 0,
        second_round: str = "scipy",  # 'scipy' | 'jax' | 'none'
        scipy_method: str = "BFGS",
        adam_epochs: int = 100,
        adam_lr: float = 1e-2,
        mesh=None,
    ):
        self.spec = spec
        self.opts = opts
        self.base_dir = base_dir
        self.save_results = save_results
        self.seed = seed
        self.second_round = second_round
        self.scipy_method = scipy_method
        self.adam_epochs = adam_epochs
        self.adam_lr = adam_lr
        self.mesh = mesh
        self.folder: Optional[str] = None
        self._build()
        if mesh is not None:
            from tpinn import sharding as shd

            self.model.params = shd.replicate(self.model.params, mesh)

    def _maybe_shard(self, arr):
        """Point-axis data parallelism for the FUSED PDE path: place a point
        batch sharded over the mesh, tail-padded up to the device count.
        The fused kernels mask the padding rows via their dynamic valid-row
        count and use the true count as the mean denominator
        (tpinn.sharding.sharded_ns_*), so the sharded objective is the
        EXACT single-device mean for any batch length.  Rhs-paired batches
        and the jet-path PDE batch go through :meth:`_shard_pair` instead,
        whose mask-scale rows give the same exactness on the XLA path."""
        if self.mesh is None or arr.shape[0] == 0:
            return arr
        from tpinn import sharding as shd

        return shd.shard_points(arr, self.mesh, pad=True)

    def _shard_pair(self, x, *rhs):
        """Shard an rhs-paired batch with exact mask-scale padding
        (tpinn.sharding.shard_pair): any length scales across the mesh and
        the loss mean is mathematically unchanged.  Returns
        ``(x, *rhs, scale)``; scale is None off-mesh or when no padding was
        needed — residual closures multiply by it when set."""
        if self.mesh is None or x.shape[0] == 0:
            return (x, *rhs, None)
        from tpinn import sharding as shd

        xs, rs, scale = shd.shard_pair(x, rhs, self.mesh)
        return (xs, *rs, scale)

    # ------------------------------------------------------------------ build
    def _build(self) -> None:
        spec, opts = self.spec, self.opts
        key = jax.random.PRNGKey(self.seed)
        (
            k_grid,
            k_split,
            k_bnd,
            k_ic,
            k_noise_b,
            k_noise_f,
        ) = jax.random.split(key, 6)

        # stage 3: grid
        if spec.unsteady:
            n1, n2 = spec.grid_shape
            (lx, ux), (ly, uy) = spec.extents
            t_vec = np.arange(0.0, spec.time_horizon, step=spec.dt)
            x_vec = np.linspace(lx, ux, n1 + 1)
            y_vec = np.linspace(ly, uy, n2 + 1)
            self.dom_grid = space_time_grid(t_vec, x_vec, y_vec)
        else:
            self.dom_grid = rect_grid(
                spec.extents, spec.grid_shape, spec.uniform_mesh, k_grid
            )
        n_total = self.dom_grid.shape[0]
        self.idx_set = split_indices(k_split, n_total, opts.n_pts)

        # stage 4: exact solution on the grid
        if spec.exact_data is not None:
            u_ex, v_ex, p_ex = (jnp.asarray(a) for a in spec.exact_data)
        elif spec.exact is not None:
            u_f, v_f, p_f = spec.exact
            u_ex = jnp.asarray(u_f(self.dom_grid))
            v_ex = jnp.asarray(v_f(self.dom_grid))
            p_ex = jnp.asarray(p_f(self.dom_grid))
        else:
            raise ValueError("CaseSpec needs exact callables or exact_data")
        self.exact_fields = (u_ex, v_ex, p_ex)

        # stage 5: normalization
        self.norm = Normalization(u_ex, v_ex, p_ex)
        nv, npre = self.norm.norm_vel, self.norm.norm_pre
        self.sol_norm = [u_ex / nv, v_ex / nv, p_ex / npre]

        # stage 6/7: boundary points + values (+ noise)
        self.bnd_pts = rect_boundary_points(
            k_bnd,
            spec.extents,
            opts.n_bc,
            time_horizon=spec.time_horizon if spec.unsteady else None,
        )
        self.bnd_val_num: Dict[int, Dict[str, jnp.ndarray]] = {0: {}, 1: {}}
        nk = jax.random.split(k_noise_b, 8)
        i = 0
        for comp in (0, 1):
            for edge, value in (spec.bnd_val or {}).get(comp, {}).items():
                pts = self.bnd_pts[edge]
                # Dirichlet values live in normalized space (reference divides
                # by norm_vel, poiseuille_flow.py:146-149); Neumann rhs stays
                # physical — it is subtracted from the physical traction
                # inside neumann_residual before the residual rescale.
                is_neumann = (edge, comp) in spec.neumann
                scale = 1.0 if is_neumann else 1.0 / nv
                if value is None:
                    base = jnp.zeros(pts.shape[0], dtype=pts.dtype)
                elif callable(value):
                    base = jnp.asarray(value(pts)) * scale
                else:
                    base = jnp.full(pts.shape[0], float(value) * scale, dtype=pts.dtype)
                base = base + generate_noise(
                    nk[i % 8], pts.shape[0], opts.noise_bnd
                )
                i += 1
                self.bnd_val_num[comp][edge] = base

        if spec.unsteady and opts.n_ic:
            self.ic_pts = initial_condition_points(k_ic, spec.extents, opts.n_ic)
        else:
            self.ic_pts = None

        # fitting targets with noise (stage 6)
        kf = jax.random.split(k_noise_f, 3)
        iv, ip = self.idx_set["Vel"], self.idx_set["Pres"]
        self.sol_noise = [
            jnp.take(self.sol_norm[0], iv) + generate_noise(kf[0], len(iv), opts.noise_fit),
            jnp.take(self.sol_norm[1], iv) + generate_noise(kf[1], len(iv), opts.noise_fit),
            jnp.take(self.sol_norm[2], ip) + generate_noise(kf[2], len(ip), opts.noise_fit),
        ]

        # stage 8: model — input extents folded into the layer-0 init
        # (normalized-input conditioning; see tpinn.models.Model.init)
        in_extents = (
            ([(0.0, spec.time_horizon)] if spec.unsteady else [])
            + [tuple(e) for e in spec.extents]
        )
        self.model = MLP(
            spec.dim_in, 3, width=spec.width, depth=spec.depth,
            seed=self.seed, input_extents=in_extents,
        )

        # stage 7: losses
        self.losses, self.losses_test = self._build_losses()

    def _build_losses(self):
        spec, opts = self.spec, self.opts
        model, norm = self.model, self.norm
        LMS = LossMeanSquares

        x_pde_raw = jnp.take(
            self.dom_grid, jnp.asarray(self.idx_set["PDE"]), axis=0
        )
        n_pde_true = int(x_pde_raw.shape[0])

        losses = []
        if opts.use_collloss:
            from tpinn.losses import PrecomputedMeanSquares
            from tpinn.pipeline import use_fused_pde_losses

            # the LM round builds the stacked residual vector from every
            # training loss (optimize._flat_residual_fn) — the fused Pallas
            # kernel only exposes the three PDE MSE scalars, so an LM-bound
            # driver must keep the jet residual path (this is what crashed
            # lane_tpu18: f64 LM resume on Poiseuille/Cavity hit
            # PrecomputedMeanSquares and aborted)
            wants_residuals = self.second_round in ("lm", "jax-lm", "gn")
            if not wants_residuals and use_fused_pde_losses(
                    model, spec.unsteady, spec.dim_in, self.mesh):
                # fused Pallas path, round 3: the ONE-PASS weighted
                # objective — loss + log MSEs + parameter grads from one
                # kernel launch (3 propagation units instead of fwd+bwd's
                # 4 — pipeline.FusedNSWeightedObjective).  Under a mesh the
                # same kernel runs per point shard via shard_map with
                # psum'd values/grads and exact tail-padding masks.
                from tpinn.pipeline import FusedNSWeightedObjective

                fused = FusedNSWeightedObjective(
                    model, self._maybe_shard(x_pde_raw), spec.physics, norm,
                    weights=(spec.weight("PDE_MASS", 1e1),
                             spec.weight("PDE_MOMU", 1e0),
                             spec.weight("PDE_MOMV", 1e0)),
                    mesh=self.mesh, n_true=n_pde_true,
                )
                f_mass, f_momu, f_momv = fused.loss_fns()
                losses += [
                    PrecomputedMeanSquares("PDE_MASS", f_mass,
                                           weight=spec.weight("PDE_MASS", 1e1)),
                    PrecomputedMeanSquares("PDE_MOMU", f_momu,
                                           weight=spec.weight("PDE_MOMU", 1e0)),
                    PrecomputedMeanSquares("PDE_MOMV", f_momv,
                                           weight=spec.weight("PDE_MOMV", 1e0)),
                ]
            else:
                # jet path: the PDE batch shards with the same exact
                # mask-scale rows as every rhs-paired batch, and the
                # point_residual protocol (the LM fast Gram) stays
                # available under a mesh — padding rows carry scale 0, so
                # they contribute neither residual nor Gram rows.
                from tpinn.pipeline import (
                    pde_point_residuals,
                    scaled_point_residual,
                )

                x_pde, s_pde = self._shard_pair(x_pde_raw)
                pde_bundle = ResidualBundle(
                    model, x_pde, unsteady=spec.unsteady
                )
                p_mass, p_momu, p_momv = pde_point_residuals(
                    model, spec.physics, norm, spec.unsteady)
                if s_pde is None:
                    pde_pr = [(p, (x_pde,))
                              for p in (p_mass, p_momu, p_momv)]
                else:
                    pde_pr = [(scaled_point_residual(p), (x_pde, s_pde))
                              for p in (p_mass, p_momu, p_momv)]
                losses += [
                    LMS("PDE_MASS", lambda: _scaled(
                        mass_residual(pde_bundle, norm), s_pde),
                        weight=spec.weight("PDE_MASS", 1e1),
                        point_residual=pde_pr[0]),
                    LMS("PDE_MOMU", lambda: _scaled(
                        momentum_residual(pde_bundle, 0, spec.physics, norm),
                        s_pde),
                        weight=spec.weight("PDE_MOMU", 1e0),
                        point_residual=pde_pr[1]),
                    LMS("PDE_MOMV", lambda: _scaled(
                        momentum_residual(pde_bundle, 1, spec.physics, norm),
                        s_pde),
                        weight=spec.weight("PDE_MOMV", 1e0),
                        point_residual=pde_pr[2]),
                ]

        from tpinn.pipeline import (
            dirichlet_point_residual,
            neumann_point_residual,
            scaled_point_residual,
        )

        def _dir_pr(comp, x, rhs, scale):
            """point_residual for a Dirichlet-style loss; under a mesh the
            trailing mask-scale row keeps the per-point stack exact."""
            r = jnp.broadcast_to(jnp.asarray(rhs, x.dtype), (x.shape[0],))
            fn = dirichlet_point_residual(model, comp)
            if scale is None:
                return (fn, (x, r))
            return (scaled_point_residual(fn), (x, r, scale))

        if opts.use_boundary:
            edge_tags = {"SX": "x0", "DX": "x1", "BOT": "y0", "TOP": "y1"}
            comp_tags = {0: "u", 1: "v"}
            for comp in (0, 1):
                for edge, rhs in self.bnd_val_num[comp].items():
                    tag = f"{comp_tags[comp]}_{edge_tags[edge]}"
                    if (edge, comp) in spec.neumann:
                        direction = spec.neumann[(edge, comp)]
                        xb, rb, sb = self._shard_pair(self.bnd_pts[edge], rhs)
                        bundle = ResidualBundle(
                            model, xb, unsteady=spec.unsteady,
                        )
                        fn_n = neumann_point_residual(
                            model, comp, direction, spec.physics, norm,
                            spec.unsteady)
                        rb_full = jnp.broadcast_to(
                            jnp.asarray(rb, xb.dtype), (xb.shape[0],))
                        pr = ((fn_n, (xb, rb_full)) if sb is None
                              else (scaled_point_residual(fn_n),
                                    (xb, rb_full, sb)))
                        losses.append(
                            LMS(f"BCN_{tag}",
                                (lambda b=bundle, c=comp, d=direction, r=rb, s=sb:
                                 _scaled(neumann_residual(b, c, d, spec.physics, norm, rhs=r), s)),
                                weight=spec.weight("BCN", 1e0),
                                point_residual=pr)
                        )
                    else:
                        xb, rb, sb = self._shard_pair(self.bnd_pts[edge], rhs)
                        losses.append(
                            LMS(f"BCD_{tag}",
                                (lambda x=xb, c=comp, r=rb, s=sb:
                                 _scaled(dirichlet_residual(model, x, c, r), s)),
                                weight=spec.weight("BCD", 1e0),
                                point_residual=_dir_pr(comp, xb, rb, sb))
                        )

        if spec.unsteady and opts.use_initialc and self.ic_pts is not None:
            xi, si = self._shard_pair(self.ic_pts)
            for comp, cname in ((0, "IC_u"), (1, "IC_v"), (2, "IC_p")):
                losses.append(
                    LMS(cname,
                        lambda c=comp: _scaled(
                            dirichlet_residual(model, xi, c, 0.0), si),
                        weight=spec.weight("IC", 1e0),
                        point_residual=_dir_pr(comp, xi, 0.0, si))
                )

        x_vel, fit_u, fit_v, s_vel = self._shard_pair(
            jnp.take(self.dom_grid, jnp.asarray(self.idx_set["Vel"]), axis=0),
            self.sol_noise[0], self.sol_noise[1],
        )
        if opts.fit_velocity:
            losses += [
                LMS("Fit_u", lambda: _scaled(
                    dirichlet_residual(model, x_vel, 0, fit_u), s_vel),
                    weight=spec.weight("FIT", 1e0),
                    point_residual=_dir_pr(0, x_vel, fit_u, s_vel)),
                LMS("Fit_v", lambda: _scaled(
                    dirichlet_residual(model, x_vel, 1, fit_v), s_vel),
                    weight=spec.weight("FIT", 1e0),
                    point_residual=_dir_pr(1, x_vel, fit_v, s_vel)),
            ]
        x_pres = jnp.take(self.dom_grid, jnp.asarray(self.idx_set["Pres"]), axis=0)
        if spec.pressure_gauge == "fit" and opts.fit_pressure:
            xp, fit_p, s_p = self._shard_pair(x_pres, self.sol_noise[2])
            losses.append(
                LMS("Fit_p", lambda: _scaled(
                    dirichlet_residual(model, xp, 2, fit_p), s_p),
                    weight=spec.weight("FIT", 1e0),
                    point_residual=_dir_pr(2, xp, fit_p, s_p))
            )
        elif spec.pressure_gauge == "mean":
            # gauge over the RAW (unpadded, replicated) PDE batch: the mean
            # penalty is a gauge choice, but padding must not change it
            gauge_pts = x_pres if len(self.idx_set["Pres"]) else x_pde_raw
            losses.append(
                Loss("PRESS_0", lambda: pressure_mean_penalty(model, gauge_pts),
                     weight=spec.weight("PRESS_0", 1e-2), non_negative=True)
            )

        it = jnp.asarray(self.idx_set["Test"])
        x_test, tst_u, tst_v, tst_p, s_tst = self._shard_pair(
            jnp.take(self.dom_grid, it, axis=0),
            jnp.take(self.sol_norm[0], it),
            jnp.take(self.sol_norm[1], it),
            jnp.take(self.sol_norm[2], it),
        )
        losses_test = [
            LMS("u_test", lambda: _scaled(
                dirichlet_residual(model, x_test, 0, tst_u), s_tst)),
            LMS("v_test", lambda: _scaled(
                dirichlet_residual(model, x_test, 1, tst_v), s_tst)),
            LMS("p_test", lambda: _scaled(
                dirichlet_residual(model, x_test, 2, tst_p), s_tst)),
        ]
        return losses, losses_test

    # ------------------------------------------------------------------ train
    def train(self, epochs: Optional[int] = None, callbacks: bool = True,
              skip_training: bool = False, resume_from: Optional[str] = None):
        """Run the training rounds.

        ``resume_from``: path of a previous stage's experiment folder — load
        its Weights.h5 and History_Loss.json, skip the Adam round, and run
        only the configured second round, appending to the same history.
        This is stage B of the hybrid TPU→CPU-f64 pipeline (stage A: long
        float32 Adam on TPU with ``second_round='adam'``; stage B: float64
        quasi-Newton polish on the CPU backend)."""
        epochs = self.opts.epochs if epochs is None else epochs
        if resume_from is not None:
            self.folder = resume_from
        else:
            self.folder = experiment.prepare_folder(
                self.base_dir, self.save_results
            )
        pb = OptimizationProblem(
            self.model.variables, self.losses, self.losses_test, callbacks=[]
        )
        if resume_from is not None:
            from tpinn.history import History

            weights_path = os.path.join(resume_from, "Weights.h5")
            self.model.load_weights(weights_path)
            ckpt_path = os.path.join(resume_from, "checkpoint.pkl")
            if (os.path.exists(ckpt_path)
                    and os.path.getmtime(ckpt_path)
                    > os.path.getmtime(weights_path)):
                # a killed round leaves checkpoint.pkl ahead of the final
                # Weights.h5 — resume from the fresher crash-recovery state
                # (cast to the model dtype: stage-A checkpoints are float32,
                # the f64 polish stage must not inherit their dtype)
                from tpinn.checkpoint import load_checkpoint

                ckpt = load_checkpoint(ckpt_path)
                self.model.variables.set(jax.tree_util.tree_map(
                    lambda a: jnp.asarray(a, self.model.dtype),
                    ckpt["params"]))
                # tagged optimizer state (LM theta64+mu / dense-BFGS carry):
                # the matching second round continues exactly instead of
                # cold-starting from the f32-materialized params
                pb.resume_opt_state = ckpt.get("opt_state")
            hist_path = os.path.join(resume_from, "History_Loss.json")
            if os.path.exists(hist_path):
                pb.history = History.load(hist_path)
                pb.history.register_losses(self.losses, self.losses_test)
        if callbacks:
            pb.callbacks.append(
                HistoryPlotCallback(
                    frequency=100,
                    gui=False,
                    filename=os.path.join(self.folder, "Loss_Trend_Full.png"),
                    filename_history=os.path.join(self.folder, "History_Loss.json"),
                )
            )
            pb.callbacks.append(
                CheckpointCallback(
                    os.path.join(self.folder, "checkpoint.pkl"), frequency=100
                )
            )
        self.pb = pb
        if skip_training:
            # reference load_mode: reload-only runs straight to post-processing
            return pb
        if resume_from is None:
            minimize(pb, "keras", Adam(learning_rate=self.adam_lr),
                     num_epochs=self.adam_epochs)
        run_second_round(pb, self.second_round, epochs,
                         scipy_method=self.scipy_method,
                         adam_lr=self.adam_lr)
        return pb

    # ----------------------------------------------------------------- output
    def predict_grid(self, n: int = 100):
        """Model inference on an n×n regular spatial grid, de-normalized.
        For unsteady cases, evaluated at the final time slice."""
        (lx, ux), (ly, uy) = self.spec.extents
        gx, gy = np.meshgrid(np.linspace(lx, ux, n), np.linspace(ly, uy, n))
        cols = [gx.reshape(-1), gy.reshape(-1)]
        if self.spec.unsteady:
            t_final = self.spec.time_horizon - self.spec.dt
            cols = [np.full(n * n, t_final)] + cols
        pts = jnp.asarray(np.stack(cols, axis=-1))
        out = np.asarray(self.model(pts))
        u = out[:, 0].reshape(gx.shape) * self.norm.norm_vel
        v = out[:, 1].reshape(gx.shape) * self.norm.norm_vel
        p = out[:, 2].reshape(gx.shape) * self.norm.norm_pre
        return gx, gy, u, v, p

    def save_artifacts(self, loss_groups: Optional[Dict[str, list]] = None,
                       exact_grids=None) -> None:
        """Stages 10–13: checkpoint, contour figure, loss plot, recap."""
        folder = self.folder
        assert folder is not None, "train() first"
        ckpt.save_experiment(
            folder, self.model, self.pb.history,
            opt_state=self.pb.last_opt_state,
        )

        gx, gy, u, v, p = self.predict_grid()
        if exact_grids is None and self.spec.exact is not None:
            u_f, v_f, p_f = self.spec.exact
            pts = jnp.asarray(
                np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
            )
            if self.spec.unsteady:
                t_final = self.spec.time_horizon - self.spec.dt
                pts = jnp.concatenate(
                    [jnp.full((pts.shape[0], 1), t_final), pts], axis=1
                )
            exact_grids = (
                np.asarray(u_f(pts)).reshape(gx.shape),
                np.asarray(v_f(pts)).reshape(gx.shape),
                np.asarray(p_f(pts)).reshape(gx.shape),
            )
        if exact_grids is not None:
            viz.contour_compare(
                gx, gy, exact_grids, (u, v, p),
                problem_name=self.spec.name,
                filename=os.path.join(folder, "Graphic.jpg"),
            )
        if self.spec.unsteady and self.spec.exact_data is not None:
            self.save_time_slices(folder)
        if loss_groups:
            viz.plot_loss_groups(
                self.pb.history.to_dict(), loss_groups,
                filename=os.path.join(folder, "Loss_Trend_Reduced.png"),
            )
        experiment.write_recap(
            folder, self.spec.name, self.opts.epochs, self.opts.n_pts,
            noise_fit=self.opts.noise_fit, noise_bnd=self.opts.noise_bnd,
            echo=False,
        )

    def save_time_slices(self, folder, n_time_stamp: int = 4) -> None:
        """Per-time-slice exact-vs-PINN contour figures for unsteady cases
        (reference cavity_unsteady.py:275-357: n_time_stamp+1 slices at
        t = linspace(0, T, 5), t = T clamped to the last stored step,
        per-field levels shared across slices, exact pressure recentered)."""
        spec = self.spec
        T, dt = spec.time_horizon, spec.dt
        n1, n2 = spec.grid_shape
        n_xy = (n1 + 1) * (n2 + 1)
        n_times = int(round(T / dt))
        times = np.linspace(0.0, T, n_time_stamp + 1)

        (lx, ux), (ly, uy) = spec.extents
        gx, gy = np.meshgrid(
            np.linspace(lx, ux, n1 + 1), np.linspace(ly, uy, n2 + 1)
        )
        flat = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)

        exact_slices = [[], [], []]
        pinn_slices = [[], [], []]
        norms = (self.norm.norm_vel, self.norm.norm_vel, self.norm.norm_pre)
        for t in times:
            t_eff = T - dt if t >= T else t
            k = int(round(t_eff / dt))
            pts = jnp.asarray(
                np.concatenate([np.full((n_xy, 1), t_eff), flat], axis=1)
            )
            out = np.asarray(self.model(pts))
            for comp in range(3):
                ex = np.asarray(
                    self.exact_fields[comp][k * n_xy : (k + 1) * n_xy]
                ).reshape(n2 + 1, n1 + 1)
                if comp == 2:
                    ex = ex - ex.mean()  # reference recenters exact pressure
                exact_slices[comp].append(ex)
                pinn_slices[comp].append(
                    out[:, comp].reshape(n2 + 1, n1 + 1) * norms[comp]
                )
        viz.contour_time_slices(
            gx, gy, exact_slices, pinn_slices, times, n_times, folder
        )

    def final_test_losses(self) -> Dict[str, float]:
        h = self.pb.history
        return {name: entry["log"][-1] for name, entry in h.losses_test.items()}
