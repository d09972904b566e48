"""tpinn — TPU-native Physics-Informed Neural Network framework for fluid dynamics.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
giuliamesc/PINNs_Fluid_Dynamics and its underlying TF-based ``nisaba`` library
(see SURVEY.md for the full inferred API contract).

The top-level namespace intentionally mirrors the nisaba surface so that a user
of the reference can do ``import tpinn as ns`` and keep their driver scripts
(reference call sites: Examples/Poiseuille_Flow/poiseuille_flow.py:169-270):

    ns.config.get_dtype()
    ns.GradientTape(persistent=True)
    ns.experimental.physics.tens_style.{gradient_scalar, divergence_vector, laplacian_scalar}
    ns.Loss / ns.LossMeanSquares
    ns.OptimizationProblem
    ns.minimize(pb, 'keras'|'scipy'|'jax', ...)
    ns.utils.{HistoryPlotCallback, plot_history, load_json}

Underneath, everything is functional JAX: residuals are pure functions of
(params, points), differentiated with forward-over-reverse autodiff, fused by
XLA into a single jitted train step, and shardable over a TPU device mesh along
the collocation-point axis (see tpinn.sharding).
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: campaign lanes chain many short driver
# invocations against the same experiment folder (exact optimizer-state
# resume), and each restart would otherwise re-pay the multi-minute
# dense-BFGS/LM while_loop compile on a single host core.  Only compiles
# >2 s are cached (small ones recompile faster than the AOT load logs).
# The cache is keyed by HLO hash + compile options + backend, so code or
# shape changes miss cleanly.  Opt out with TPINN_NO_COMPILE_CACHE=1;
# relocate with TPINN_COMPILE_CACHE_DIR (default: a user cache dir, NOT the
# package location — an installed package would otherwise write into the
# site-packages parent).  Skipped silently when the dir is not writable.
if not _os.environ.get("TPINN_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get("TPINN_COMPILE_CACHE_DIR") or _os.path.join(
        _os.path.expanduser("~"), ".cache", "tpinn", "jax"
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _writable = _os.access(_cache_dir, _os.W_OK)
    except OSError:
        _writable = False
    if _writable:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from tpinn import config
from tpinn.tape import GradientTape
from tpinn.losses import Loss, LossMeanSquares
from tpinn.problem import OptimizationProblem
from tpinn.optimize import minimize
from tpinn import utils
from tpinn import experimental
from tpinn import models
from tpinn import operators
from tpinn import geometry
from tpinn import history
from tpinn import sharding
from tpinn import checkpoint
from tpinn import optimizers
from tpinn import experiment
from tpinn import viz
from tpinn import pipeline
from tpinn import oracles
from tpinn import driver
from tpinn import profiling

__version__ = "0.1.0"

__all__ = [
    "config",
    "GradientTape",
    "Loss",
    "LossMeanSquares",
    "OptimizationProblem",
    "minimize",
    "utils",
    "experimental",
    "models",
    "operators",
    "geometry",
    "history",
    "sharding",
    "checkpoint",
    "optimizers",
    "experiment",
    "viz",
    "pipeline",
    "oracles",
    "driver",
    "profiling",
]
