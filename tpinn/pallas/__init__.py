"""Pallas TPU kernels for the hot ops.

The framework's hot op (≥99% of runtime, SURVEY.md §3.2) is the fused
(value, Jacobian, Hessian-diagonal) evaluation of the MLP over a collocation
batch.  tpinn.pallas.mlp_bundle implements it as a single TPU kernel with
Taylor-mode propagation laid out for the MXU/VPU; falls back transparently
to the jet-based XLA path on other backends.

Performance status (v5e, 65k points, 2→32³→3 MLP):
* XLA jet path, reduction-fused scalar loss: ~40 µs/eval — the production
  training path (XLA fuses the whole residual+MSE graph).
* mlp_taylor_bundle (materializing outputs): correct, compiles ~70x faster
  than the jet graph through the remote-compile tunnel, but slower to run;
  useful where bundle outputs are consumed directly.
* ns_residual_mse (in-kernel chunk loop + double-buffered HBM streaming,
  hand-written backward): the DEFAULT TPU PDE-loss path since round 2 —
  5-11x the XLA jet path per train step (bench.py).
* ns_residual_weighted_obj (round 3): ONE-PASS training objective — the
  backward kernel called with the loss weights as cotangents returns the
  weighted loss, the raw MSEs (log channels), and the parameter gradients
  in a single launch (3 propagation units instead of fwd+bwd's 4).
"""

from tpinn.pallas.mlp_bundle import (
    mlp_taylor_bundle,
    ns_residual_mse,
    ns_residual_weighted_obj,
    pallas_available,
    poisson_residual_mse,
    poisson_residual_weighted_obj,
)

__all__ = [
    "mlp_taylor_bundle",
    "ns_residual_mse",
    "ns_residual_weighted_obj",
    "pallas_available",
    "poisson_residual_mse",
    "poisson_residual_weighted_obj",
]
