"""Pallas TPU kernels for the hot ops.

The framework's hot op (≥99% of runtime, SURVEY.md §3.2) is the fused
(value, Jacobian, Hessian-diagonal) evaluation of the MLP over a collocation
batch.  tpinn.pallas.mlp_bundle implements it as a single TPU kernel with
Taylor-mode propagation laid out for the MXU/VPU; falls back transparently
to the jet-based XLA path on other backends.
"""

from tpinn.pallas.mlp_bundle import mlp_taylor_bundle, ns_residual_mse, pallas_available

__all__ = ["mlp_taylor_bundle", "ns_residual_mse", "pallas_available"]
