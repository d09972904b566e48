"""Named, weighted loss system (nisaba ``ns.Loss`` / ``ns.LossMeanSquares``).

Contract (SURVEY.md §2.1, 131 LossMeanSquares call sites in the reference):

* ``LossMeanSquares(name, fn, weight=1, normalization=1)`` — ``fn`` returns a
  residual vector r; the logged (raw) value is ``mean((r/normalization)**2)``
  and the global objective receives ``weight * raw``.
* ``Loss(name, fn, weight=1, normalization=1, non_negative=False)`` — generic
  scalar loss; only non-MSE use in the reference is the mean-pressure gauge
  penalty (Examples/Colliding_Flow/colliding_flow_pressmean.py:196).

Serialized per-loss metadata in History_Loss.json:
``{weight, non_negative, display_sqrt, log}`` — verified invariant
``loss_global = Σ weight_i · raw_i`` (SURVEY.md §2.1 schema notes).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from tpinn.tape import as_value


class Loss:
    """Generic named scalar loss: raw value = fn() / normalization."""

    display_sqrt = False

    def __init__(
        self,
        name: str,
        fn: Callable[[], object],
        weight: float = 1.0,
        normalization: float = 1.0,
        non_negative: bool = False,
    ):
        self.name = name
        self.fn = fn
        self.weight = float(weight)
        self.normalization = float(normalization)
        self.non_negative = bool(non_negative)

    def raw_value(self):
        """Unweighted scalar value (what gets logged)."""
        v = as_value(self.fn())
        return jnp.asarray(v) / self.normalization

    def weighted_value(self):
        return self.weight * self.raw_value()

    def metadata(self) -> dict:
        return {
            "weight": self.weight,
            "non_negative": self.non_negative,
            "display_sqrt": self.display_sqrt,
        }

    def __repr__(self):
        return f"{type(self).__name__}({self.name!r}, weight={self.weight})"


class LossMeanSquares(Loss):
    """Mean-of-squares residual loss: raw = mean((fn()/normalization)^2).

    ``point_residual`` (optional) exposes the pointwise structure of the
    residual for the Gauss–Newton/LM optimizer: a pair ``(point_fn, args)``
    where each element of ``args`` is an array with leading axis N (one row
    per residual component) and ``point_fn(params, *args_i) -> scalar``
    computes residual component i from EXPLICIT parameters.  It must satisfy
    ``vmap(point_fn, (None, 0, ...))(params, *args) == fn()`` under the same
    bound params.  When every training loss carries it, the LM round builds
    JᵀJ/JᵀR from per-point reverse-mode gradients — one tiny backward per
    point — instead of ~P/chunk full-batch forward-mode passes (the
    dominant cost of the f64-on-TPU campaign at 26 s/iter, RESULTS_TPU.md).
    """

    display_sqrt = True

    def __init__(
        self,
        name: str,
        fn: Callable[[], object],
        weight: float = 1.0,
        normalization: float = 1.0,
        point_residual=None,
    ):
        super().__init__(
            name, fn, weight=weight, normalization=normalization, non_negative=True
        )
        self.point_residual = point_residual

    def raw_value(self):
        r = as_value(self.fn())
        r = jnp.asarray(r) / self.normalization
        return jnp.mean(jnp.square(r))


class PrecomputedMeanSquares(Loss):
    """A mean-of-squares loss whose ``fn`` already returns the MSE scalar.

    Used by fused residual evaluators (tpinn.pallas.ns_residual_mse computes
    all three PDE MSEs in one kernel); keeps LossMeanSquares history metadata
    (display_sqrt) so History_Loss.json stays schema-identical."""

    display_sqrt = True

    def __init__(self, name: str, fn: Callable[[], object], weight: float = 1.0):
        super().__init__(name, fn, weight=weight, non_negative=True)

    def raw_value(self):
        return jnp.asarray(as_value(self.fn()))
