"""OptimizationProblem: bundles variables, losses, test losses, callbacks.

nisaba contract (SURVEY.md §2.1; reference call site
Examples/Poiseuille_Flow/poiseuille_flow.py:265-268):

    pb = ns.OptimizationProblem(model.variables, losses, losses_test,
                                callbacks=[])
    pb.callbacks.append(...)        # mutable list
    pb.save_history(path)           # dump History_Loss.json

``losses_test`` may be a single loss or a list (reference poisson.py:69,72).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Union

import jax

from tpinn.history import History
from tpinn.losses import Loss
from tpinn.models import VariablesHandle


class OptimizationProblem:
    def __init__(
        self,
        variables: VariablesHandle,
        losses: Sequence[Loss],
        losses_test: Union[Loss, Sequence[Loss], None] = None,
        callbacks: Optional[list] = None,
    ):
        if not isinstance(variables, VariablesHandle):
            raise TypeError(
                "variables must be model.variables (a tpinn VariablesHandle)"
            )
        self.variables = variables
        self.losses: List[Loss] = list(losses)
        if losses_test is None:
            losses_test = []
        if isinstance(losses_test, Loss):
            losses_test = [losses_test]
        self.losses_test: List[Loss] = list(losses_test)
        self.callbacks: list = list(callbacks) if callbacks else []
        self.history = History()
        self.history.register_losses(self.losses, self.losses_test)
        # jit caches populated by tpinn.optimize
        self._value_and_grad_fn = None
        self._eval_fn = None
        # Live optimizer state of the current/most-recent round, published by
        # tpinn.optimize at every log point so checkpoints can capture it for
        # exact resume (None during/after scipy rounds — scipy keeps its
        # quasi-Newton state host-side and does not expose it).
        self.last_opt_state = None
        self.last_round_name: Optional[str] = None

    # -- pure functional views (built once, reused by every optimizer round) --
    def loss_fn(self, params):
        """Global training loss: Σ weight_i · raw_i(params).  Pure."""
        with self.variables.bind(params):
            total = 0.0
            for loss in self.losses:
                total = total + loss.weight * loss.raw_value()
        return total

    def eval_all(self, params):
        """(loss_global, {train raw}, {test raw}).  Pure."""
        with self.variables.bind(params):
            train = {l.name: l.raw_value() for l in self.losses}
            test = {l.name: l.raw_value() for l in self.losses_test}
        total = sum(l.weight * train[l.name] for l in self.losses)
        return total, train, test

    def value_and_grad(self):
        if self._value_and_grad_fn is None:
            vg = jax.value_and_grad(self.loss_fn)

            def hp_vg(params):
                # full-f32 matmul accumulation: TPU's default bf16 matmul
                # passes inject ~1e-3 relative noise into the PDE residuals
                # (cancellation amplifies the rounding), which corrupts
                # quasi-Newton line searches and Adam gradients alike.
                # 'highest' is a no-op on CPU.
                with jax.default_matmul_precision("highest"):
                    return vg(params)

            self._value_and_grad_fn = jax.jit(hp_vg)
        return self._value_and_grad_fn

    def eval_jit(self):
        if self._eval_fn is None:
            def hp_eval(params):
                with jax.default_matmul_precision("highest"):
                    return self.eval_all(params)

            self._eval_fn = jax.jit(hp_eval)
        return self._eval_fn

    # -- history ------------------------------------------------------------
    def save_history(self, path) -> None:
        self.history.save(path)

    def fire_callbacks(self, iteration: int, force: bool = False) -> None:
        for cb in self.callbacks:
            cb(self, iteration, force=force)
