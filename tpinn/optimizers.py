"""Optimizer shims giving reference drivers a familiar constructor surface.

The reference always uses ``tf.keras.optimizers.Adam(learning_rate=1e-2)``
(SURVEY.md §2.1).  ``tpinn.optimizers.Adam(learning_rate=1e-2)`` is the
drop-in equivalent; ``minimize(pb, 'keras', Adam(...), num_epochs)`` labels
the round ``keras_Adam`` for history parity.  Any optax
``GradientTransformation`` is also accepted by ``minimize`` directly.
"""

from __future__ import annotations

import optax


class _OptaxShim:
    name: str = "Optimizer"

    def __init__(self, learning_rate: float = 1e-2, **kwargs):
        self.learning_rate = learning_rate
        self.kwargs = kwargs

    def to_optax(self) -> optax.GradientTransformation:
        raise NotImplementedError


class Adam(_OptaxShim):
    name = "Adam"

    def to_optax(self) -> optax.GradientTransformation:
        return optax.adam(self.learning_rate, **self.kwargs)


class SGD(_OptaxShim):
    name = "SGD"

    def to_optax(self) -> optax.GradientTransformation:
        return optax.sgd(self.learning_rate, **self.kwargs)


class AdamW(_OptaxShim):
    name = "AdamW"

    def to_optax(self) -> optax.GradientTransformation:
        return optax.adamw(self.learning_rate, **self.kwargs)
