"""Tape-style differentiation front end over pure JAX autodiff.

The reference framework (nisaba) exposes a TensorFlow ``GradientTape``-style
imperative API: drivers open ``ns.GradientTape(persistent=True)``, call
``tape.watch(x)``, evaluate ``model(x)``, and then request input-derivatives
of intermediate tensors (reference: Examples/Poiseuille_Flow/
poiseuille_flow.py:180-197, Examples/Cavity_Steady/cavity_steady.py:159-188).

A literal translation would fight JAX: there is no global tape.  Instead, the
tape here is a *functional capture* device.  When a ``tpinn.models.Model`` is
called on a watched batch ``x`` inside an active tape, it returns a
:class:`TapedArray` — the batched value plus the pure *per-point* function
``fn(xi) -> value_i`` that produced it.  Arithmetic and slicing compose new
per-point functions, so the physics operators
(tpinn.experimental.physics.tens_style) can differentiate any intermediate
with ``vmap(grad)`` / ``vmap(jacfwd)``: everything stays pure, jittable, and
XLA-fusable — no tape re-walks, no eager re-execution.

Because every op is pure, a whole nisaba-style loss closure traced under
``jax.jit`` compiles to a single fused XLA computation.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

# Stack of active tapes (tapes nest lexically inside a single trace, so a
# plain module-level list is correct even under jit tracing).
_TAPE_STACK: List["GradientTape"] = []


def active_tape() -> Optional["GradientTape"]:
    return _TAPE_STACK[-1] if _TAPE_STACK else None


class GradientTape:
    """Context manager mirroring ``ns.GradientTape`` (SURVEY.md §2.1).

    ``persistent`` is accepted for API parity; it is meaningless here since
    nothing is consumed when a derivative is taken (derivatives are recomputed
    functionally and deduplicated by XLA common-subexpression elimination).
    """

    def __init__(self, persistent: bool = False):
        self.persistent = persistent
        self._watched: List[jnp.ndarray] = []

    def watch(self, x) -> None:
        self._watched.append(x)

    def is_watched(self, x) -> bool:
        return any(x is w for w in self._watched)

    def __enter__(self) -> "GradientTape":
        _TAPE_STACK.append(self)
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        _TAPE_STACK.pop()
        return False


class TapedArray:
    """A batched array plus the pure per-point function that computed it.

    ``value``: the batched result, shape ``(N, ...)``.
    ``fn``:    pure function ``xi (d,) -> value_i`` (unbatched); ``None`` if
               the array can no longer be differentiated w.r.t. the input
               (e.g. after combining with an unrelated per-batch constant).
    ``x``:     the watched input batch ``(N, d)`` this array derives from.
    """

    __slots__ = ("value", "fn", "x")
    __array_priority__ = 100  # win binary-op dispatch over numpy arrays

    def __init__(self, value, fn, x):
        self.value = value
        self.fn = fn
        self.x = x

    # -- array-like surface ------------------------------------------------
    @property
    def shape(self):
        return self.value.shape

    @property
    def dtype(self):
        return self.value.dtype

    @property
    def ndim(self):
        return self.value.ndim

    def __jax_array__(self):
        return self.value

    def __array__(self, dtype=None):
        import numpy as np

        return np.asarray(self.value, dtype=dtype)

    def __repr__(self):
        return f"TapedArray(shape={self.value.shape}, differentiable={self.fn is not None})"

    # -- composition helpers ----------------------------------------------
    def _unary(self, batched_op, pointwise_op) -> "TapedArray":
        fn = None
        if self.fn is not None:
            inner = self.fn
            fn = lambda xi: pointwise_op(inner(xi))
        return TapedArray(batched_op(self.value), fn, self.x)

    def _binary(self, other, op) -> "TapedArray":
        if isinstance(other, TapedArray):
            value = op(self.value, other.value)
            fn = None
            # Composing per-point functions is only valid when both arrays
            # derive from the SAME input batch; otherwise sever fn (the
            # result has no single-x functional form).
            if self.fn is not None and other.fn is not None and self.x is other.x:
                f, g = self.fn, other.fn
                fn = lambda xi: op(f(xi), g(xi))
            return TapedArray(value, fn, self.x)
        if jnp.isscalar(other) or (hasattr(other, "ndim") and getattr(other, "ndim") == 0):
            value = op(self.value, other)
            fn = None
            if self.fn is not None:
                f = self.fn
                fn = lambda xi: op(f(xi), other)
            return TapedArray(value, fn, self.x)
        # Per-batch constant (e.g. an (N,) rhs): value math is fine but the
        # per-point functional dependency on x is lost.
        return TapedArray(op(self.value, jnp.asarray(other)), None, self.x)

    def _rbinary(self, other, op):
        return self._binary(other, lambda a, b: op(b, a))

    # -- operators ---------------------------------------------------------
    def __getitem__(self, idx) -> "TapedArray":
        """Indexing that preserves differentiability where possible.

        Supported patterns keep ``fn``:
        * ``u[:, k]`` / ``u[:, a:b]`` / ``u[..., k]`` — per-point component
          selection (batch axis untouched)
        * ``u[a:b]`` / ``u[idx_array]`` / ``u[mask]`` — batch-axis
          selection: the result derives from the corresponding sub-batch of
          the same watched input (operators differentiate on ``u.x``), so
          e.g. ``gradient_scalar(tape, u[sel][:, 0], x)`` works
        * combinations ``u[sel, k]``

        A scalar row index (``u[5]``) drops the batch axis and severs
        differentiability (clear error at use, tpinn.tape.pointwise_fn).
        """
        value = self.value[idx]
        if self.fn is None:
            return TapedArray(value, None, self.x)
        tup = idx if isinstance(idx, tuple) else (idx,)
        head, rest = tup[0], tup[1:]
        inner = self.fn

        def point_fn():
            if not rest:
                return inner
            pi = rest[0] if len(rest) == 1 else rest
            return lambda xi: inner(xi)[pi]

        if isinstance(head, slice):
            if head == slice(None):
                return TapedArray(value, point_fn(), self.x)
            # batch-axis slice: same per-point fn on the sub-batch
            return TapedArray(value, point_fn(), self.x[head])
        if head is Ellipsis:
            if not rest:
                return TapedArray(value, inner, self.x)
            pi = (Ellipsis,) + rest
            return TapedArray(value, lambda xi: inner(xi)[pi], self.x)
        arr = None
        if isinstance(head, (list, tuple)) or hasattr(head, "ndim"):
            arr = jnp.asarray(head)
        if arr is not None and arr.ndim == 1:
            # fancy batch-axis selection (integer gather or boolean mask)
            return TapedArray(value, point_fn(), self.x[head])
        # scalar row index etc.: value math only, fn severed
        return TapedArray(value, None, self.x)

    def __add__(self, other):
        return self._binary(other, jnp.add)

    def __radd__(self, other):
        return self._rbinary(other, jnp.add)

    def __sub__(self, other):
        return self._binary(other, jnp.subtract)

    def __rsub__(self, other):
        return self._rbinary(other, jnp.subtract)

    def __mul__(self, other):
        return self._binary(other, jnp.multiply)

    def __rmul__(self, other):
        return self._rbinary(other, jnp.multiply)

    def __truediv__(self, other):
        return self._binary(other, jnp.divide)

    def __rtruediv__(self, other):
        return self._rbinary(other, jnp.divide)

    def __neg__(self):
        return self._unary(jnp.negative, jnp.negative)

    def __pow__(self, e):
        return self._binary(e, jnp.power)

    def __matmul__(self, other):
        # e.g. projecting a gradient onto a boundary normal:
        # reference Examples/Coronary_Flow/coronary_flow_steady.py:213-227.
        return self._binary(other, jnp.matmul)

    def reshape(self, *shape):
        return TapedArray(self.value.reshape(*shape), None, self.x)

    def mean(self, *a, **k):
        return self.value.mean(*a, **k)

    def sum(self, *a, **k):
        return self.value.sum(*a, **k)


def as_value(u):
    """Unwrap a TapedArray (or pass through a plain array)."""
    return u.value if isinstance(u, TapedArray) else u


def pointwise_fn(u) -> Callable:
    """Return the per-point function behind ``u`` or raise a clear error."""
    if not isinstance(u, TapedArray) or u.fn is None:
        raise ValueError(
            "This tensor is not differentiable w.r.t. the watched input: it "
            "was not produced (or was disconnected) from a model call on a "
            "watched batch inside an active GradientTape. Note: combining a "
            "model output with a per-batch constant array severs the "
            "functional dependency — take derivatives before adding data "
            "terms."
        )
    return u.fn
