"""Neural field models: dense MLPs as parameter pytrees.

The reference model is a Keras Sequential MLP — 3 hidden Dense(32, tanh)
layers and a linear head (reference: Examples/Poiseuille_Flow/
poiseuille_flow.py:228-233; 20-wide for Poisson, poisson.py:40-45).  Here the
model is a thin, jit-friendly wrapper around a params pytree:

* ``model(x)`` — batched forward; inside an active ``tpinn.GradientTape`` on a
  watched batch it returns a :class:`tpinn.tape.TapedArray` so the physics
  operators can differentiate w.r.t. the input.
* ``Model.apply(params, x)`` / ``apply_single(params, xi)`` — pure functions
  for use under jit / vmap / pjit.
* ``model.variables`` — a :class:`VariablesHandle` passed to
  ``OptimizationProblem`` (nisaba passes ``model.variables`` the same way,
  poiseuille_flow.py:265); the optimizer binds trial parameter pytrees through
  it during tracing.

Checkpoint parity: ``to_json()`` / ``save_weights()`` emit a Keras-layout
architecture JSON and an HDF5 weight file mirroring the reference artifacts
(Model.json + Weights.h5, poiseuille_flow.py:272-275); ``model_from_json`` +
``load_weights`` round-trip them (reference reload path:
Examples_Old/Lid_Driven_Cavity/cavity_steady.py:272-279).
"""

from __future__ import annotations

import contextlib
import json
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpinn import config
from tpinn.tape import TapedArray, active_tape

_ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "sin": jnp.sin,
    "linear": lambda x: x,
}


def glorot_uniform(key, shape, dtype):
    """Keras Dense default initializer."""
    fan_in, fan_out = shape[0], shape[1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype=dtype, minval=-limit, maxval=limit)


class VariablesHandle:
    """Mutable reference to a model's parameter pytree.

    ``get()/set()`` access stored params; ``bind(params)`` temporarily
    overrides them (used while tracing jitted loss evaluations so traced
    parameters flow through user loss closures that call ``model(x)``).
    """

    def __init__(self, model: "Model"):
        self.model = model

    def get(self):
        return self.model.params

    def set(self, params) -> None:
        self.model.params = params

    @contextlib.contextmanager
    def bind(self, params):
        prev = self.model._bound
        self.model._bound = params
        try:
            yield
        finally:
            self.model._bound = prev


class Model:
    """Dense MLP over per-point inputs.

    Parameters are a list of ``{"kernel": (in, out), "bias": (out,)}`` dicts.
    """

    def __init__(
        self,
        layers: Sequence[int],
        activation: str = "tanh",
        dtype=None,
        key: Optional[jax.Array] = None,
        seed: int = 0,
        input_extents: Optional[Sequence] = None,
    ):
        if len(layers) < 2:
            raise ValueError("layers must include input and output widths")
        self.layer_sizes = tuple(int(w) for w in layers)
        self.activation_name = activation
        self.activation = _ACTIVATIONS[activation]
        self.dtype = dtype or config.get_dtype()
        self.input_extents = (
            tuple((float(lo), float(hi)) for lo, hi in input_extents)
            if input_extents is not None
            else None
        )
        if key is None:
            key = jax.random.PRNGKey(seed)
        self.params = self.init(key)
        self._bound = None  # traced override during optimization

    # -- parameters ---------------------------------------------------------
    def init(self, key) -> List[dict]:
        params = []
        sizes = self.layer_sizes
        keys = jax.random.split(key, len(sizes) - 1)
        for i, (k, fan_in, fan_out) in enumerate(
            zip(keys, sizes[:-1], sizes[1:])
        ):
            kernel = glorot_uniform(k, (fan_in, fan_out), self.dtype)
            bias = jnp.zeros((fan_out,), dtype=self.dtype)
            if i == 0 and self.input_extents is not None:
                # Input normalization folded into layer 0 at init:
                # z = x@W0 + b0 == x̂@Ŵ0 + b̂0 with x̂ = (x − mid)/half in
                # (−1, 1)^d.  Identical math to an explicit normalization
                # layer, but zero runtime cost and every compute path
                # (jet, closed-form batched, Pallas kernels) inherits it
                # because it lives in the parameters.  Without it, float32
                # Adam on anisotropic physical domains falls into a
                # spurious stationary point (measured on the Poiseuille
                # 1 × 0.1 channel: frozen at global loss 0.54 vs 8e-3 with
                # the folded init, TPU round 2).
                mid = jnp.asarray(
                    [(lo + hi) / 2.0 for lo, hi in self.input_extents],
                    dtype=self.dtype,
                )
                half = jnp.asarray(
                    [max((hi - lo) / 2.0, 1e-12) for lo, hi in self.input_extents],
                    dtype=self.dtype,
                )
                bias = bias - (mid / half) @ kernel
                kernel = kernel / half[:, None]
            params.append({"kernel": kernel, "bias": bias})
        return params

    @property
    def variables(self) -> VariablesHandle:
        return VariablesHandle(self)

    @property
    def current_params(self):
        return self._bound if self._bound is not None else self.params

    # -- pure forward --------------------------------------------------------
    def apply(self, params, x):
        """Batched forward: x (N, d_in) -> (N, d_out). Pure."""
        h = x
        act = self.activation
        n_layers = len(params)
        for i, layer in enumerate(params):
            h = h @ layer["kernel"] + layer["bias"]
            if i < n_layers - 1:
                h = act(h)
        return h

    def apply_single(self, params, xi):
        """Per-point forward: xi (d_in,) -> (d_out,). Pure."""
        h = xi
        act = self.activation
        n_layers = len(params)
        for i, layer in enumerate(params):
            h = h @ layer["kernel"] + layer["bias"]
            if i < n_layers - 1:
                h = act(h)
        return h

    # -- stateful call (nisaba-style drivers) --------------------------------
    def __call__(self, x):
        params = self.current_params
        tape = active_tape()
        raw = x.value if isinstance(x, TapedArray) else x
        watched = tape is not None and (
            tape.is_watched(x) or tape.is_watched(raw)
        )
        x = jnp.asarray(raw, dtype=self.dtype)
        if tape is not None and not watched:
            # The dtype cast above may have produced a new object; only an
            # identity match against a watched tensor (or its canonicalized
            # form recorded at watch time) counts — matching by shape would
            # wrongly tape an unrelated same-shape batch.
            watched = tape.is_watched(x)
        value = self.apply(params, x)
        if watched:
            fn = lambda xi: self.apply_single(params, xi)
            return TapedArray(value, fn, x)
        return value

    # -- Keras-parity checkpointing ------------------------------------------
    def to_json(self) -> str:
        """Keras-Sequential-layout architecture JSON (reference Model.json)."""
        layer_cfgs = []
        sizes = self.layer_sizes
        n_dense = len(sizes) - 1
        for i, units in enumerate(sizes[1:]):
            cfg = {
                "class_name": "Dense",
                "config": {
                    "name": f"dense_{i}",
                    "trainable": True,
                    "dtype": str(np.dtype(self.dtype)),
                    "units": int(units),
                    "activation": self.activation_name if i < n_dense - 1 else "linear",
                    "use_bias": True,
                },
            }
            if i == 0:
                cfg["config"]["batch_input_shape"] = [None, int(sizes[0])]
            layer_cfgs.append(cfg)
        arch = {
            "class_name": "Sequential",
            "config": {"name": "sequential", "layers": layer_cfgs},
            "framework": "tpinn",
            "backend": "jax",
        }
        return json.dumps(arch)

    def save_weights(self, path) -> None:
        """Write weights; ``.h5`` uses a Keras-like HDF5 layout, else npz."""
        path = str(path)
        if path.endswith(".h5") or path.endswith(".hdf5"):
            import h5py

            with h5py.File(path, "w") as f:
                layer_names = [f"dense_{i}" for i in range(len(self.params))]
                f.attrs["layer_names"] = [n.encode() for n in layer_names]
                f.attrs["backend"] = b"jax"
                for name, layer in zip(layer_names, self.params):
                    g = f.create_group(name).create_group(name)
                    f[name].attrs["weight_names"] = [
                        f"{name}/kernel:0".encode(),
                        f"{name}/bias:0".encode(),
                    ]
                    g.create_dataset("kernel:0", data=np.asarray(layer["kernel"]))
                    g.create_dataset("bias:0", data=np.asarray(layer["bias"]))
        else:
            flat = {}
            for i, layer in enumerate(self.params):
                flat[f"kernel_{i}"] = np.asarray(layer["kernel"])
                flat[f"bias_{i}"] = np.asarray(layer["bias"])
            np.savez(path, **flat)

    def load_weights(self, path) -> None:
        path = str(path)
        dtype = self.dtype
        if path.endswith(".h5") or path.endswith(".hdf5"):
            import h5py

            params = []
            with h5py.File(path, "r") as f:
                layer_names = [
                    n.decode() if isinstance(n, bytes) else n
                    for n in f.attrs["layer_names"]
                ]
                for name in layer_names:
                    grp = f[name]
                    # tolerate both our layout (name/name/kernel:0) and
                    # flattened variants
                    if name in grp:
                        grp = grp[name]
                    kernel = np.array(grp["kernel:0"])
                    bias = np.array(grp["bias:0"])
                    params.append(
                        {
                            "kernel": jnp.asarray(kernel, dtype=dtype),
                            "bias": jnp.asarray(bias, dtype=dtype),
                        }
                    )
        else:
            data = np.load(path if path.endswith(".npz") else path + ".npz")
            params = []
            i = 0
            while f"kernel_{i}" in data:
                params.append(
                    {
                        "kernel": jnp.asarray(data[f"kernel_{i}"], dtype=dtype),
                        "bias": jnp.asarray(data[f"bias_{i}"], dtype=dtype),
                    }
                )
                i += 1
        self.params = params


def model_from_json(json_str: str, key=None, seed: int = 0) -> Model:
    """Rebuild a Model from a ``to_json()`` (or Keras Sequential) string."""
    arch = json.loads(json_str)
    layers_cfg = arch["config"]["layers"]
    # some Keras exports nest under ["config"]["layers"][i]["config"]
    sizes = []
    activation = "tanh"
    for i, layer in enumerate(layers_cfg):
        cfg = layer["config"]
        if i == 0:
            batch_input = cfg.get("batch_input_shape")
            if batch_input:
                sizes.append(int(batch_input[1]))
        sizes.append(int(cfg["units"]))
        if cfg.get("activation") not in (None, "linear"):
            activation = cfg["activation"]
    dtype_name = layers_cfg[0]["config"].get("dtype") or "float32"
    try:
        dtype = jnp.dtype(dtype_name)
    except TypeError:
        dtype = config.get_dtype()
    if jnp.dtype(dtype) == jnp.dtype("float64") and not jax.config.jax_enable_x64:
        dtype = config.get_dtype()
    return Model(sizes, activation=activation, dtype=dtype, key=key, seed=seed)


def MLP(
    dim_in: int,
    dim_out: int,
    width: int = 32,
    depth: int = 3,
    activation: str = "tanh",
    **kw,
) -> Model:
    """The reference architecture: ``depth`` hidden layers of ``width`` tanh units."""
    return Model([dim_in] + [width] * depth + [dim_out], activation=activation, **kw)
