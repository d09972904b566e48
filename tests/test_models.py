import json

import jax
import jax.numpy as jnp
import numpy as np

import tpinn as ns
from tpinn.models import MLP, Model, model_from_json


def test_reference_architecture_shapes():
    # 3 hidden Dense(32, tanh) + linear head with 3 outputs
    # (reference poiseuille_flow.py:228-233)
    model = MLP(2, 3, width=32, depth=3)
    assert [p["kernel"].shape for p in model.params] == [
        (2, 32),
        (32, 32),
        (32, 32),
        (32, 3),
    ]
    assert all(p["bias"].shape == (p["kernel"].shape[1],) for p in model.params)


def test_glorot_init_bounds():
    model = MLP(2, 3, width=32, depth=3, seed=7)
    k0 = np.asarray(model.params[0]["kernel"])
    limit = np.sqrt(6.0 / (2 + 32))
    assert np.all(np.abs(k0) <= limit)
    assert np.std(k0) > 0.1 * limit


def test_apply_matches_apply_single():
    model = MLP(2, 3, seed=1)
    x = jax.random.uniform(jax.random.PRNGKey(0), (10, 2), dtype=jnp.float64)
    batched = model.apply(model.params, x)
    single = jnp.stack([model.apply_single(model.params, xi) for xi in x])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single), atol=1e-12)


def test_keras_json_roundtrip():
    model = MLP(2, 3, width=32, depth=3, seed=1)
    arch = json.loads(model.to_json())
    assert arch["class_name"] == "Sequential"
    layers = arch["config"]["layers"]
    assert len(layers) == 4
    assert layers[0]["config"]["batch_input_shape"] == [None, 2]
    assert layers[0]["config"]["activation"] == "tanh"
    assert layers[-1]["config"]["activation"] == "linear"

    rebuilt = model_from_json(model.to_json())
    assert rebuilt.layer_sizes == model.layer_sizes
    assert rebuilt.activation_name == "tanh"


def test_h5_weights_roundtrip(tmp_path):
    model = MLP(2, 3, seed=1)
    path = tmp_path / "Weights.h5"
    model.save_weights(path)
    other = MLP(2, 3, seed=2)
    x = jax.random.uniform(jax.random.PRNGKey(0), (5, 2), dtype=jnp.float64)
    assert not np.allclose(
        np.asarray(model.apply(model.params, x)),
        np.asarray(other.apply(other.params, x)),
    )
    other.load_weights(path)
    np.testing.assert_allclose(
        np.asarray(model.apply(model.params, x)),
        np.asarray(other.apply(other.params, x)),
        atol=1e-12,
    )


def test_npz_weights_roundtrip(tmp_path):
    model = MLP(3, 3, seed=1)
    path = str(tmp_path / "weights.npz")
    model.save_weights(path)
    other = MLP(3, 3, seed=5)
    other.load_weights(path)
    for a, b in zip(model.params, other.params):
        np.testing.assert_array_equal(np.asarray(a["kernel"]), np.asarray(b["kernel"]))


def test_model_untaped_outside_tape():
    model = MLP(2, 3, seed=1)
    x = jnp.zeros((4, 2), dtype=jnp.float64)
    out = model(x)
    assert isinstance(out, jax.Array)
