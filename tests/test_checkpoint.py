import jax
import jax.numpy as jnp
import numpy as np

import tpinn as ns
from tpinn import checkpoint
from tpinn.history import History


def test_save_load_experiment_roundtrip(tmp_path):
    model = ns.models.MLP(2, 3, seed=4)
    h = History()
    h.register_losses([ns.LossMeanSquares("A", lambda: jnp.zeros(1))], [])
    h.start_round("keras_Adam")
    h.append(0, 1.0, {"A": 1.0}, {})

    folder = tmp_path / "Test_Case_#001"
    checkpoint.save_experiment(folder, model, h)
    assert (folder / "Model.json").exists()
    assert (folder / "Weights.h5").exists()
    assert (folder / "History_Loss.json").exists()
    assert (folder / "checkpoint.pkl").exists()

    model2, h2 = checkpoint.load_experiment(folder)
    x = jax.random.uniform(jax.random.PRNGKey(0), (7, 2), dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(model.apply(model.params, x)),
        np.asarray(model2.apply(model2.params, x)),
        atol=1e-12,
    )
    assert h2.round_names == ["keras_Adam"]


def test_full_state_checkpoint(tmp_path):
    model = ns.models.MLP(2, 1, seed=0)
    import optax

    opt = optax.adam(1e-2)
    state = opt.init(model.params)
    key = jax.random.PRNGKey(42)
    path = tmp_path / "ckpt.pkl"
    checkpoint.save_checkpoint(path, model.params, state, key, extra={"it": 7})
    loaded = checkpoint.load_checkpoint(path)
    assert loaded["extra"]["it"] == 7
    np.testing.assert_array_equal(loaded["prng_key"], np.asarray(key))
    for a, b in zip(
        jax.tree_util.tree_leaves(model.params),
        jax.tree_util.tree_leaves(loaded["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), b)
