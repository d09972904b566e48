import json

import jax.numpy as jnp
import numpy as np

import tpinn as ns
from tpinn.history import History
from tpinn.losses import Loss, LossMeanSquares


def test_lms_value_and_metadata():
    lms = LossMeanSquares("PDE", lambda: jnp.array([1.0, 2.0, 3.0]), weight=10.0)
    assert abs(float(lms.raw_value()) - (1 + 4 + 9) / 3) < 1e-12
    md = lms.metadata()
    assert md == {"weight": 10.0, "non_negative": True, "display_sqrt": True}


def test_lms_normalization_divides_residual():
    # normalization=1e4 usage: Examples_Old/Lid_Driven_Cavity/cavity_steady.py:218-220
    lms = LossMeanSquares("PDE", lambda: jnp.array([2.0, 4.0]), normalization=2.0)
    assert float(lms.raw_value()) == (1.0 + 4.0) / 2


def test_generic_loss_non_negative():
    l = Loss("PRESS_0", lambda: jnp.abs(jnp.mean(jnp.array([1.0, -3.0]))),
             weight=1e-2, normalization=1.0, non_negative=True)
    assert float(l.raw_value()) == 1.0
    assert l.metadata()["non_negative"] is True
    assert l.metadata()["display_sqrt"] is False


def _mini_history():
    h = History()
    train = [LossMeanSquares("A", lambda: jnp.zeros(1), weight=2.0),
             LossMeanSquares("B", lambda: jnp.zeros(1), weight=0.5)]
    test = [LossMeanSquares("t", lambda: jnp.zeros(1))]
    h.register_losses(train, test)
    return h


def test_history_schema_and_round_offsets():
    h = _mini_history()
    h.start_round("keras_Adam")
    for it in range(0, 101, 10):
        h.append(it, 1.0, {"A": 0.4, "B": 0.4}, {"t": 0.1})
    h.start_round("scipy_BFGS")
    for it in range(0, 31, 10):
        h.append(it, 0.5, {"A": 0.2, "B": 0.2}, {"t": 0.05})

    d = h.to_dict()
    # exact reference schema keys (SURVEY.md §2.1)
    assert set(d.keys()) == {"log", "losses", "losses_test", "log_rounds"}
    assert set(d["log"].keys()) == {"iter", "round", "iter_round", "loss_global"}
    assert set(d["losses"]["A"].keys()) == {
        "weight", "non_negative", "display_sqrt", "log"}
    # Adam occupies 0..100; scipy starts at 101 (reference Test_Case_#016)
    assert d["log_rounds"]["rounds"] == ["keras_Adam", "scipy_BFGS"]
    assert d["log_rounds"]["iteration_start"][:2] == [0, 101]
    assert d["log"]["iter"][:3] == [0, 10, 20]
    assert d["log"]["iter"][11] == 101
    assert d["log"]["round"][0] == 1 and d["log"]["round"][-1] == 2
    assert d["log"]["iter_round"][11] == 0


def test_history_save_load_roundtrip(tmp_path):
    h = _mini_history()
    h.start_round("keras_Adam")
    h.append(0, 1.0, {"A": 0.4, "B": 0.4}, {"t": 0.1})
    p = tmp_path / "History_Loss.json"
    h.save(p)
    loaded = History.load(p)
    assert loaded.to_dict()["log"] == h.to_dict()["log"]
    # file is plain JSON consumable by reference-style tooling
    raw = json.loads(p.read_text())
    assert raw["losses"]["A"]["weight"] == 2.0


def test_loss_global_invariant():
    # loss_global == sum(weight_i * raw_i) — verified numerically on the
    # reference artifacts (SURVEY.md §2.1).
    lms = [LossMeanSquares("A", lambda: jnp.array([1.0]), weight=3.0),
           LossMeanSquares("B", lambda: jnp.array([2.0]), weight=0.5)]
    total = sum(l.weight * float(l.raw_value()) for l in lms)
    assert total == 3.0 * 1.0 + 0.5 * 4.0
