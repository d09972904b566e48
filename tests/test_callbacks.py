import jax.numpy as jnp

import tpinn as ns
from tpinn.checkpoint import load_checkpoint
from tpinn.utils import CheckpointCallback, HistoryPlotCallback


def _problem():
    model = ns.models.MLP(2, 1, width=8, depth=1, seed=0)
    x = jnp.zeros((4, 2))
    pb = ns.OptimizationProblem(
        model.variables, [ns.LossMeanSquares("l", lambda: model(x))], []
    )
    pb.history.start_round("keras_Adam")
    pb.history.append(0, 1.0, {"l": 1.0}, {})
    return model, pb


def test_checkpoint_callback_writes_state(tmp_path):
    # rate-based firing (round 2): the FIRST call always writes (resumed
    # rounds start at arbitrary offsets), then again only after >= frequency
    # further iterations; force always writes.
    model, pb = _problem()
    path = tmp_path / "ckpt.pkl"
    cb = CheckpointCallback(path, frequency=100)
    cb(pb, 50)
    assert path.exists()  # first call fires
    path.unlink()
    cb(pb, 100)  # only 50 since last fire: no write
    assert not path.exists()
    cb(pb, 150)
    assert path.exists()
    state = load_checkpoint(path)
    assert state["extra"]["iteration"] == 150
    assert state["extra"]["rounds"] == ["keras_Adam"]
    # refire at same iteration is a no-op; force always writes
    path.unlink()
    cb(pb, 150)
    assert not path.exists()
    cb(pb, 173, force=True)
    assert path.exists()


def test_history_callback_frequency(tmp_path):
    model, pb = _problem()
    hist = tmp_path / "h.json"
    cb = HistoryPlotCallback(frequency=100, filename_history=str(hist),
                             plot=False)
    cb(pb, 99)
    assert hist.exists()  # first call fires (rate-based, round 2)
    hist.unlink()
    cb(pb, 150)  # 51 since last: below frequency, no write
    assert not hist.exists()
    cb(pb, 200)
    assert hist.exists()
