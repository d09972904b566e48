"""Checkpoint / resume: params + optimizer state + PRNG key + history cursor.

The reference checkpoints only final Keras weights (Model.json + Weights.h5,
poiseuille_flow.py:272-275) and never optimizer state (SURVEY.md §5.4).  Here
a full experiment state round-trips:

* ``save_experiment`` / ``load_experiment`` — the first-class reload path the
  reference lacked (its nearest analog: Examples_Old/Lid_Driven_Cavity/
  cavity_steady.py:262-289 load_mode flags).
* Keras-layout ``Model.json`` + ``Weights.h5`` are still written for artifact
  parity (see tpinn.models.Model.to_json / save_weights).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Optional

import jax
import numpy as np

from tpinn.history import History
from tpinn.models import Model, model_from_json


def _params_to_numpy(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_checkpoint(path, params, opt_state=None, prng_key=None, extra: Optional[dict] = None):
    """Single-file pickle checkpoint of the full training state."""
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    state = {
        "params": _params_to_numpy(params),
        "opt_state": _params_to_numpy(opt_state) if opt_state is not None else None,
        "prng_key": np.asarray(prng_key) if prng_key is not None else None,
        "extra": extra or {},
    }
    # atomic replace: periodic CheckpointCallback flushes must never leave a
    # torn checkpoint if the process dies mid-write
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    os.replace(tmp, str(path))


def load_checkpoint(path) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_experiment(folder, model: Model, history: Optional[History] = None,
                    opt_state=None, prng_key=None) -> None:
    """Write the reference artifact set: Model.json, Weights.h5, History_Loss.json
    plus a full-state checkpoint for exact resume."""
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, "Model.json"), "w") as f:
        f.write(model.to_json())
    model.save_weights(os.path.join(folder, "Weights.h5"))
    if history is not None:
        history.save(os.path.join(folder, "History_Loss.json"))
    save_checkpoint(
        os.path.join(folder, "checkpoint.pkl"),
        model.params,
        opt_state=opt_state,
        prng_key=prng_key,
    )


def load_experiment(folder):
    """Reload (model, history) from a saved experiment folder."""
    with open(os.path.join(folder, "Model.json")) as f:
        model = model_from_json(f.read())
    weights_h5 = os.path.join(folder, "Weights.h5")
    if os.path.exists(weights_h5):
        model.load_weights(weights_h5)
    history = None
    hist_path = os.path.join(folder, "History_Loss.json")
    if os.path.exists(hist_path):
        history = History.load(hist_path)
    return model, history
