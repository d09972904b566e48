"""The driver's multi-chip verdict runs __graft_entry__; pin it here.

conftest.py provides the virtual 8-device CPU platform, so ``_dryrun_body``
(the sharded train step itself) runs in-process — exactly the graph the
driver's MULTICHIP check compiles and executes.
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    loss = jax.jit(fn)(*args)
    assert float(loss) > 0 and float(loss) < 1e6


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_sharded_step_8_devices(capsys):
    # paths 1-2: 2-D-mesh train step + fused shard_map kernels (exact-mean
    # masking, one-pass objective equality)
    graft._dryrun_sharded_step(8)
    out = capsys.readouterr().out
    assert "'points': 4" in out and "'model': 2" in out


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_training_deep_8_devices(capsys):
    # path 3: full Adam + L-BFGS rounds, sharded vs single-device history
    graft._dryrun_training_deep(8)
    assert "training-deep" in capsys.readouterr().out


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_second_order_8_devices(capsys):
    # path 4: per-point-Gram LM round under the mesh
    graft._dryrun_second_order(8)
    assert "second-order" in capsys.readouterr().out


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_dispatches_inproc_when_devices_available(monkeypatch):
    # Backend is initialized with 8 devices here, so the public entry point
    # must take the in-process path (no subprocess).  The body itself is
    # covered by the three stage tests above; a recorder keeps this dispatch
    # check out of the compile budget.
    calls = []
    monkeypatch.setattr(graft, "_dryrun_body", lambda n: calls.append(n))
    graft.dryrun_multichip(8)
    assert calls == [8]
