"""Golden-parity tests against the reference's committed artifacts.

The reference repo ships real History_Loss.json files under
Examples/*/Test_Case_#NNN/ (the machine-readable ground truth, SURVEY.md §6).
Our History loader and schema writer must round-trip them, and our history
files must satisfy the same invariants theirs do.
"""

import json
import os

import numpy as np
import pytest

from tpinn.history import History

REF = "/root/reference/Examples"
POISEUILLE_016 = os.path.join(
    REF, "Poiseuille_Flow", "Test_Case_#016", "History_Loss.json"
)


requires_reference = pytest.mark.skipif(
    not os.path.exists(POISEUILLE_016), reason="reference artifacts absent"
)


@requires_reference
def test_load_reference_history():
    h = History.load(POISEUILLE_016)
    assert h.round_names == ["keras_Adam", "scipy_BFGS"]
    assert h.round_starts == [0, 101]
    assert h.iters[0] == 0 and h.iters[10] == 100 and h.iters[11] == 101
    # stride-10 logging within rounds
    assert h.iter_round[1] - h.iter_round[0] == 10
    # loss metadata schema
    entry = h.losses["PDE_MOMU"]
    assert set(entry.keys()) >= {"weight", "non_negative", "display_sqrt", "log"}
    assert len(entry["log"]) == len(h.iters)


@requires_reference
def test_reference_loss_global_invariant():
    """loss_global(t) == Σ w_i · raw_i(t) — the invariant our optimizer
    reproduces (verified on the reference's own data)."""
    with open(POISEUILLE_016) as f:
        d = json.load(f)
    iters = d["log"]["iter"]
    total = np.asarray(d["log"]["loss_global"])
    acc = np.zeros_like(total)
    for entry in d["losses"].values():
        acc += entry["weight"] * np.asarray(entry["log"])
    # relative agreement at start and end (same tolerance SURVEY verified)
    np.testing.assert_allclose(acc[0], total[0], rtol=1e-6)
    np.testing.assert_allclose(acc[-1], total[-1], rtol=1e-6)


@requires_reference
def test_our_schema_matches_reference_keys():
    with open(POISEUILLE_016) as f:
        ref = json.load(f)
    ours = History.load(POISEUILLE_016).to_dict()
    assert set(ref.keys()) == set(ours.keys()) - set()
    assert set(ref["log"].keys()) == set(ours["log"].keys())
    for name, entry in ref["losses"].items():
        assert set(entry.keys()) <= set(ours["losses"][name].keys())
    assert ref["log_rounds"]["rounds"] == ours["log_rounds"]["rounds"]
    assert (
        ref["log_rounds"]["iteration_start"]
        == ours["log_rounds"]["iteration_start"]
    )


@requires_reference
def test_reference_options_file_parse():
    from tpinn.config import SimulationOptions

    path = os.path.join(REF, "Poiseuille_Flow", "simulation_options.txt")
    opts = SimulationOptions.from_file(path)
    assert opts.epochs == 10000
    assert opts.n_pde == 1000 and opts.n_bc == 100 and opts.n_vel == 10
    assert opts.n_test == 1000


@requires_reference
def test_reference_bpoints_flags():
    from tpinn.oracles.io import load_bpoints

    path = "/root/reference/DataGeneration/data/SteadyCase/bpoints.npy"
    bp = load_bpoints(path)
    assert bp["NOSL"].shape[0] == 701
    assert bp["INF"].shape[0] == 33
    assert bp["OUT1"].shape[0] == 33
    assert bp["OUT2"].shape[0] == 33


@requires_reference
def test_generated_bpoints_match_reference():
    """generate_bpoints (subdomain marking re-implementation) reproduces the
    reference's bpoints.npy exactly — same 800 points, same flags
    (reference DataGeneration/coronary.py:24-66)."""
    import numpy as np

    from tpinn.oracles.coronary import generate_bpoints

    ref = np.load("/root/reference/DataGeneration/data/SteadyCase/bpoints.npy")
    mine = generate_bpoints("/root/reference/Examples/Coronary_Flow/coroParam.msh")
    assert mine.shape == ref.shape == (800, 4)
    assert set(map(tuple, mine)) == set(map(tuple, ref))
