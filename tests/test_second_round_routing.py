"""Every advertised --second-round choice must actually run a round.

Round-2 review found the coronary example's hand-rolled dispatch silently
no-op'd on 'scipy-parity' (no matching branch → Adam-only run saved with no
error) and ran the HOST scipy round for 'scipy' while its help text promised
the resumable on-device dense BFGS.  The dispatch now lives in ONE routing
table (tpinn.driver.run_second_round) shared by StandardNSDriver.train and
the mesh-case example CLIs; these tests pin (a) the name → optimizer-round
mapping for every public choice, (b) that unknown names raise instead of
skipping, and (c) that every example CLI's advertised choices are covered by
the dispatch it uses.
"""

import ast
import glob
import os

import pytest

import tpinn as ns
from tests.test_optimize_bfgs import _make_problem
from tpinn.driver import SECOND_ROUND_CHOICES, run_second_round

# choice → expected history round label appended by the second round
EXPECTED_ROUND = {
    "scipy": "jax_BFGS",            # resumable on-device dense BFGS
    "scipy-parity": "scipy_BFGS",   # reference host round
    "scipy-host": "scipy_BFGS",
    "jax": "jax_L-BFGS",
    "jax-bfgs": "jax_BFGS",
    "bfgs": "jax_BFGS",
    "lm": "jax_LM",
    "jax-lm": "jax_LM",
    "gn": "jax_LM",
    "adam": "keras_Adam",
    "none": None,
}


def test_choices_and_mapping_in_sync():
    assert set(EXPECTED_ROUND) == set(SECOND_ROUND_CHOICES)


@pytest.mark.parametrize("choice", SECOND_ROUND_CHOICES)
def test_every_choice_appends_expected_round(choice):
    _, pb = _make_problem()
    run_second_round(pb, choice, epochs=3)
    expected = EXPECTED_ROUND[choice]
    if expected is None:
        assert pb.history.round_names == []
    else:
        assert pb.history.round_names == [expected], (
            f"--second-round {choice} appended {pb.history.round_names}, "
            f"expected [{expected}]"
        )


def test_scipy_honours_lbfgs_method():
    _, pb = _make_problem()
    run_second_round(pb, "scipy", epochs=3, scipy_method="L-BFGS-B")
    assert pb.history.round_names == ["jax_L-BFGS"]


def test_unknown_choice_raises_instead_of_silently_skipping():
    _, pb = _make_problem()
    with pytest.raises(ValueError, match="unknown second_round"):
        run_second_round(pb, "scipy-parityy", epochs=3)
    assert pb.history.round_names == []


def test_none_second_round_is_accepted():
    _, pb = _make_problem()
    run_second_round(pb, None, epochs=3)
    assert pb.history.round_names == []


def test_lm_bound_driver_keeps_residual_losses(monkeypatch, tmp_path):
    """An LM-bound StandardNSDriver must NOT route its PDE losses through
    the fused Pallas kernel: the kernel only exposes the three MSE scalars,
    and minimize('jax','LM') needs the stacked residual vector.  This is
    the crash that aborted every lane_tpu18 round in round 2 (f64 LM resume
    on Poiseuille/Cavity hit PrecomputedMeanSquares and raised)."""
    from tpinn.config import SimulationOptions
    from tpinn.driver import CaseSpec, StandardNSDriver
    from tpinn.losses import LossMeanSquares
    from tpinn.oracles import analytic
    from tpinn.pipeline import NSPhysics

    import tpinn.pipeline as pipeline

    # force the fused-MSE routing policy to "eligible" (as on a real TPU
    # backend) without TPINN_USE_PALLAS, which would also flip the
    # ResidualBundle jet path onto the forward-only bundle kernel
    monkeypatch.setattr(pipeline, "use_fused_pde_losses",
                        lambda *a, **k: True)
    prm = analytic.PoiseuilleParams()
    spec = CaseSpec(
        name="Poiseuille_LM",
        extents=[(0.0, 1.0), (0.0, 0.1)],
        grid_shape=(12, 8),
        physics=NSPhysics(conv=prm.rho, visc=prm.mu),
        exact=(
            lambda x: analytic.poiseuille_u(x, prm),
            lambda x: analytic.poiseuille_v(x, prm),
            lambda x: analytic.poiseuille_p(x, prm),
        ),
        bnd_val={
            0: {"BOT": 0.0, "TOP": 0.0,
                "SX": lambda x: analytic.poiseuille_u(x, prm),
                "DX": prm.p_out},
            1: {"BOT": 0.0, "TOP": 0.0, "SX": 0.0, "DX": 0.0},
        },
        neumann={("DX", 0): 0, ("DX", 1): 0},
    )
    opts = SimulationOptions(epochs=2, n_pde=30, n_bc=8, n_vel=4, n_pres=0,
                             n_test=20)
    driver = StandardNSDriver(spec, opts, base_dir=str(tmp_path),
                              save_results=False, seed=0,
                              second_round="lm", adam_epochs=5)
    assert all(type(l) is LossMeanSquares for l in driver.losses), (
        "LM-bound driver built non-residual losses: "
        + str([type(l).__name__ for l in driver.losses])
    )
    pb = driver.train(callbacks=False)
    assert pb.history.round_names == ["keras_Adam", "jax_LM"]

    # the same spec NOT bound for LM keeps the fused fast path — on a
    # single device that is the ONE-PASS weighted objective (loss + log
    # MSEs + grads from one kernel launch), and a short Adam + dense-BFGS
    # train through it must descend with both rounds logged
    driver2 = StandardNSDriver(spec, opts, base_dir=str(tmp_path),
                               save_results=False, seed=0,
                               second_round="jax-bfgs", adam_epochs=5)
    from tpinn.losses import PrecomputedMeanSquares

    assert all(type(l) is PrecomputedMeanSquares for l in driver2.losses[:3])
    assert "FusedNSWeightedObjective" in driver2.losses[0].fn.__qualname__
    pb2 = driver2.train(callbacks=False)
    assert pb2.history.round_names == ["keras_Adam", "jax_BFGS"]
    assert pb2.history.loss_global[-1] < pb2.history.loss_global[0]


# --------------------------------------------------------------------------
# static CLI audit: each example advertising --second-round must dispatch
# every advertised choice
# --------------------------------------------------------------------------

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _advertised_choices(path):
    """Extract the choices= list of the --second-round argparse option."""
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"
                and node.args
                and isinstance(node.args[0], ast.Constant)
                and node.args[0].value == "--second-round"):
            for kw in node.keywords:
                if kw.arg == "choices":
                    try:
                        return list(ast.literal_eval(kw.value))
                    except ValueError:
                        # choices=list(ns.driver.SECOND_ROUND_CHOICES):
                        # delegates to the shared table by construction
                        return list(SECOND_ROUND_CHOICES)
    return None


def _dispatch_coverage(path):
    """For a hand-rolled ``if second_round == ...`` chain: the set of string
    constants it matches and whether it ends in a catch-all else."""
    tree = ast.parse(open(path).read())
    matched, catchall = set(), False

    def uses_second_round(test):
        return any(isinstance(n, ast.Name) and n.id == "second_round"
                   for n in ast.walk(test))

    for node in ast.walk(tree):
        if not (isinstance(node, ast.If) and uses_second_round(node.test)):
            continue
        cur = node
        while True:
            if (isinstance(cur.test, ast.Compare)
                    and any(isinstance(op, ast.NotEq)
                            for op in cur.test.ops)):
                # `elif second_round != "none":` is a catch-all except the
                # excluded constant (which falls through to no round)
                catchall = True
            for n in ast.walk(cur.test):
                if isinstance(n, ast.Constant) and isinstance(n.value, str):
                    matched.add(n.value)
            if not cur.orelse:
                break
            if len(cur.orelse) == 1 and isinstance(cur.orelse[0], ast.If):
                cur = cur.orelse[0]
            else:
                catchall = True
                break
    return matched, catchall


def test_every_example_cli_choice_is_dispatched():
    examples = [p for p in glob.glob(os.path.join(_REPO, "examples/*/*.py"))
                if "--second-round" in open(p).read()]
    assert examples, "no example CLIs found"
    for path in examples:
        rel = os.path.relpath(path, _REPO)
        choices = _advertised_choices(path)
        assert choices, f"{rel}: --second-round has no choices list"
        src = open(path).read()
        if "run_second_round(" in src or "StandardNSDriver" in src:
            # delegates to the shared router (directly or via the driver):
            # advertised choices must be names the router accepts
            missing = set(choices) - set(SECOND_ROUND_CHOICES)
            assert not missing, (
                f"{rel} advertises choices the shared router rejects: "
                f"{sorted(missing)}"
            )
        else:
            # legacy-parity scripts keep their own chain (their 'scipy'
            # intentionally means the host round, matching the reference
            # scripts they mirror) — every advertised choice must hit a
            # branch or the catch-all; 'none' may fall through (no round)
            matched, catchall = _dispatch_coverage(path)
            uncovered = {c for c in choices
                         if c != "none" and c not in matched and not catchall}
            assert not uncovered, (
                f"{rel} silently skips --second-round {sorted(uncovered)} — "
                "add a branch or route through tpinn.driver.run_second_round"
            )
