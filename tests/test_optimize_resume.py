"""Exact resume of on-device second-order rounds across process restarts.

A multi-round campaign runs each round in a fresh process (lane scripts cap
rounds with `timeout`), so everything the optimizer needs must round-trip
through checkpoint.pkl: the dense-BFGS inverse Hessian + two-float carry, and
the LM float64 theta carry + damping.  Without this, every restart rounds the
split-carry ``lo`` channel away and the next round re-stalls at the f32
materialization floor (measured on coronary #005, RESULTS_TPU.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

import tpinn as ns
from tests.test_optimize_bfgs import TinyModel32, _f32_config
from tpinn.checkpoint import load_checkpoint, save_checkpoint


def _lattice_problem():
    """Sub-ulp lattice target (see test_optimize_bfgs): the f32 parameter
    grid cannot get closer than ~8e-8, the f64 carry must."""
    model = TinyModel32()
    x = jnp.ones((4, 1), jnp.float32)
    target64 = np.array([8e-8, -8e-8])
    t_hi = jnp.asarray(target64.astype(np.float32))
    t_lo = jnp.asarray((target64 - t_hi.astype(np.float64)).astype(np.float32))

    def residual():
        return (model(x) - t_hi) - t_lo

    pb = ns.OptimizationProblem(
        model.variables, [ns.LossMeanSquares("fit", residual)], []
    )
    return model, pb, target64


def _w64(model, theta64):
    from jax.flatten_util import ravel_pytree

    _, unravel = ravel_pytree(model.params)
    hi = theta64.astype(np.float32)
    lo = (theta64 - hi.astype(np.float64)).astype(np.float32)
    p_hi, p_lo = unravel(jnp.asarray(hi)), unravel(jnp.asarray(lo))
    k64 = np.asarray(p_hi[0]["kernel"], np.float64) + np.asarray(
        p_lo[0]["kernel"], np.float64
    )
    b64 = np.asarray(p_hi[0]["bias"], np.float64) + np.asarray(
        p_lo[0]["bias"], np.float64
    )
    return k64[0] + b64


def _restart(tmp_path, model, pb):
    """Simulate a process restart: round-trip params + tagged opt state
    through the real checkpoint pickle, rebuild the problem fresh."""
    path = tmp_path / "checkpoint.pkl"
    save_checkpoint(path, model.variables.get(), opt_state=pb.last_opt_state)
    ckpt = load_checkpoint(path)
    model2, pb2, _ = _lattice_problem()
    model2.variables.set(jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), ckpt["params"]))
    pb2.resume_opt_state = ckpt["opt_state"]
    return model2, pb2


def test_lm_split_carry_resumes_across_restart(tmp_path):
    with _f32_config():
        model, pb, target64 = _lattice_problem()
        ns.minimize(pb, "jax", "LM", num_epochs=4, chunk=4)
        assert isinstance(pb.last_opt_state, dict)
        assert str(pb.last_opt_state["kind"]) == "lm"

        model2, pb2 = _restart(tmp_path, model, pb)
        ns.minimize(pb2, "jax", "LM", num_epochs=6, chunk=4)
        w64 = _w64(model2, pb2.last_theta64)
    # same floor as the uninterrupted 10-epoch run in test_optimize_bfgs
    np.testing.assert_allclose(w64, target64, rtol=0, atol=1e-10)


def test_bfgs_split_carry_resumes_across_restart(tmp_path):
    with _f32_config():
        model, pb, target64 = _lattice_problem()
        ns.minimize(pb, "jax", "BFGS", num_epochs=40)
        assert str(pb.last_opt_state["kind"]) == "bfgs_split"

        model2, pb2 = _restart(tmp_path, model, pb)
        ns.minimize(pb2, "jax", "BFGS", num_epochs=40)
        w64 = _w64(model2, pb2.last_theta64)
    # 40+40 resumed must match the uninterrupted 80-epoch run's floor
    np.testing.assert_allclose(w64, target64, rtol=0, atol=5e-9)


def test_stale_resume_state_is_discarded(tmp_path):
    """A carry whose parameter channel mismatches the loaded params (e.g.
    an Adam round ran in between) must be ignored, not adopted."""
    with _f32_config():
        model, pb, target64 = _lattice_problem()
        ns.minimize(pb, "jax", "BFGS", num_epochs=20)
        stale = pb.last_opt_state

        model2, pb2, _ = _lattice_problem()  # fresh init params != carry hi
        pb2.resume_opt_state = jax.tree_util.tree_map(
            lambda a: np.asarray(a), stale
        )
        ns.minimize(pb2, "jax", "BFGS", num_epochs=30)
        # cold start from the fresh params still converges to the f32 floor
        assert pb2.history.loss_global[-1] < 1e-9
        # LM with a BFGS-tagged state: also discarded cleanly
        model3, pb3, _ = _lattice_problem()
        pb3.resume_opt_state = jax.tree_util.tree_map(
            lambda a: np.asarray(a), stale
        )
        ns.minimize(pb3, "jax", "LM", num_epochs=5, chunk=4)
        assert pb3.history.loss_global[-1] < 1e-9


def test_checkpoint_callback_snapshots_inflight_params(tmp_path):
    """Mid-round checkpoint flushes must hold the CURRENT params, not the
    round-start params (the pre-fix behavior silently restarted rounds)."""
    with _f32_config():
        model, pb, _ = _lattice_problem()
        start = np.asarray(
            jax.flatten_util.ravel_pytree(model.variables.get())[0]
        )
        path = tmp_path / "ckpt.pkl"
        pb.callbacks.append(ns.utils.CheckpointCallback(path, frequency=1))
        ns.minimize(pb, "jax", "BFGS", num_epochs=10)
        ckpt = load_checkpoint(path)
        flat = np.concatenate([
            np.asarray(leaf).ravel()
            for leaf in jax.tree_util.tree_leaves(ckpt["params"])
        ])
        cur = np.asarray(
            jax.flatten_util.ravel_pytree(model.variables.get())[0]
        )
        assert not np.array_equal(flat, start)
        np.testing.assert_array_equal(flat, cur)


class _OptStateRecorder:
    """Snapshots pb.last_opt_state at every callback fire."""

    def __init__(self):
        self.snaps = []

    def __call__(self, pb, iteration, force=False):
        st = pb.last_opt_state
        self.snaps.append((iteration, None if st is None else dict(st)))


def test_iter0_flush_does_not_clobber_adopted_state(tmp_path):
    """ADVICE r2 (medium): on resume, the iteration-0 log point fires the
    CheckpointCallback — pb.last_opt_state must already hold the ADOPTED
    tagged state there, not None, or a kill before the next flush
    permanently loses the f64 carry (pre-fix: checkpoint.pkl rewritten with
    opt_state=None at iter 0).  Checked for both LM and dense BFGS."""
    with _f32_config():
        model, pb, _ = _lattice_problem()
        ns.minimize(pb, "jax", "LM", num_epochs=3, chunk=4)
        theta_saved = np.asarray(pb.last_opt_state["theta64"])

        model2, pb2 = _restart(tmp_path, model, pb)
        rec = _OptStateRecorder()
        pb2.callbacks.append(rec)
        ns.minimize(pb2, "jax", "LM", num_epochs=1, chunk=4)
        it0, st0 = rec.snaps[0]
        assert st0 is not None, "iter-0 callback saw opt_state=None"
        assert str(st0["kind"]) == "lm"
        np.testing.assert_array_equal(np.asarray(st0["theta64"]),
                                      theta_saved)

        # dense BFGS: same contract for the two-float carry
        model3, pb3, _ = _lattice_problem()
        ns.minimize(pb3, "jax", "BFGS", num_epochs=5)
        model4, pb4 = _restart(tmp_path, model3, pb3)
        rec4 = _OptStateRecorder()
        pb4.callbacks.append(rec4)
        ns.minimize(pb4, "jax", "BFGS", num_epochs=1)
        it0, st0 = rec4.snaps[0]
        assert st0 is not None and str(st0["kind"]) == "bfgs_split"


def test_kind_mismatch_preserves_resume_state_for_later_round():
    """ADVICE r2 (low): a tagged state meant for a LATER round of a
    different kind must survive an earlier round's _consume_resume_state
    call instead of being silently dropped."""
    with _f32_config():
        model, pb, _ = _lattice_problem()
        ns.minimize(pb, "jax", "LM", num_epochs=3, chunk=4)
        lm_state = jax.tree_util.tree_map(np.asarray, pb.last_opt_state)
        theta_saved = np.asarray(lm_state["theta64"])

        model2, pb2, _ = _lattice_problem()
        model2.variables.set(jax.tree_util.tree_map(
            lambda a: jnp.asarray(a.astype(np.float32))
            if a.dtype == np.float64 else jnp.asarray(a),
            model.variables.get()))
        pb2.resume_opt_state = lm_state
        # a BFGS round runs FIRST: it must not consume the lm-tagged state
        ns.minimize(pb2, "jax", "BFGS", num_epochs=1)
        assert pb2.resume_opt_state is not None, (
            "BFGS round consumed an lm-tagged resume state")


def test_malformed_lm_checkpoint_cold_starts():
    """ADVICE r2 (low): a malformed lm-tagged state (hand-edited / None
    fields) must cold-start the round, not raise."""
    with _f32_config():
        model, pb, _ = _lattice_problem()
        pb.resume_opt_state = {"kind": "lm", "theta64": None, "mu": 1e-3}
        ns.minimize(pb, "jax", "LM", num_epochs=3, chunk=4)
        assert pb.history.loss_global[-1] < pb.history.loss_global[0]
