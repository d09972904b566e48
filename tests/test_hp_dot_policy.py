"""The TPINN_HP_DOT auto-policy (round-5 VERDICT item 1b): long
second-order rounds auto-select the packed bf16_3x lowering ('high',
~1.5x the hp train throughput of the f32-exact packed-6x default) while
short rounds, explicit user pins, and non-TPU backends are untouched."""

import os

import pytest

from tpinn.optimize import (_HP_DOT_AUTO_MIN_EPOCHS, _hp_dot_round,
                            hp_dot_auto_policy)


def test_policy_thresholds():
    assert hp_dot_auto_policy(_HP_DOT_AUTO_MIN_EPOCHS - 1) is None
    assert hp_dot_auto_policy(_HP_DOT_AUTO_MIN_EPOCHS) == "high"
    assert hp_dot_auto_policy(10 * _HP_DOT_AUTO_MIN_EPOCHS) == "high"
    assert hp_dot_auto_policy(0) is None


def test_round_context_sets_and_restores_on_tpu(monkeypatch):
    import tpinn.optimize as opt

    monkeypatch.delenv("TPINN_HP_DOT", raising=False)
    monkeypatch.setattr(opt.jax, "default_backend", lambda: "tpu")
    with _hp_dot_round(_HP_DOT_AUTO_MIN_EPOCHS):
        assert os.environ["TPINN_HP_DOT"] == "high"
    assert "TPINN_HP_DOT" not in os.environ

    # short round: the f32-exact default stays
    with _hp_dot_round(_HP_DOT_AUTO_MIN_EPOCHS - 1):
        assert "TPINN_HP_DOT" not in os.environ


def test_round_context_respects_user_pin(monkeypatch):
    import tpinn.optimize as opt

    monkeypatch.setattr(opt.jax, "default_backend", lambda: "tpu")
    # an explicit pin (e.g. 'mosaic' bit-parity rerun) must never be
    # overridden by the auto-policy
    monkeypatch.setenv("TPINN_HP_DOT", "mosaic")
    with _hp_dot_round(10 * _HP_DOT_AUTO_MIN_EPOCHS):
        assert os.environ["TPINN_HP_DOT"] == "mosaic"
    assert os.environ["TPINN_HP_DOT"] == "mosaic"


def test_round_context_noop_off_tpu(monkeypatch):
    monkeypatch.delenv("TPINN_HP_DOT", raising=False)
    # conftest forces the CPU backend: the policy must not fire
    with _hp_dot_round(10 * _HP_DOT_AUTO_MIN_EPOCHS):
        assert "TPINN_HP_DOT" not in os.environ


def test_restores_even_on_exception(monkeypatch):
    import tpinn.optimize as opt

    monkeypatch.delenv("TPINN_HP_DOT", raising=False)
    monkeypatch.setattr(opt.jax, "default_backend", lambda: "tpu")
    with pytest.raises(RuntimeError):
        with _hp_dot_round(_HP_DOT_AUTO_MIN_EPOCHS):
            raise RuntimeError("boom")
    assert "TPINN_HP_DOT" not in os.environ
