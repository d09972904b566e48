"""Pallas fused-bundle kernel vs the jet-based XLA path (interpret mode on
CPU; the compiled path is exercised on TPU by bench.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpinn.models import MLP
from tpinn.operators import vtaylor_bundle
from tpinn.pallas.mlp_bundle import mlp_taylor_bundle


@pytest.mark.parametrize("n,np_tile", [(600, 256), (256, 256)])
def test_pallas_bundle_matches_jet(n, np_tile):
    model = MLP(2, 3, width=32, depth=3, seed=0, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (n, 2), dtype=jnp.float32)
    f = lambda xi: model.apply_single(model.params, xi)
    v1, j1, h1 = vtaylor_bundle(f, x, 2)
    v2, j2, h2 = mlp_taylor_bundle(model.params, x, interpret=True,
                                   np_tile=np_tile)
    assert v2.shape == (n, 3)
    assert j2.shape == (n, 3, 2)
    assert h2.shape == (n, 3, 2)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-4)


def test_pallas_bundle_3d_input():
    """Unsteady case: 3-D (t, x, y) input, derivative columns in order."""
    model = MLP(3, 3, width=16, depth=2, seed=1, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), dtype=jnp.float32)
    f = lambda xi: model.apply_single(model.params, xi)
    v1, j1, h1 = vtaylor_bundle(f, x, 3)
    v2, j2, h2 = mlp_taylor_bundle(model.params, x, interpret=True,
                                   np_tile=256)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-4)


@pytest.mark.slow
def test_ns_residual_mse_custom_vjp_matches_xla():
    """Hand-written backward kernel: grads of the fused residual MSEs match
    jax.grad of the XLA jet path to float64 precision (interpret mode)."""
    from tpinn.geometry import Normalization
    from tpinn.pallas.mlp_bundle import ns_residual_mse
    from tpinn.pipeline import (
        NSPhysics, ResidualBundle, mass_residual, momentum_residual,
    )

    model = MLP(2, 3, width=32, depth=3, seed=0, dtype=jnp.float64)
    params = model.params
    norm = Normalization(
        np.array([0.0, 500.0]), np.array([0.0, 250.0]), np.array([-1e4, 1e4])
    )
    phys = NSPhysics(conv=1.0, visc=1.0)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (300, 2)), dtype=jnp.float64
    )
    w = jnp.asarray([10.0, 1.0, 1.0])

    def xla_loss(p):
        prev = model._bound
        model._bound = p
        b = ResidualBundle(model, x, use_pallas=False)
        out = (
            w[0] * jnp.mean(mass_residual(b, norm) ** 2)
            + w[1] * jnp.mean(momentum_residual(b, 0, phys, norm) ** 2)
            + w[2] * jnp.mean(momentum_residual(b, 1, phys, norm) ** 2)
        )
        model._bound = prev
        return out

    def pallas_loss(p):
        return jnp.sum(
            w * ns_residual_mse(p, x, phys, norm, np_tile=256, interpret=True)
        )

    np.testing.assert_allclose(
        float(xla_loss(params)), float(pallas_loss(params)), rtol=1e-12
    )
    gx, _ = jax.flatten_util.ravel_pytree(jax.grad(xla_loss)(params))
    gp, _ = jax.flatten_util.ravel_pytree(jax.grad(pallas_loss)(params))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gp), atol=1e-12,
                               rtol=1e-9)


@pytest.mark.slow
def test_ns_residual_mse_unsteady_matches_xla():
    """Unsteady (t, x, y) layout: 6 Taylor streams, ∂t momentum term, and
    the hand-written backward — all vs jax.grad of the XLA jet path."""
    from tpinn.geometry import Normalization
    from tpinn.pallas.mlp_bundle import ns_residual_mse
    from tpinn.pipeline import (
        NSPhysics, ResidualBundle, mass_residual, momentum_residual,
    )

    model = MLP(3, 3, width=32, depth=3, seed=2, dtype=jnp.float64)
    params = model.params
    norm = Normalization(
        np.array([0.0, 1.0]), np.array([0.0, 1.0]), np.array([-2.0, 2.0])
    )
    phys = NSPhysics(conv=1.0, visc=1.0, time=1.0)
    x = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (300, 3)), dtype=jnp.float64
    )
    w = jnp.asarray([10.0, 1.0, 1.0])

    def xla_loss(p):
        prev = model._bound
        model._bound = p
        b = ResidualBundle(model, x, unsteady=True, use_pallas=False)
        out = (
            w[0] * jnp.mean(mass_residual(b, norm) ** 2)
            + w[1] * jnp.mean(momentum_residual(b, 0, phys, norm) ** 2)
            + w[2] * jnp.mean(momentum_residual(b, 1, phys, norm) ** 2)
        )
        model._bound = prev
        return out

    def pallas_loss(p):
        return jnp.sum(
            w * ns_residual_mse(p, x, phys, norm, np_tile=256, interpret=True)
        )

    np.testing.assert_allclose(
        float(xla_loss(params)), float(pallas_loss(params)), rtol=1e-12
    )
    gx, _ = jax.flatten_util.ravel_pytree(jax.grad(xla_loss)(params))
    gp, _ = jax.flatten_util.ravel_pytree(jax.grad(pallas_loss)(params))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gp), atol=1e-12,
                               rtol=1e-9)


def test_ns_residual_mse_rejects_mismatched_input():
    from tpinn.geometry import Normalization
    from tpinn.pallas.mlp_bundle import ns_residual_mse
    from tpinn.pipeline import NSPhysics

    model = MLP(3, 3, width=16, depth=2, seed=0, dtype=jnp.float32)
    norm = Normalization(np.array([0.0, 1.0]), np.array([0.0, 1.0]),
                         np.array([0.0, 1.0]))
    x3 = jnp.zeros((64, 3), dtype=jnp.float32)
    # steady physics with a 3-column batch
    with pytest.raises(ValueError, match="expected 2"):
        ns_residual_mse(model.params, x3, NSPhysics(), norm, np_tile=64,
                        interpret=True)
    # unsteady physics with a 2-column batch
    x2 = jnp.zeros((64, 2), dtype=jnp.float32)
    with pytest.raises(ValueError, match="expected 3"):
        ns_residual_mse(model.params, x2, NSPhysics(time=1.0), norm,
                        np_tile=64, interpret=True)


def test_ns_residual_mse_n_valid_masking():
    """Dynamic valid-count masking (round 4, exact-mean sharding): the MSEs
    with (n_valid, n_mean) = (m, m) over a padded batch equal the plain
    call over the first m rows — values AND parameter gradients."""
    from tpinn.geometry import Normalization
    from tpinn.pallas.mlp_bundle import ns_residual_mse
    from tpinn.pipeline import NSPhysics

    model = MLP(2, 3, width=32, depth=3, seed=0, dtype=jnp.float64)
    params = model.params
    norm = Normalization(
        np.array([0.0, 500.0]), np.array([0.0, 250.0]), np.array([-1e4, 1e4])
    )
    phys = NSPhysics(conv=1.0, visc=1.0)
    x = jnp.asarray(
        np.random.default_rng(5).uniform(0, 1, (64, 2)), dtype=jnp.float64
    )
    m = 37

    def masked(p):
        return jnp.sum(ns_residual_mse(p, x, phys, norm, np_tile=64,
                                       interpret=True, n_valid=m, n_mean=m))

    def plain(p):
        return jnp.sum(ns_residual_mse(p, x[:m], phys, norm, np_tile=64,
                                       interpret=True))

    np.testing.assert_allclose(float(masked(params)), float(plain(params)),
                               rtol=1e-13)
    g1, _ = jax.flatten_util.ravel_pytree(jax.grad(masked)(params))
    g2, _ = jax.flatten_util.ravel_pytree(jax.grad(plain)(params))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-10,
                               atol=1e-15)


def test_bwd_interleave_knob(monkeypatch):
    """TPINN_BWD_ILV (bwd-kernel chunk interleave experiment, measured
    negative on v5e and defaulted to 1) must be value-neutral: ilv=2 with an
    odd chunk count (zero-padded) produces the same parameter gradients as
    the default single-chunk loop."""
    from tpinn.geometry import Normalization
    from tpinn.pallas.mlp_bundle import ns_residual_mse
    from tpinn.pipeline import NSPhysics

    model = MLP(2, 3, width=32, depth=3, seed=4, dtype=jnp.float64)
    params = model.params
    norm = Normalization(
        np.array([0.0, 500.0]), np.array([0.0, 250.0]), np.array([-1e4, 1e4])
    )
    phys = NSPhysics(conv=1.0, visc=1.0)
    # np_tile=256 over 700 rows -> 3 chunks (odd, exercises the ilv padding)
    x = jnp.asarray(
        np.random.default_rng(7).uniform(0, 1, (700, 2)), dtype=jnp.float64
    )

    def loss(p):
        return jnp.sum(ns_residual_mse(p, x, phys, norm, np_tile=256,
                                       interpret=True))

    g1, _ = jax.flatten_util.ravel_pytree(jax.grad(loss)(params))
    monkeypatch.setenv("TPINN_BWD_ILV", "2")
    g2, _ = jax.flatten_util.ravel_pytree(jax.grad(loss)(params))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-12,
                               atol=1e-15)


def test_dot_precision_policy(monkeypatch):
    """The kernels' internal dot precision: ambient default -> None (fast
    bf16 single-pass); ambient 'highest' + f32 -> TPINN_HP_DOT policy
    (6-pass 'highest' default, 3-pass 'high' opt-in); f64 -> None (XLA's
    f64 emulation is exact regardless of the matmul precision attr)."""
    from tpinn.pallas.mlp_bundle import _dot_precision

    monkeypatch.delenv("TPINN_HP_DOT", raising=False)
    assert _dot_precision(jnp.float32) is None
    with jax.default_matmul_precision("highest"):
        assert _dot_precision(jnp.float32) == jax.lax.Precision.HIGHEST
        assert _dot_precision(jnp.float64) is None
        monkeypatch.setenv("TPINN_HP_DOT", "high")
        assert _dot_precision(jnp.float32) == jax.lax.Precision.HIGH
        monkeypatch.setenv("TPINN_HP_DOT", "highest")
        assert _dot_precision(jnp.float32) == jax.lax.Precision.HIGHEST
        monkeypatch.setenv("TPINN_HP_DOT", "mosaic")
        assert _dot_precision(jnp.float32) == "mosaic"


def test_dot_3x_accuracy():
    """The hand-built 3-pass bf16_3x matmul (_dot_3x): relative error vs an
    f64 reference is bounded by the dropped a_lo*b_lo term (~2^-18 per
    product, median ~2e-6 over a K=96 contraction) — ~500x below the ~1e-3
    single-pass bf16 noise the high-precision context exists to kill.
    Simulate the single-pass TPU product on CPU by pre-rounding the factors
    to bf16 and assert the 3-pass path beats it by >=2 orders."""
    from tpinn.pallas.mlp_bundle import _dot_3x

    rng = np.random.default_rng(11)
    a64 = rng.standard_normal((96, 104)) * np.exp(rng.uniform(-3, 3, (96, 104)))
    b64 = rng.standard_normal((96, 512)) * np.exp(rng.uniform(-3, 3, (96, 512)))
    ref = a64.T @ b64
    dims = (((0,), (0,)), ((), ()))
    a32, b32 = jnp.asarray(a64, jnp.float32), jnp.asarray(b64, jnp.float32)
    out = _dot_3x(a32, b32, dims, jnp.float32)
    rel = np.abs(np.asarray(out, np.float64) - ref) / (np.abs(ref) + 1e-30)
    # single-pass bf16 proxy: round both factors to bf16, f32-accumulate
    one = jax.lax.dot_general(
        a32.astype(jnp.bfloat16), b32.astype(jnp.bfloat16), dims,
        preferred_element_type=jnp.float32)
    rel1 = np.abs(np.asarray(one, np.float64) - ref) / (np.abs(ref) + 1e-30)
    assert np.median(rel) < 1e-5
    assert np.median(rel) < np.median(rel1) / 100


def test_split_3way_exact():
    """_split_3way must be an EXACT decomposition (a0+a1+a2 == a bit-for-
    bit) with every term exactly bf16-representable — the property that
    makes the packed bf16_6x dot f32-exact on the MXU."""
    from tpinn.pallas.mlp_bundle import _split_3way

    rng = np.random.default_rng(5)
    a = jnp.asarray(
        rng.standard_normal((64, 96)) * np.exp(rng.uniform(-20, 20, (64, 96))),
        jnp.float32,
    )
    a0, a1, a2 = _split_3way(a)
    np.testing.assert_array_equal(np.asarray(a0 + a1 + a2), np.asarray(a))
    for t in (a0, a1):
        np.testing.assert_array_equal(
            np.asarray(t), np.asarray(t.astype(jnp.bfloat16).astype(t.dtype))
        )


def test_dot_6x_f32_exact_class():
    """The packed bf16_6x dot (_dot_6x): vs an f64 reference its error must
    sit in the f32-exact class (the six retained products cover all terms
    >= 2^-40 relative) — and both the packed (K<=128) and the native-HIGHEST
    fallback (K>128) branches must agree with the reference."""
    from tpinn.pallas.mlp_bundle import _dot_6x

    rng = np.random.default_rng(17)
    dims = (((0,), (0,)), ((), ()))
    for K, M, N in [(96, 104, 512), (256, 32, 512)]:
        a64 = rng.standard_normal((K, M)) * np.exp(rng.uniform(-3, 3, (K, M)))
        b64 = rng.standard_normal((K, N)) * np.exp(rng.uniform(-3, 3, (K, N)))
        ref = a64.T @ b64
        out = _dot_6x(jnp.asarray(a64, jnp.float32),
                      jnp.asarray(b64, jnp.float32), dims, jnp.float32)
        rel = np.abs(np.asarray(out, np.float64) - ref) / (np.abs(ref) + 1e-30)
        # f32-exact class: product rounding + K-term f32 accumulation
        assert np.median(rel) < 5e-7, (K, np.median(rel))
        assert np.max(rel[np.abs(ref) > np.abs(ref).mean()]) < 1e-4, K


def test_dot_3x_packed_matches_additive():
    """_dot_3x's contraction-depth-packed branch (K<=128) must compute the
    identical three products as the additive 3-dot form (same hi/lo split,
    same DEFAULT-precision dots) up to f32 accumulation order — one K=3·96
    chain vs three K=96 chains + adds reassociates the sum, so agreement is
    to the f32 accumulation class (~1e-6 relative), not bit-exact."""
    from tpinn.pallas.mlp_bundle import _dot_3x, _split_hi_lo

    rng = np.random.default_rng(23)
    dims = (((0,), (0,)), ((), ()))
    a = jnp.asarray(rng.standard_normal((96, 104)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((96, 512)), jnp.float32)
    packed = _dot_3x(a, b, dims, jnp.float32)
    ah, al = _split_hi_lo(a)
    bh, bl = _split_hi_lo(b)
    d = lambda x, y: jax.lax.dot_general(  # noqa: E731
        x, y, dims, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    additive = d(ah, bh) + d(ah, bl) + d(al, bh)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(additive),
                               rtol=1e-5, atol=1e-4)


def test_high_precision_ambient_detection():
    """minimize() wraps rounds in default_matmul_precision('highest'); the
    kernels read that ambient config at trace time to shrink their streamed
    chunk (multi-pass f32 matmuls need ~4-6x the scoped VMEM)."""
    from tpinn.pallas.mlp_bundle import _high_precision_ambient

    assert not _high_precision_ambient()
    with jax.default_matmul_precision("highest"):
        assert _high_precision_ambient()
    with jax.default_matmul_precision("float32"):
        assert _high_precision_ambient()
    with jax.default_matmul_precision("default"):
        assert not _high_precision_ambient()
    assert not _high_precision_ambient()


def test_bwd_chunk_cap_accounts_for_gram_carry():
    """The streamed-bwd chunk cap must leave room for the chunk-independent
    dW/db accumulator carry (per-layer (in, out) Grams + biases) — quadratic
    in width, so wide nets shrink the chunk instead of silently overflowing
    the scoped VMEM (round-3 advisor finding).  Nets whose 256-lane FLOOR
    would still overflow must raise, not silently accept the overflow
    (round-4 advisor finding)."""
    from tpinn.pallas.mlp_bundle import (_bwd_chunk_cap, _bwd_lane_bytes,
                                         _stream_budget, bwd_chunk_fits)

    # standard 3x32 net: the ~42 KB carry is noise against the budget; the
    # cap stays generous and 256-quantized
    cap_std = _bwd_chunk_cap((2, 32, 32, 32, 3), 2, 2, 1 << 20, jnp.float32)
    assert cap_std >= 1024 and cap_std % 256 == 0

    # sweep widths/depths that FIT: streamed footprint + double-buffered
    # carry must sit inside the budget at the returned cap (checked against
    # the kernel's own live-bytes inventory, _bwd_lane_bytes — the numbers
    # a real launch allocates)
    for widths in [(2, 32, 32, 32, 3), (2, 128, 128, 128, 3),
                   (3, 256, 256, 3), (2, 64, 64, 64, 64, 64, 3)]:
        d_in, n_h = widths[0], widths[0]
        assert bwd_chunk_fits(widths, d_in, n_h, jnp.float32), widths
        cap = _bwd_chunk_cap(widths, d_in, n_h, 1 << 20, jnp.float32)
        assert cap % 256 == 0 and cap >= 256
        per_lane, carry = _bwd_lane_bytes(widths, d_in, n_h, jnp.float32)
        assert cap * per_lane + 2 * carry <= _stream_budget(jnp.float32), (
            widths, cap)

    # a net whose 256-lane floor overflows must refuse loudly — and the
    # fits-predicate that routes such nets to the XLA jet path must agree
    wide = (2, 512, 512, 512, 512)
    assert not bwd_chunk_fits(wide, 2, 2, jnp.float32)
    with pytest.raises(ValueError, match="cannot fit"):
        _bwd_chunk_cap(wide, 2, 2, 1 << 20, jnp.float32)


@pytest.mark.slow
def test_ns_residual_wide_net_capped_chunk_matches_xla():
    """Width-128 net (a shrunken chunk cap, near the budget boundary): the
    streamed bwd kernel must still produce XLA-jet-exact grads with the cap
    in force — an EXECUTED check on the live-bytes inventory, complementing
    the arithmetic assertions in test_bwd_chunk_cap_accounts_for_gram_carry
    (round-4 advisor finding: formula-only tests can't catch an error in
    the inventory itself)."""
    from tpinn.geometry import Normalization
    from tpinn.pallas.mlp_bundle import _bwd_chunk_cap, ns_residual_mse
    from tpinn.pipeline import (
        NSPhysics, ResidualBundle, mass_residual, momentum_residual,
    )

    widths = (2, 128, 128, 128, 3)
    # the cap must genuinely bind for this width (vs the 2048-lane default)
    assert _bwd_chunk_cap(widths, 2, 2, 2048, jnp.float64) < 2048

    model = MLP(2, 3, width=128, depth=3, seed=0, dtype=jnp.float64)
    params = model.params
    norm = Normalization(
        np.array([0.0, 500.0]), np.array([0.0, 250.0]), np.array([-1e4, 1e4])
    )
    phys = NSPhysics(conv=1.0, visc=1.0)
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (700, 2)), dtype=jnp.float64
    )
    w = jnp.asarray([10.0, 1.0, 1.0])

    def xla_loss(p):
        prev = model._bound
        model._bound = p
        b = ResidualBundle(model, x, use_pallas=False)
        out = (
            w[0] * jnp.mean(mass_residual(b, norm) ** 2)
            + w[1] * jnp.mean(momentum_residual(b, 0, phys, norm) ** 2)
            + w[2] * jnp.mean(momentum_residual(b, 1, phys, norm) ** 2)
        )
        model._bound = prev
        return out

    def pallas_loss(p):
        return jnp.sum(
            w * ns_residual_mse(p, x, phys, norm, np_tile=2048,
                                interpret=True)
        )

    np.testing.assert_allclose(
        float(xla_loss(params)), float(pallas_loss(params)), rtol=1e-11
    )
    gx, _ = jax.flatten_util.ravel_pytree(jax.grad(xla_loss)(params))
    gp, _ = jax.flatten_util.ravel_pytree(jax.grad(pallas_loss)(params))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gp), atol=1e-11,
                               rtol=1e-8)


def test_use_fused_pde_losses_falls_back_for_wide_nets():
    """The fused-kernel routing predicate must send nets too wide for the
    streamed-bwd VMEM floor to the XLA jet path with a warning instead of
    letting the kernel launch overflow (round-4 advisor finding)."""
    import warnings

    from tpinn.models import Model
    from tpinn.pipeline import use_fused_pde_losses

    os.environ["TPINN_USE_PALLAS"] = "1"
    try:
        ok = Model([2, 32, 32, 32, 3], dtype=jnp.float32)
        assert use_fused_pde_losses(ok, False, 2)
        wide = Model([2, 512, 512, 512, 512], dtype=jnp.float32)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert not use_fused_pde_losses(wide, False, 2)
        assert any("VMEM budget" in str(x.message) for x in w)
    finally:
        del os.environ["TPINN_USE_PALLAS"]


@pytest.mark.slow
def test_ns_residual_mse_high_precision_chunk_cap():
    """Under the highest-precision context the fused kernels cap the chunk
    at 512; results (fwd + grad) must be identical to the uncapped path.
    n=1100 with np_tile=2048 forces 512-chunking (3 chunks + tail pad)."""
    from tpinn.geometry import Normalization
    from tpinn.pallas.mlp_bundle import ns_residual_mse

    model = MLP(2, 3, width=32, depth=3, seed=0, dtype=jnp.float64)
    params = model.params
    norm = Normalization(
        np.array([0.0, 500.0]), np.array([0.0, 250.0]), np.array([-1e4, 1e4])
    )
    from tpinn.pipeline import NSPhysics

    phys = NSPhysics(conv=1.0, visc=1.0)
    x = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (1100, 2)), dtype=jnp.float64
    )

    def loss(p):
        return jnp.sum(
            ns_residual_mse(p, x, phys, norm, np_tile=2048, interpret=True)
        )

    ref_v = float(loss(params))
    ref_g, _ = jax.flatten_util.ravel_pytree(jax.grad(loss)(params))
    with jax.default_matmul_precision("highest"):
        hp_v = float(loss(params))
        hp_g, _ = jax.flatten_util.ravel_pytree(jax.grad(loss)(params))
    np.testing.assert_allclose(hp_v, ref_v, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(hp_g), np.asarray(ref_g), rtol=1e-9, atol=1e-12
    )


@pytest.mark.slow
def test_one_pass_weighted_obj_matches_xla():
    """ns_residual_weighted_obj (ONE kernel: loss + log MSEs + grads) must
    reproduce the XLA jet path's value_and_grad to f64 precision, and its
    FusedNSWeightedObjective loss closures must log the exact raw MSEs
    while the weighted sum's gradient equals the true gradient."""
    from tpinn.geometry import Normalization
    from tpinn.pallas.mlp_bundle import ns_residual_mse, ns_residual_weighted_obj
    from tpinn.pipeline import (
        FusedNSWeightedObjective, NSPhysics, ResidualBundle,
        mass_residual, momentum_residual,
    )

    model = MLP(2, 3, width=32, depth=3, seed=5, dtype=jnp.float64)
    params = model.params
    norm = Normalization(
        np.array([0.0, 500.0]), np.array([0.0, 250.0]), np.array([-1e4, 1e4])
    )
    phys = NSPhysics(conv=1.0, visc=1.0)
    x = jnp.asarray(
        np.random.default_rng(7).uniform(0, 1, (300, 2)), dtype=jnp.float64
    )
    w = (10.0, 1.0, 1.0)
    wj = jnp.asarray(w)

    def xla_loss(p):
        prev = model._bound
        model._bound = p
        b = ResidualBundle(model, x, use_pallas=False)
        out = (
            w[0] * jnp.mean(mass_residual(b, norm) ** 2)
            + w[1] * jnp.mean(momentum_residual(b, 0, phys, norm) ** 2)
            + w[2] * jnp.mean(momentum_residual(b, 1, phys, norm) ** 2)
        )
        model._bound = prev
        return out

    # raw API: one-pass value + mses + grads
    def wobj_loss(p):
        L, _ = ns_residual_weighted_obj(p, x, phys, norm, w, np_tile=256,
                                        interpret=True)
        return L

    vx, gx = jax.value_and_grad(xla_loss)(params)
    vp, gp = jax.value_and_grad(wobj_loss)(params)
    np.testing.assert_allclose(float(vx), float(vp), rtol=1e-12)
    fx, _ = jax.flatten_util.ravel_pytree(gx)
    fp, _ = jax.flatten_util.ravel_pytree(gp)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fp), atol=1e-12,
                               rtol=1e-9)

    # mses channel == the fwd kernel's mses (log parity)
    _, mses = ns_residual_weighted_obj(params, x, phys, norm, w,
                                       np_tile=256, interpret=True)
    mses_fwd = ns_residual_mse(params, x, phys, norm, np_tile=256,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(mses), np.asarray(mses_fwd),
                               rtol=1e-13)

    # loss-closure wiring: logged values are the one-pass raw MSEs EXACTLY
    # (the gradient surrogate contributes 0.0 bitwise); vs the fwd kernel
    # they differ only by op-grouping rounding (~1 ulp)
    obj = FusedNSWeightedObjective(model, x, phys, norm, w, np_tile=256)
    fns = obj.loss_fns()
    vals = [float(f()) for f in fns]
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(mses))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(mses_fwd),
                               rtol=1e-13)

    def closure_loss(p):
        prev = model._bound
        model._bound = p
        obj2 = FusedNSWeightedObjective(model, x, phys, norm, w, np_tile=256)
        f1, f2, f3 = obj2.loss_fns()
        out = w[0] * f1() + w[1] * f2() + w[2] * f3()
        model._bound = prev
        return out

    vc, gc = jax.value_and_grad(closure_loss)(params)
    np.testing.assert_allclose(float(vc), float(vx), rtol=1e-12)
    fc, _ = jax.flatten_util.ravel_pytree(gc)
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fx), atol=1e-12,
                               rtol=1e-9)


def test_poisson_residual_mse_matches_jet():
    """Fused Poisson kernel (−Δu − f): value AND hand-written backward vs
    jax.grad of the jet path, f64 interpret mode.  The forcing streams
    through a zero-padding feature row of the HBM DMA (mlp_bundle
    _prep_residual_args rhs), so this also pins that no garbage from the
    rhs row leaks into the forward or the layer-0 gradient rows."""
    from tpinn.pallas.mlp_bundle import poisson_residual_mse
    from tpinn.pipeline import taylor_tri_fn

    model = MLP(2, 1, width=20, depth=3, seed=1, dtype=jnp.float64,
                input_extents=[(0.0, 2 * np.pi), (0.0, 2 * np.pi)])
    params = model.params
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 2 * np.pi, (300, 2)), dtype=jnp.float64)
    f = jnp.asarray(2.0 * np.sin(x[:, 0]) * np.sin(x[:, 1]),
                    dtype=jnp.float64)
    tri = taylor_tri_fn(model, 2)

    def jet_loss(p):
        _, _, hdiag = tri(p, x)
        r = -(hdiag[:, 0, 0] + hdiag[:, 0, 1]) - f
        return jnp.mean(r * r)

    def pallas_loss(p):
        return poisson_residual_mse(p, x, f, np_tile=256, interpret=True)

    np.testing.assert_allclose(
        float(jet_loss(params)), float(pallas_loss(params)), rtol=1e-12
    )
    gx, _ = jax.flatten_util.ravel_pytree(jax.grad(jet_loss)(params))
    gp, _ = jax.flatten_util.ravel_pytree(jax.grad(pallas_loss)(params))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gp), atol=1e-12,
                               rtol=1e-9)


def test_poisson_residual_mse_normalization_and_masking():
    """normalization divides the residual (LossMeanSquares contract) and
    n_valid/n_mean give the exact mean over the first m rows."""
    from tpinn.pallas.mlp_bundle import poisson_residual_mse
    from tpinn.pipeline import taylor_tri_fn

    model = MLP(2, 1, width=16, depth=2, seed=3, dtype=jnp.float64)
    params = model.params
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 1, (217, 2)), dtype=jnp.float64)
    f = jnp.asarray(rng.normal(size=217), dtype=jnp.float64)
    tri = taylor_tri_fn(model, 2)
    m = 150

    def jet_mse(xs, fs, normalization):
        _, _, hdiag = tri(params, xs)
        r = (-(hdiag[:, 0, 0] + hdiag[:, 0, 1]) - fs) / normalization
        return float(jnp.mean(r * r))

    got = float(poisson_residual_mse(params, x, f, normalization=3.0,
                                     np_tile=128, interpret=True))
    np.testing.assert_allclose(got, jet_mse(x, f, 3.0), rtol=1e-12)

    masked = float(poisson_residual_mse(params, x, f, np_tile=128,
                                        interpret=True, n_valid=m, n_mean=m))
    np.testing.assert_allclose(masked, jet_mse(x[:m], f[:m], 1.0),
                               rtol=1e-12)


def test_poisson_one_pass_weighted_obj():
    """(w·mse, mse) + parameter grads from ONE launch == value_and_grad of
    the jet path; the mse channel is log-only (cotangent dropped)."""
    from tpinn.pallas.mlp_bundle import (
        poisson_residual_mse,
        poisson_residual_weighted_obj,
    )
    from tpinn.pipeline import taylor_tri_fn

    model = MLP(2, 1, width=20, depth=3, seed=4, dtype=jnp.float64)
    params = model.params
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(0, 1, (260, 2)), dtype=jnp.float64)
    f = jnp.asarray(rng.normal(size=260), dtype=jnp.float64)
    w = 2.0
    tri = taylor_tri_fn(model, 2)

    def jet_loss(p):
        _, _, hdiag = tri(p, x)
        r = -(hdiag[:, 0, 0] + hdiag[:, 0, 1]) - f
        return w * jnp.mean(r * r)

    def wobj_loss(p):
        L, _ = poisson_residual_weighted_obj(p, x, f, w, np_tile=128,
                                             interpret=True)
        return L

    vx, gx = jax.value_and_grad(jet_loss)(params)
    vp, gp = jax.value_and_grad(wobj_loss)(params)
    np.testing.assert_allclose(float(vx), float(vp), rtol=1e-12)
    fx, _ = jax.flatten_util.ravel_pytree(gx)
    fp, _ = jax.flatten_util.ravel_pytree(gp)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fp), atol=1e-12,
                               rtol=1e-9)

    _, mse = poisson_residual_weighted_obj(params, x, f, w, np_tile=128,
                                           interpret=True)
    mse_fwd = poisson_residual_mse(params, x, f, np_tile=128, interpret=True)
    np.testing.assert_allclose(float(mse), float(mse_fwd), rtol=1e-13)


def test_fused_poisson_objective_closure():
    """FusedPoissonObjective.loss_fn: logged value == raw MSE exactly, and
    grad of weight·fn() == grad of the jet objective (surrogate wiring)."""
    from tpinn.pallas.mlp_bundle import poisson_residual_mse
    from tpinn.pipeline import FusedPoissonObjective, taylor_tri_fn

    model = MLP(2, 1, width=20, depth=3, seed=1, dtype=jnp.float64)
    params = model.params
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.uniform(0, 1, (200, 2)), dtype=jnp.float64)
    f = jnp.asarray(rng.normal(size=200), dtype=jnp.float64)
    w = 2.0
    tri = taylor_tri_fn(model, 2)

    def jet_loss(p):
        _, _, hdiag = tri(p, x)
        r = -(hdiag[:, 0, 0] + hdiag[:, 0, 1]) - f
        return w * jnp.mean(r * r)

    def closure_loss(p):
        prev = model._bound
        model._bound = p
        fn = FusedPoissonObjective(model, x, f, weight=w,
                                   np_tile=128).loss_fn()
        out = w * fn()
        model._bound = prev
        return out

    vx, gx = jax.value_and_grad(jet_loss)(params)
    vc, gc = jax.value_and_grad(closure_loss)(params)
    np.testing.assert_allclose(float(vc), float(vx), rtol=1e-12)
    fx, _ = jax.flatten_util.ravel_pytree(gx)
    fc, _ = jax.flatten_util.ravel_pytree(gc)
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fx), atol=1e-12,
                               rtol=1e-9)

    logged = float(FusedPoissonObjective(model, x, f, weight=w,
                                         np_tile=128).loss_fn()())
    mse = float(poisson_residual_mse(params, x, f, np_tile=128,
                                     interpret=True))
    np.testing.assert_allclose(logged, mse, rtol=1e-13)
