"""Fused MLP Taylor-bundle Pallas kernels.

Computes, for every collocation point, the MLP outputs plus all first input
derivatives and the Hessian diagonals — the full bundle a Navier–Stokes
residual needs — in ONE kernel pass.

Layout (TPU-first): features live on sublanes, points on lanes.  The Taylor
streams per point —

    v   : value
    g_k : ∂/∂x_k        (k = 0..d_in-1, one per input column)
    h_j : ∂²/∂x_j²      (spatial columns only)

— are kept as SEPARATE (width, chunk) arrays (round 4; earlier rounds
stacked them along the lane axis into one (width, S·chunk) array).  A
lane-axis concatenation materializes a full copy of every stream per layer
— pure VMEM traffic — while splitting the layer matmul into one
(out, in) @ (in, chunk) MXU call per stream costs the same MXU passes
(ceil splits equally for chunk a multiple of 128).  The tanh coupling:

    v' = tanh(z_v);  g'_k = tanh'(z_v) · z_gk;
    h'_j = −2 v' tanh'(z_v) z_g{sj}² + tanh'(z_v) z_hj

Biases are added to the value stream only.  Layer-0 shortcuts: the gradient
input streams are coordinate basis vectors, so z_gk is W0's k-th row
broadcast (no matmul), and the Hessian input streams are exactly zero (their
matmuls and the `tp·z_h` term are skipped).  Derivation: standard truncated
Taylor (jet) propagation; identical math to tpinn.operators.taylor_bundle,
which serves as the cross-checked XLA fallback (tests/test_pallas.py).

Exact-mean masking (round 4): the residual kernels take a DYNAMIC valid-row
count (SMEM scalar) and return raw squared-residual SUMS; the host wrapper
divides by a static global denominator ``n_mean``.  Under a device mesh each
shard masks its own tail padding and the psum of per-shard sums / n_mean is
the exact global MSE for ANY batch length (tpinn.sharding).
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def pallas_available() -> bool:
    try:
        import jax.experimental.pallas as pl  # noqa: F401

        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _high_precision_ambient() -> bool:
    """True when tracing under jax.default_matmul_precision('highest'/
    'float32').  tpinn.optimize.minimize wraps every second-order round in
    that context (bf16 matmul passes inject ~1e-3 loss jitter that breaks
    quasi-Newton accept tests); the kernels respond by pinning their
    internal dot precision (``_dot_precision``) and shrinking the streamed
    chunk (multi-pass f32 matmuls need a larger Mosaic scratch)."""
    prec = jax.config.jax_default_matmul_precision
    return prec is not None and str(prec).lower() in ("highest", "float32")


def _dot_precision(dtype):
    """Per-dot precision policy for the kernels' internal matmuls.

    * ambient default → None (single-pass bf16 matmuls, the fast path; the
      first-order rounds that run here never compare loss values).
    * ambient 'highest' + float32 → the TPINN_HP_DOT policy:
        - ``highest`` (default): f32-exact bf16_6x with contraction-depth
          packing (``_dot_6x`` — the six products of XLA's HIGHEST
          lowering computed in ceil(6·width/128) MXU passes instead of 6;
          measured 2.0e8 vs Mosaic's 9.2e7 pts/s on the one-pass train
          kernel, same precision class);
        - ``high``: hand-built 3-pass bf16_3x (``_dot_3x``, also packed):
          ~2e-6-relative products (the dropped lo·lo term, ~2 ½ orders
          below the 1e-3 bf16 noise the precision context exists to kill)
          at ⅔ the packed-6x passes;
        - ``mosaic``: Mosaic's native 6-pass HIGHEST lowering — the
          rounds-2–4 campaign lowering, kept for bit-parity reruns of
          committed artifacts.
    * float64 → None (XLA's f64 emulation is exact regardless).
    """
    if dtype != jnp.float32 or not _high_precision_ambient():
        return None
    env = os.environ.get("TPINN_HP_DOT", "highest").lower()
    if env == "high":
        return jax.lax.Precision.HIGH
    if env == "mosaic":
        return "mosaic"
    return jax.lax.Precision.HIGHEST


# Per-stream MXU primitives -------------------------------------------------


def _split_hi_lo(a):
    """Error-free-ish bf16 split: a = hi + lo with hi exactly
    bf16-representable; lo carries the low ~8 mantissa bits (it is rounded
    to bf16 again inside the single-pass matmul, a second-order error)."""
    hi = a.astype(jnp.bfloat16).astype(a.dtype)
    return hi, a - hi


def _dot_3x(a, b, dims, dtype):
    """Manual bf16_3x matmul: a·b ≈ aₕbₕ + aₕbₗ + aₗbₕ with f32 MXU
    accumulation.  Mosaic refuses to lower Precision.HIGH ("Unsupported dot
    precision"), so the 3-pass lowering XLA calls bf16_3x is built by hand
    here.  Product error ~2e-6 relative (the dropped aₗbₗ term ~2⁻¹⁸ + bf16
    rounding of the lo factors) — ~2 ½ orders below the 1e-3 single-pass
    jitter the high-precision context exists to kill.
    precision=DEFAULT is explicit: None would inherit the ambient 'highest'
    and silently 6-pass each product.

    Contraction-depth packing (round 5): the MXU consumes up to 128
    contraction rows per pass, so a K=32 dot wastes ¾ of the array and
    three separate K=32 dots cost three passes.  Stacking the hi/lo
    factors along the CONTRACTION axis —

        [aₕ; aₕ; aₗ] · [bₕ; bₗ; bₕ]   (one K=3·32=96 dot)

    — computes the identical three products inside ONE MXU accumulation:
    ⅓ the passes AND the two (out, C) adds between dots become free.
    Applied when the contraction depth is a sublane axis (K ≤ 128, the
    width dots of the fwd/bwd walks); the dW Gram dots contract over the
    LANE axis (K = chunk ≥ 256) where packing saves no passes and the
    concat copies are large, so they keep the additive 3-dot form."""
    ((ca,), (cb,)), _ = dims
    ah, al = _split_hi_lo(a)
    bh, bl = _split_hi_lo(b)
    d = functools.partial(
        jax.lax.dot_general, dimension_numbers=dims,
        preferred_element_type=dtype, precision=jax.lax.Precision.DEFAULT,
    )
    if a.shape[ca] <= 128:
        a3 = jnp.concatenate([ah, ah, al], axis=ca)
        b3 = jnp.concatenate([bh, bl, bh], axis=cb)
        return d(a3, b3)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _split_3way(a):
    """Exact 3-term bf16 split: a = a0 + a1 + a2 with every term exactly
    bf16-representable — 8+8+8 mantissa bits cover f32's 24 (the same split
    XLA's bf16_6x uses for Precision.HIGHEST on the MXU)."""
    a0 = a.astype(jnp.bfloat16).astype(a.dtype)
    r = a - a0
    a1 = r.astype(jnp.bfloat16).astype(a.dtype)
    a2 = r - a1
    return a0, a1, a2


def _dot_6x(a, b, dims, dtype):
    """f32-exact bf16_6x matmul with contraction-depth packing.

    XLA lowers Precision.HIGHEST for bf16-MXU hardware as six single-pass
    products over 3-way splits (Σ aᵢbⱼ for i+j ≤ 2; the dropped i+j ≥ 3
    terms sit at ~2⁻⁴⁰, below f32 product precision).  Mosaic lowers the
    same six passes in-kernel — each a K=width dot that uses width/128 of
    the MXU's contraction depth.  Packing the six factor pairs along the
    contraction axis instead —

        [a₀;a₀;a₁;a₀;a₁;a₂] · [b₀;b₁;b₀;b₂;b₁;b₀]   (one K=6·width dot)

    — computes the identical six products inside ONE MXU accumulation:
    ceil(6·width/128) passes instead of 6 (width 32: 2 vs 6) at the same
    f32-exact precision class (single f32 accumulation chain vs Mosaic's
    six partial sums; both accumulate every product in f32).  Used for the
    sublane-contraction dots (K ≤ 128); lane-contraction Gram dots
    (K = chunk) gain nothing from packing and keep Mosaic's native
    HIGHEST lowering."""
    ((ca,), (cb,)), _ = dims
    if a.shape[ca] > 128:
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
    a0, a1, a2 = _split_3way(a)
    b0, b1, b2 = _split_3way(b)
    a6 = jnp.concatenate([a0, a0, a1, a0, a1, a2], axis=ca)
    b6 = jnp.concatenate([b0, b1, b0, b2, b1, b0], axis=cb)
    return jax.lax.dot_general(
        a6, b6, dims, preferred_element_type=dtype,
        precision=jax.lax.Precision.DEFAULT,
    )


def _dot_dispatch(a, b, dims, dtype, prec):
    """Route one kernel dot through the TPINN_HP_DOT policy (see
    ``_dot_precision``): HIGHEST → packed bf16_6x, HIGH → packed bf16_3x,
    'mosaic' → Mosaic's native HIGHEST lowering, None → single-pass bf16."""
    if prec == jax.lax.Precision.HIGHEST:
        return _dot_6x(a, b, dims, dtype)
    if prec == jax.lax.Precision.HIGH:
        return _dot_3x(a, b, dims, dtype)
    if prec == "mosaic":
        prec = jax.lax.Precision.HIGHEST
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=dtype, precision=prec,
    )


def _dot_fwd(w, s, dtype, prec):
    """(in, out)ᵀ @ (in, C) -> (out, C): forward-propagate one stream."""
    return _dot_dispatch(w, s, (((0,), (0,)), ((), ())), dtype, prec)


def _dot_bwd(w, dz, dtype, prec):
    """(in, out) @ (out, C) -> (in, C): backprop one cotangent stream."""
    return _dot_dispatch(w, dz, (((1,), (0,)), ((), ())), dtype, prec)


def _dot_gram(s, dz, dtype, prec):
    """(in, C) × (out, C) -> (in, out): per-layer dW, contracted over lanes.

    A sublane-deficient ``out`` (the Poisson scalar head, out = 1) would
    lower as a lane ``vector.multi_reduction``, which Mosaic refuses to fuse
    with the non-constant gram accumulator ("only constant accumulators
    supported").  Pad such operands to 8 sublanes so the contraction stays
    an MXU matmul, and slice the columns back."""
    out = dz.shape[0]
    if out < 8:
        dz = jnp.concatenate(
            [dz, jnp.zeros((8 - out, dz.shape[1]), dz.dtype)], axis=0
        )
    r = _dot_dispatch(s, dz, (((1,), (1,)), ((), ())), dtype, prec)
    return r[:, :out] if out < 8 else r


def _kernel(x_ref, *refs, dim: int, widths: Sequence[int], np_tile: int):
    import jax.experimental.pallas as pl  # noqa: F401

    n_layers = len(widths) - 1
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers : 2 * n_layers]
    out_refs = refs[2 * n_layers :]
    v_out, jac_out, hdiag_out = out_refs

    S = 1 + 2 * dim
    NP = np_tile

    # Build the stacked input streams (d_in, S*NP):
    # [ v | g_0 .. g_{d-1} | h_0 .. h_{d-1} ]
    x = x_ref[...]  # (NP, d_in)
    xt = x.T  # (d_in, NP)
    d_in = widths[0]
    eye = jnp.eye(d_in, dtype=x.dtype)
    streams = [xt]
    for k in range(dim):
        g = jnp.broadcast_to(eye[:, k : k + 1], (d_in, NP))
        streams.append(g)
    for _ in range(dim):
        streams.append(jnp.zeros((d_in, NP), dtype=x.dtype))
    s = jnp.concatenate(streams, axis=1)  # (d_in, S*NP)

    for li in range(n_layers):
        w = w_refs[li][...]  # (in, out)
        b = b_refs[li][...]  # (1, out)
        z = jax.lax.dot_general(
            w, s, (((0,), (0,)), ((), ())),
            preferred_element_type=x.dtype,
        )  # (out, S*NP)
        # bias on the value stream only
        zv = z[:, :NP] + b.T
        if li < n_layers - 1:
            v = jnp.tanh(zv)
            tp = 1.0 - v * v  # tanh'
            new = [v]
            for k in range(dim):
                gz = z[:, (1 + k) * NP : (2 + k) * NP]
                new.append(tp * gz)
            for k in range(dim):
                gz = z[:, (1 + k) * NP : (2 + k) * NP]
                hz = z[:, (1 + dim + k) * NP : (2 + dim + k) * NP]
                new.append(-2.0 * v * tp * gz * gz + tp * hz)
            s = jnp.concatenate(new, axis=1)
        else:
            s = jnp.concatenate([zv, z[:, NP:]], axis=1)

    d_out = widths[-1]
    v_out[...] = s[:, :NP].T  # (NP, d_out)
    jac = [s[:, (1 + k) * NP : (2 + k) * NP] for k in range(dim)]
    hdg = [s[:, (1 + dim + k) * NP : (2 + dim + k) * NP] for k in range(dim)]
    # (NP, d_out, dim)
    jac_out[...] = jnp.stack(jac, axis=-1).transpose(1, 0, 2)
    hdiag_out[...] = jnp.stack(hdg, axis=-1).transpose(1, 0, 2)


# ---------------------------------------------------------------------------
# Fused NS-residual kernels (the training hot path)
# ---------------------------------------------------------------------------


def _taylor_streams(ws, bs, xt, *, spatial, d_in, chunk, dtype, prec,
                    keep_aux: bool):
    """Per-stream Taylor propagation through the MLP.

    Returns ``(sv, sg, sh, s_layers, aux)`` where (sv, sg, sh) are the final
    output streams — value (d_out, C), gradient streams per input column,
    Hessian-diagonal streams per spatial column — and, when ``keep_aux``:

    * ``s_layers[li]`` = the INPUT streams of layer li as (sv, sg, sh)
      (layer 0's gradient streams are None — they are basis vectors whose
      dW contribution reduces to a lane-sum, and its Hessian streams are
      exactly zero);
    * ``aux[li]`` = (tp, z_g list, z_h list|None) per hidden layer (the
      value stream v is NOT duplicated here — it is s_layers[li+1][0]).
    """
    n_layers = len(ws)
    n_h = len(spatial)
    s_layers: list = []
    aux: list = []
    sv, sg, sh = xt, None, None
    for li in range(n_layers):
        w = ws[li]
        if keep_aux:
            s_layers.append((sv, sg, sh))
        if li == 0:
            z_v = _dot_fwd(w, sv, dtype, prec)
            out_w = w.shape[1]
            # gradient input streams are basis vectors e_k: z_gk = W0[k, :]
            z_g = [
                jnp.broadcast_to(w[k : k + 1, :].T, (out_w, chunk))
                for k in range(d_in)
            ]
            z_h = None  # Hessian input streams are exactly zero
        else:
            z_v = _dot_fwd(w, sv, dtype, prec)
            z_g = [_dot_fwd(w, g, dtype, prec) for g in sg]
            z_h = [_dot_fwd(w, h, dtype, prec) for h in sh]
        zv = z_v + bs[li].T
        if li < n_layers - 1:
            v = jnp.tanh(zv)
            tp = 1.0 - v * v
            a = -2.0 * v * tp
            if keep_aux:
                aux.append((tp, z_g, z_h))
            new_h = []
            for j, pk in enumerate(spatial):
                hj = a * (z_g[pk] * z_g[pk])
                if z_h is not None:
                    hj = hj + tp * z_h[j]
                new_h.append(hj)
            sv = v
            sg = [tp * g for g in z_g]
            sh = new_h
        else:
            if keep_aux:
                aux.append(None)
            sv = zv
            sg = z_g
            sh = (z_h if z_h is not None
                  else [jnp.zeros_like(zv) for _ in range(n_h)])
    return sv, sg, sh, s_layers, aux


def _residual_rows(sv, sg, sh, valid, phys, spatial):
    """(r_mass, r_u, r_v) per-point residual rows from the final streams
    (masked); shared by the fwd sums and the bwd cotangent assembly."""
    sx, sy = spatial
    nv, npre, scale = phys["nv"], phys["npre"], phys["scale"]
    conv, visc, pres = phys["conv"], phys["visc"], phys["pres"]
    timec = phys.get("time", 0.0)
    val, gx, gy = sv, sg[sx], sg[sy]
    hx, hy = sh[0], sh[1]
    r_mass = jnp.where(valid, gx[0] + gy[1], 0.0)
    U = nv * val[0]
    V = nv * val[1]
    moms = []
    for k in (0, 1):
        dkx = nv * gx[k]
        dky = nv * gy[k]
        lap = nv * (hx[k] + hy[k])
        dpk = npre * (gx[2] if k == 0 else gy[2])
        r = conv * (U * dkx + V * dky) - visc * lap + pres * dpk
        if timec != 0.0:
            r = r + timec * nv * sg[0][k]  # ∂t stream = gradient column 0
        moms.append(jnp.where(valid, r * scale, 0.0))
    return r_mass, moms[0], moms[1]


def _reverse_walk(ws, s_layers, aux, ds_v, ds_g, ds_h, grams, dbs, *,
                  spatial, d_in, dp, widths, dtype, prec):
    """Reverse pass over the Taylor streams: given the OUTPUT-stream
    cotangents (ds_v, ds_g per input column, ds_h per spatial column), walk
    the layers backward accumulating dW/db into ``grams``/``dbs`` in place.
    Shared by every residual-family backward kernel (NS and Poisson) — the
    physics only differ in how the output cotangents are assembled.

    ``ds_v`` and any element of ``ds_g`` may be ``None`` to mark an
    IDENTICALLY-ZERO cotangent stream (the Poisson residual touches only
    the Hessian streams, so its value/gradient head cotangents are
    structural zeros).  ``None`` streams skip their gram/backprop matmuls
    at the head layer — both a real saving and a requirement: Mosaic
    refuses a dot_general whose operand folds to a broadcast zero constant
    ("only constant accumulators supported")."""
    n_layers = len(ws)
    n_h = len(spatial)

    def _acc(a, b):
        return b if a is None else a + b

    for li in range(n_layers - 1, -1, -1):
        if li == n_layers - 1:
            dz_v, dz_g, dz_h = ds_v, list(ds_g), ds_h
        else:
            tp, zg, zh = aux[li]
            v = s_layers[li + 1][0]  # this layer's activation output
            a = -2.0 * v * tp
            b2 = -2.0 * tp * (tp - 2.0 * v * v)
            dz_v = ds_v * tp if ds_v is not None else None
            for k in range(d_in):
                if ds_g[k] is not None:
                    dz_v = _acc(dz_v, ds_g[k] * (a * zg[k]))
            for j, pk in enumerate(spatial):
                hterm = b2 * (zg[pk] * zg[pk])
                if zh is not None:
                    hterm = hterm + a * zh[j]
                dz_v = _acc(dz_v, ds_h[j] * hterm)
            dz_g = []
            for k in range(d_in):
                part = ds_g[k] * tp if ds_g[k] is not None else None
                for j, pk in enumerate(spatial):
                    if pk == k:
                        part = _acc(part, ds_h[j] * (2.0 * a * zg[k]))
                dz_g.append(part)
            dz_h = [ds_h[j] * tp for j in range(n_h)]
        # bias feeds the value stream only
        if dz_v is not None:
            dbs[li] = dbs[li] + jnp.sum(dz_v, axis=1)[None, :]
        sv_i, sg_i, sh_i = s_layers[li]
        if li == 0:
            # layer 0: value stream is the batch itself; each gradient
            # stream is a basis vector e_k, so its dW block is
            # e_k ⊗ Σ_lanes dz_gk (a lane-sum, no matmul); the Hessian
            # input streams are exactly zero (no contribution).
            g = (_dot_gram(sv_i, dz_v, dtype, prec)
                 if dz_v is not None else None)
            rid = jax.lax.broadcasted_iota(
                jnp.int32, (dp, widths[1]), 0
            )
            for k in range(d_in):
                if dz_g[k] is None:
                    continue
                g = _acc(g, jnp.where(
                    rid == k, jnp.sum(dz_g[k], axis=1)[None, :], 0.0
                ))
        else:
            g = (_dot_gram(sv_i, dz_v, dtype, prec)
                 if dz_v is not None else None)
            for k in range(d_in):
                if dz_g[k] is not None:
                    g = _acc(g, _dot_gram(sg_i[k], dz_g[k], dtype, prec))
            for j in range(n_h):
                g = _acc(g, _dot_gram(sh_i[j], dz_h[j], dtype, prec))
        if g is not None:
            grams[li] = grams[li] + g
        if li > 0:
            # layer 0's input gradient is never used (training never
            # differentiates w.r.t. the collocation points) — skip it.
            ds_v = (_dot_bwd(ws[li], dz_v, dtype, prec)
                    if dz_v is not None else None)
            ds_g = [(_dot_bwd(ws[li], z, dtype, prec)
                     if z is not None else None) for z in dz_g]
            ds_h = [_dot_bwd(ws[li], z, dtype, prec) for z in dz_h]


def _residual_kernel(xt_ref, nv_ref, *refs, spatial: Sequence[int],
                     widths: Sequence[int], chunk: int, n_chunks: int,
                     phys: dict, prec):
    """Single-instance fused NS-residual kernel (steady OR unsteady).

    The (transposed) point batch stays in HBM; a double-buffered DMA
    pipeline streams one (d_in, chunk) lane-chunk at a time into a VMEM
    scratch while the previous chunk computes, so VMEM use is O(chunk) and
    the kernel scales to arbitrarily large point batches.  Each chunk
    propagates the per-stream Taylor bundle (see module docstring) and
    accumulates the three squared-residual SUMS in the fori_loop carry;
    rows at or beyond the dynamic valid count (``nv_ref``, an SMEM scalar)
    are masked to zero, which makes sharded tail padding exact.  No grid,
    no output-block revisiting — the pipeline serialization of a
    constant-output accumulator block is avoided entirely.  ``spatial``
    maps (x, y) to input columns ((0, 1) steady, (1, 2) unsteady, the
    reference derivative-column convention, cavity_unsteady.py:188);
    ``phys["time"]`` multiplies the nv·∂t U_k momentum term.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers = len(widths) - 1
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers : 2 * n_layers]
    out_ref = refs[2 * n_layers]

    d_in = widths[0]
    dp = max(d_in, _DP)  # padded feature rows (see _prep_residual_args)
    dtype = xt_ref.dtype

    ws = [w_refs[i][...] for i in range(n_layers)]
    bs = [b_refs[i][...] for i in range(n_layers)]
    n_valid = nv_ref[0, 0]  # float32 scalar (exact for counts < 2**24)

    def scoped(xbuf, sems):
        def get_dma(slot, c):
            return pltpu.make_async_copy(
                xt_ref.at[c], xbuf.at[slot], sems.at[slot]
            )

        get_dma(0, 0).start()

        def body(c, acc):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

            get_dma(slot, c).wait()
            xt = xbuf[slot]  # (dp, CH)
            return _fwd_chunk(c, xt, acc)

        acc = jax.lax.fori_loop(
            0, n_chunks, body, jnp.zeros((3,), dtype=dtype)
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        out = jnp.zeros((8, 128), dtype=dtype)
        for j in range(3):
            out = out + jnp.where((sub == 0) & (lane == j), acc[j], 0.0)
        out_ref[...] = out

    def _fwd_chunk(c, xt, acc):
        sv, sg, sh, _, _ = _taylor_streams(
            ws, bs, xt, spatial=spatial, d_in=d_in, chunk=chunk,
            dtype=dtype, prec=prec, keep_aux=False,
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)[0]
        valid = (lane + c * chunk).astype(jnp.float32) < n_valid
        r_mass, r_u, r_v = _residual_rows(sv, sg, sh, valid, phys, spatial)
        return acc + jnp.stack([
            jnp.sum(r_mass * r_mass), jnp.sum(r_u * r_u), jnp.sum(r_v * r_v)
        ])

    pl.run_scoped(
        scoped,
        xbuf=pltpu.VMEM((2, dp, chunk), dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _residual_bwd_kernel(xt_ref, nv_ref, *refs, spatial: Sequence[int],
                         widths: Sequence[int], chunk: int, n_chunks: int,
                         phys: dict, n_mean: int, prec, ilv: int = 1):
    """Backward of the fused NS-residual MSEs w.r.t. the MLP parameters.

    One pass per chunk: recompute the per-stream Taylor bundle (keeping the
    per-layer input streams and the pre-activation gradient/Hessian streams
    as auxiliaries), form the residual cotangents from the incoming (3,)
    MSE cotangents, and walk the layers in reverse accumulating dW/db in
    the fori_loop carry.  Gradients w.r.t. the collocation points are NOT
    produced (training never needs them).

    The three raw squared-residual SUMS are accumulated alongside and
    written to a final (8, 128) output block — they come for free (the
    residuals are materialized for the cotangents anyway), which is what
    makes the ONE-PASS training objective possible: calling this kernel
    with the loss weights as cotangents yields the weighted PDE loss, its
    raw MSE components, AND the parameter gradients in a single launch,
    replacing the fwd+bwd pair (4 propagation units -> 3, one HBM stream
    of the batch instead of two).  See ``ns_residual_weighted_obj``.

    dW accumulates PER LAYER per stream ((in, C) × (out, C) lane
    contractions).  Round 3 packed all layers into one (Σin, Σout) Gram to
    quarter the MXU passes, but the measured train kernel ran at barely a
    third of its MXU-pass bound — the binding costs were the lane-axis
    concatenates and the stored-stream VMEM traffic, both of which the
    per-stream layout eliminates, and the packed Gram's O(Σin·Σout) carry
    grew quadratically with depth (round-3 advisor finding).  The MSE
    cotangents are scaled by 2/``n_mean`` (the STATIC global denominator),
    so per-shard dW psums compose exactly under a mesh; row masking uses
    the dynamic valid count like the forward kernel.

    Stream layout and ``spatial``/``phys["time"]`` semantics match
    :func:`_residual_kernel` (steady 5 streams / unsteady 6).  Like the
    forward kernel, the point batch stays in HBM and chunks are streamed
    through a double-buffered VMEM scratch, so VMEM use is O(chunk)
    regardless of batch size.
    """
    import jax.experimental.pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    n_layers = len(widths) - 1
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers : 2 * n_layers]
    gbar_ref = refs[2 * n_layers]
    out_refs = refs[2 * n_layers + 1 :]
    dw_refs = out_refs[:n_layers]
    db_refs = out_refs[n_layers : 2 * n_layers]
    mse_ref = out_refs[2 * n_layers]

    d_in = widths[0]
    dp = max(d_in, _DP)  # padded feature rows (see _prep_residual_args)
    n_h = len(spatial)
    sx, sy = spatial
    dtype = xt_ref.dtype
    nv, npre, scale = phys["nv"], phys["npre"], phys["scale"]
    conv, visc, pres = phys["conv"], phys["visc"], phys["pres"]
    timec = phys.get("time", 0.0)

    ws = [w_refs[i][...] for i in range(n_layers)]
    bs = [b_refs[i][...] for i in range(n_layers)]
    gbar = gbar_ref[...]
    g_cot = [gbar[0, j] for j in range(3)]  # mass, mom-u, mom-v cotangents
    n_valid = nv_ref[0, 0]

    def scoped(xbuf, sems):
        # ``ilv`` independent chunks traced per loop iteration — an
        # MXU/VPU co-scheduling EXPERIMENT, measured NEGATIVE on v5e
        # (ilv=1 317 M pts/s, ilv=2 285 M, ilv=4 250 M at np_tile 4096;
        # the Mosaic scheduler does not hoist the second chunk's VPU
        # algebra into the first chunk's MXU stalls at block granularity,
        # and the halved per-chunk cap costs real throughput).  Kept
        # behind TPINN_BWD_ILV (default 1 == exactly the old loop) so the
        # experiment is reproducible; see docs/DESIGN.md roofline note.
        nslots = 2 * ilv

        def get_dma(slot, c):
            return pltpu.make_async_copy(
                xt_ref.at[c], xbuf.at[slot], sems.at[slot]
            )

        for i in range(ilv):
            get_dma(i, i).start()

        def body(p, carry):
            base = p * ilv

            @pl.when(base + ilv < n_chunks)
            def _():
                for i in range(ilv):
                    c = base + ilv + i
                    get_dma(jax.lax.rem(c, nslots), c).start()

            for i in range(ilv):
                get_dma(jax.lax.rem(base + i, nslots), base + i).wait()
            for i in range(ilv):
                carry = _bwd_chunk(
                    base + i, xbuf[jax.lax.rem(base + i, nslots)], carry
                )
            return carry

        acc = jax.lax.fori_loop(0, n_chunks // ilv, body, init)
        for i in range(n_layers):
            dw_refs[i][...] = acc[i]
            db_refs[i][...] = acc[n_layers + i]
        sq = acc[2 * n_layers]  # (3,) squared-residual sums
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        out = jnp.zeros((8, 128), dtype=dtype)
        for j in range(3):
            out = out + jnp.where((sub == 0) & (lane == j), sq[j], 0.0)
        mse_ref[...] = out

    def _bwd_chunk(c, xt, carry):
        grams = list(carry[:n_layers])
        dbs = list(carry[n_layers : 2 * n_layers])
        sq = carry[2 * n_layers]

        sv, sg, sh, s_layers, aux = _taylor_streams(
            ws, bs, xt, spatial=spatial, d_in=d_in, chunk=chunk,
            dtype=dtype, prec=prec, keep_aux=True,
        )
        val, gx, gy = sv, sg[sx], sg[sy]
        hx, hy = sh[0], sh[1]
        gt = sg[0]  # ∂t stream (column 0; unsteady only)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)[0]
        valid = (lane + c * chunk).astype(jnp.float32) < n_valid

        # residuals (same as forward) and per-point cotangents c_* = ḡ·2r/n
        two_over_n = jnp.asarray(2.0 / n_mean, dtype=dtype)
        r_mass = jnp.where(valid, gx[0] + gy[1], 0.0)
        c_m = g_cot[0] * two_over_n * r_mass

        zero = jnp.zeros((chunk,), dtype=dtype)
        c_k = []
        sq_parts = [jnp.sum(r_mass * r_mass)]
        for k in (0, 1):
            gk2 = gx[2] if k == 0 else gy[2]
            inner = (
                conv * nv * nv * (val[0] * gx[k] + val[1] * gy[k])
                - visc * nv * (hx[k] + hy[k])
                + pres * npre * gk2
            )
            if timec != 0.0:
                inner = inner + timec * nv * gt[k]
            r = jnp.where(valid, inner * scale, 0.0)
            sq_parts.append(jnp.sum(r * r))
            # d mse_k / d inner = (2 r / n) · scale
            c_k.append(g_cot[1 + k] * two_over_n * r * scale)

        cnv2 = conv * nv * nv
        dval = jnp.stack(
            [
                c_k[0] * cnv2 * gx[0] + c_k[1] * cnv2 * gx[1],
                c_k[0] * cnv2 * gy[0] + c_k[1] * cnv2 * gy[1],
                zero,
            ]
        )
        dgx = jnp.stack(
            [
                c_k[0] * cnv2 * val[0] + c_m,
                c_k[1] * cnv2 * val[0],
                c_k[0] * (pres * npre),
            ]
        )
        dgy = jnp.stack(
            [
                c_k[0] * cnv2 * val[1],
                c_k[1] * cnv2 * val[1] + c_m,
                c_k[1] * (pres * npre),
            ]
        )
        # the two Hessian-stream cotangents are identical: −c_k·visc·nv
        dh = jnp.stack([-c_k[0] * visc * nv, -c_k[1] * visc * nv, zero])

        dg_by_col = {sx: dgx, sy: dgy}
        if timec != 0.0:
            dg_by_col[0] = jnp.stack(
                [c_k[0] * (timec * nv), c_k[1] * (timec * nv), zero]
            )
        zero3 = jnp.zeros((3, chunk), dtype=dtype)
        ds_v = dval
        ds_g = [dg_by_col.get(k, zero3) for k in range(d_in)]
        ds_h = [dh, dh]

        _reverse_walk(ws, s_layers, aux, ds_v, ds_g, ds_h, grams, dbs,
                      spatial=spatial, d_in=d_in, dp=dp, widths=widths,
                      dtype=dtype, prec=prec)
        sq = sq + jnp.stack(sq_parts)
        return tuple(grams) + tuple(dbs) + (sq,)

    in_dims = [dp] + [widths[i] for i in range(1, n_layers)]
    out_dims = [widths[i + 1] for i in range(n_layers)]
    init = tuple(
        jnp.zeros((in_dims[i], out_dims[i]), dtype=dtype)
        for i in range(n_layers)
    ) + tuple(
        jnp.zeros((1, widths[i + 1]), dtype=dtype) for i in range(n_layers)
    ) + (jnp.zeros((3,), dtype=dtype),)
    pl.run_scoped(
        scoped,
        xbuf=pltpu.VMEM((2 * ilv, dp, chunk), dtype),
        sems=pltpu.SemaphoreType.DMA((2 * ilv,)),
    )


_DP = 8  # padded feature rows: the HBM-streamed (n_chunks, d_in, chunk)
# memref is sublane-tiled, and Mosaic requires DMA slices aligned to the
# tile (observed: d_in=3 picks a (4,128) tiling and the slice fails).
# Padding the feature dim to the f32 sublane tile (8) with zero rows —
# and the first-layer weights to match — keeps every DMA tile-aligned with
# no in-kernel slicing; the padded rows are exact zeros so the first-layer
# matmul is unchanged.

_VMEM_BUDGET = 12 * 1024 * 1024  # stream working-set budget (of ~16 MB VMEM)
_HP_VMEM_BUDGET = 6 * 1024 * 1024  # multi-pass f32 matmul scratch is 4-6×


def _stream_budget(dtype):
    """VMEM budget for the streamed chunk, by the ACTUAL lowering in play.

    * ambient default → 12 MB (single-pass matmuls, minimal scratch);
    * ambient hp + TPINN_HP_DOT=high (f32) → 10 MB: the hand-built packed
      ``_dot_3x`` lowers to DEFAULT-precision dots (no Mosaic multi-pass
      scratch; the hi/lo split + concat temporaries are transient and a
      few × one operand, below the stored-stream footprint);
    * ambient hp default (f32 'highest') → 9 MB: packed ``_dot_6x`` is
      also DEFAULT-precision dots, but its 6× contraction-stacked
      temporaries are larger than the 3x path's;
    * TPINN_HP_DOT=mosaic, or f64 emulation → 6 MB (Mosaic's in-kernel
      multi-pass scratch is 4-6× a single-pass dot's).
    """
    if not _high_precision_ambient():
        return _VMEM_BUDGET
    prec = _dot_precision(dtype)
    if prec == jax.lax.Precision.HIGH:
        return int(os.environ.get("TPINN_HP3_BUDGET_MB", "10")) * 1024 * 1024
    if prec == jax.lax.Precision.HIGHEST:
        return int(os.environ.get("TPINN_HP6_BUDGET_MB", "9")) * 1024 * 1024
    return _HP_VMEM_BUDGET


def _bwd_interleave() -> int:
    """Independent chunks in flight per bwd-kernel loop iteration.

    Default 1: the on-chip A/B measured ilv=2 at 0.90x and ilv=4 at 0.79x
    of the ilv=1 throughput (no MXU/VPU co-scheduling materialized; see
    _residual_bwd_kernel).  TPINN_BWD_ILV overrides for experiments.
    """
    try:
        return max(1, int(os.environ.get("TPINN_BWD_ILV", "1")))
    except ValueError:
        return 1


def _bwd_chunk_cap(widths, d_in, n_h, np_tile, dtype):
    """VMEM-budget-derived cap for the streamed bwd chunk.

    Round-3 advisor finding: the old fixed 512/2048 cap ignored how the
    stored-stream footprint scales with width/depth, silently risking the
    ~16 MB VMEM on deeper/wider nets.  Live bytes per chunk lane:

    * the per-layer input streams kept for the dW contractions
      (S = 1 + d_in + n_h streams × every layer's input width; layer 0's
      gradient/Hessian streams are virtual — basis vectors and zeros);
    * the activation auxiliaries per hidden layer (tp + one pre-activation
      gradient stream per input column + one Hessian stream per spatial
      column);
    * two generations of transient dz/ds streams during the reverse walk;
    * the double-buffered (2, dp, chunk) input scratch.

    The chunk-independent dW/db accumulator carry (per-layer (in, out)
    Grams + biases) is subtracted from the budget up front — negligible at
    3×32 (~42 KB) but quadratic in width, so wide nets shrink the chunk
    instead of silently overflowing VMEM (round-3 advisor finding).
    """
    bytes_per_lane, carry_bytes = _bwd_lane_bytes(widths, d_in, n_h, dtype)
    budget = _stream_budget(dtype) - 2 * carry_bytes
    if 256 * bytes_per_lane > budget:
        # even the minimum 256-lane chunk overflows the scoped-VMEM budget
        # (round-4 advisor finding: the old max(budget, 256*bytes) floor
        # silently accepted the overflow).  Callers that can fall back to
        # the XLA jet path should pre-check bwd_chunk_fits().
        raise ValueError(
            f"fused bwd kernel cannot fit widths {tuple(widths)} in the "
            f"{_stream_budget(dtype) >> 20} MB stream budget: 256-lane "
            f"floor needs {256 * bytes_per_lane + 2 * carry_bytes} bytes "
            f"({256 * bytes_per_lane} streams + {2 * carry_bytes} carry); "
            "route this net through the XLA jet path instead"
        )
    cap = int(budget // bytes_per_lane) // 256 * 256
    return max(256, min(cap, np_tile))


def _bwd_lane_bytes(widths, d_in, n_h, dtype):
    """(bytes per chunk lane, dW/db carry bytes) — the live-VMEM inventory
    of the streamed bwd kernel documented in :func:`_bwd_chunk_cap`."""
    S = 1 + d_in + n_h
    dp = max(widths[0], _DP)
    hidden = list(widths[1:-1])
    per_lane = dp + S * sum(hidden)            # stored layer-input streams
    per_lane += sum((1 + d_in + n_h) * w for w in hidden)  # tp, zg, zh
    per_lane += 2 * S * max(widths[1:])        # transient dz/ds streams
    per_lane += 2 * dp                         # xbuf double buffer
    itemsize = jnp.dtype(dtype).itemsize
    carry_bytes = sum(
        (max(a, _DP) + 1) * b for a, b in zip(widths[:-1], widths[1:])
    ) * itemsize
    return per_lane * itemsize, carry_bytes


def bwd_chunk_fits(widths, d_in, n_h, dtype) -> bool:
    """True when the streamed bwd kernel's 256-lane minimum chunk fits the
    scoped-VMEM budget for this net — the routing predicate
    use_fused_pde_losses uses to fall back to the XLA jet path for nets too
    wide for the fused kernels (round-4 advisor finding)."""
    bytes_per_lane, carry_bytes = _bwd_lane_bytes(widths, d_in, n_h, dtype)
    return 256 * bytes_per_lane + 2 * carry_bytes <= _stream_budget(dtype)


def _fwd_chunk_cap(widths, d_in, n_h, np_tile, dtype):
    """Forward kernel cap: only two stream generations are live at a time
    (no stored layers), so the cap is far looser than the backward's."""
    S = 1 + d_in + n_h
    dp = max(widths[0], _DP)
    per_lane = 2 * S * max(widths[1:]) + 3 * dp
    bytes_per_lane = per_lane * jnp.dtype(dtype).itemsize
    cap = int(_stream_budget(dtype) // bytes_per_lane) // 256 * 256
    return max(256, min(cap, np_tile))


def _prep_residual_args(params, x, chunk, expect_d_in, rhs=None):
    """Shared layout prep: pad features to _DP rows + points to a chunk
    multiple, transpose to (n_chunks, _DP, chunk), zero-pad W0 rows.

    ``rhs`` (optional, (n,)): a per-point right-hand side (e.g. the Poisson
    forcing f) rides in feature row ``d_in`` — one of the zero padding rows
    the sublane tiling forces us to stream anyway, so it costs NO extra
    bandwidth; W0's matching rows are zero, so the forward is unchanged and
    the kernel reads it back as ``xt[d_in]``."""
    x = jnp.asarray(x)
    n, d_in = x.shape
    if rhs is not None:
        if d_in + 1 > _DP:
            raise ValueError("no spare padding row for the rhs stream")
        x = jnp.concatenate(
            [x, jnp.asarray(rhs, x.dtype).reshape(n, 1)], axis=1
        )
    if d_in != expect_d_in:
        # steady wants (x, y); unsteady wants (t, x, y).  A mismatched
        # column count would silently misassign the Taylor streams.
        raise ValueError(
            f"ns_residual_mse: input has d_in={d_in} columns but "
            f"expected {expect_d_in} ({'unsteady (t,x,y)' if expect_d_in == 3 else 'steady (x,y)'})"
        )
    if n >= 2 ** 24:
        # the dynamic valid count rides an f32 SMEM scalar (exact for
        # integers below 2**24); the masks would silently break past it
        raise ValueError(f"batch of {n} points exceeds the 2**24 mask range")
    widths = [int(p["kernel"].shape[0]) for p in params] + [
        int(params[-1]["kernel"].shape[1])
    ]
    dtype = x.dtype
    n_pad = -(-n // chunk) * chunk
    if n_pad != n:
        x = jnp.concatenate(
            [x, jnp.zeros((n_pad - n, x.shape[1]), dtype=dtype)], axis=0
        )
    if x.shape[1] < _DP:
        x = jnp.concatenate(
            [x, jnp.zeros((x.shape[0], _DP - x.shape[1]), dtype=dtype)],
            axis=1,
        )
    xt = jnp.transpose(x.reshape(n_pad // chunk, chunk, _DP), (0, 2, 1))
    w_args = [jnp.asarray(p["kernel"], dtype=dtype) for p in params]
    w0 = w_args[0]
    if w0.shape[0] < _DP:
        w_args[0] = jnp.concatenate(
            [w0, jnp.zeros((_DP - w0.shape[0], w0.shape[1]), dtype=dtype)],
            axis=0,
        )
    b_args = [jnp.asarray(p["bias"], dtype=dtype)[None, :] for p in params]
    return xt, w_args, b_args, widths, n, dtype


def _phys_layout(phys):
    """(spatial column tuple, expected d_in) from the physics dict."""
    if phys.get("time", 0.0) != 0.0:
        return (1, 2), 3  # (t, x, y)
    return (0, 1), 2


def _ns_mse_forward(params, x, n_valid, phys, chunk, interpret, n_mean):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spatial, expect_d_in = _phys_layout(phys)
    probe_widths = [int(p["kernel"].shape[0]) for p in params] + [
        int(params[-1]["kernel"].shape[1])
    ]
    chunk = _fwd_chunk_cap(probe_widths, expect_d_in, len(spatial), chunk,
                           jnp.asarray(x).dtype)
    xt, w_args, b_args, widths, n, dtype = _prep_residual_args(
        params, x, chunk, expect_d_in
    )
    if n_mean is None:
        n_mean = n
    nv = jnp.asarray(n if n_valid is None else n_valid,
                     jnp.float32).reshape(1, 1)
    kernel = functools.partial(
        _residual_kernel, spatial=spatial, widths=widths, chunk=chunk,
        n_chunks=xt.shape[0], phys=dict(phys), prec=_dot_precision(dtype),
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * len(w_args))
    acc = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), dtype),
        interpret=interpret,
    )(xt, nv, *w_args, *b_args)
    return acc[0, :3] / n_mean


def _ns_mse_backward(params, x, gbar, n_valid, phys, chunk, interpret,
                     n_mean):
    """(dparams, mses): parameter cotangents for the given (3,) MSE
    cotangents, plus the raw MSE values (accumulated in the same pass)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spatial, expect_d_in = _phys_layout(phys)
    # the bwd pass stores per-layer streams + activation auxiliaries for
    # the whole chunk; cap it from the actual widths so the working set
    # stays inside the scoped VMEM budget (the batch itself streams from
    # HBM, so the cap is independent of batch size)
    probe_widths = [int(p["kernel"].shape[0]) for p in params] + [
        int(params[-1]["kernel"].shape[1])
    ]
    chunk = _bwd_chunk_cap(probe_widths, expect_d_in, len(spatial), chunk,
                           jnp.asarray(x).dtype)
    # interleave factor: ilv independent chunks in flight (MXU/VPU
    # co-scheduling, see _residual_bwd_kernel); the per-chunk cap halves so
    # the total live working set is unchanged
    ilv = _bwd_interleave()
    if ilv > 1:
        chunk = max(256, (chunk // ilv) // 256 * 256)
    xt, w_args, b_args, widths, n, dtype = _prep_residual_args(
        params, x, chunk, expect_d_in
    )
    if xt.shape[0] % ilv:
        pad_chunks = ilv - xt.shape[0] % ilv
        xt = jnp.concatenate(
            [xt, jnp.zeros((pad_chunks,) + xt.shape[1:], dtype=xt.dtype)],
            axis=0,
        )
    if n_mean is None:
        n_mean = n
    nv = jnp.asarray(n if n_valid is None else n_valid,
                     jnp.float32).reshape(1, 1)
    n_layers = len(w_args)
    kernel = functools.partial(
        _residual_bwd_kernel, spatial=spatial, widths=widths, chunk=chunk,
        n_chunks=xt.shape[0], phys=dict(phys), n_mean=int(n_mean),
        prec=_dot_precision(dtype), ilv=ilv,
    )
    gpad = jnp.zeros((8, 128), dtype=dtype).at[0, :3].set(
        jnp.asarray(gbar, dtype=dtype)
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + 2 * n_layers)
    dp = max(widths[0], _DP)
    out_shape = [
        jax.ShapeDtypeStruct((dp if i == 0 else widths[i], widths[i + 1]),
                             dtype)
        for i in range(n_layers)
    ] + [
        jax.ShapeDtypeStruct((1, widths[i + 1]), dtype)
        for i in range(n_layers)
    ] + [jax.ShapeDtypeStruct((8, 128), dtype)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_layers + 1)
    outs = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(xt, nv, *w_args, *b_args, gpad)
    dparams = [
        {"kernel": outs[i][: widths[i]], "bias": outs[n_layers + i][0]}
        for i in range(n_layers)
    ]
    mses = outs[2 * n_layers][0, :3] / n_mean
    return dparams, mses


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ns_mse_prim(params, x, n_valid, phys_items, chunk, interpret, n_mean):
    return _ns_mse_forward(params, x, n_valid, dict(phys_items), chunk,
                           interpret, n_mean)


def _ns_mse_fwd(params, x, n_valid, phys_items, chunk, interpret, n_mean):
    out = _ns_mse_forward(params, x, n_valid, dict(phys_items), chunk,
                          interpret, n_mean)
    return out, (params, x, n_valid)


def _ns_mse_bwd(phys_items, chunk, interpret, n_mean, res, gbar):
    params, x, n_valid = res
    dparams, _ = _ns_mse_backward(
        params, x, gbar, n_valid, dict(phys_items), chunk, interpret, n_mean
    )
    # no gradient w.r.t. the collocation points (never needed in training;
    # a zero cotangent keeps custom_vjp's signature satisfied) nor w.r.t.
    # the valid-count scalar
    return dparams, jnp.zeros_like(jnp.asarray(x)), jnp.zeros_like(
        jnp.asarray(n_valid, jnp.float32)
    )


_ns_mse_prim.defvjp(_ns_mse_fwd, _ns_mse_bwd)


# ---------------------------------------------------------------------------
# One-pass weighted objective: loss + raw MSEs + parameter grads, ONE kernel
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _ns_wobj_prim(params, x, n_valid, weights, phys_items, chunk, interpret,
                  n_mean):
    _, mses = _ns_mse_backward(
        params, x, jnp.asarray(weights), n_valid, dict(phys_items), chunk,
        interpret, n_mean,
    )
    w = jnp.asarray(weights, mses.dtype)
    return jnp.dot(w, mses), mses


def _ns_wobj_fwd(params, x, n_valid, weights, phys_items, chunk, interpret,
                 n_mean):
    dparams, mses = _ns_mse_backward(
        params, x, jnp.asarray(weights), n_valid, dict(phys_items), chunk,
        interpret, n_mean,
    )
    w = jnp.asarray(weights, mses.dtype)
    return (jnp.dot(w, mses), mses), (dparams, x, n_valid)


def _ns_wobj_bwd(weights, phys_items, chunk, interpret, n_mean, res, cts):
    dparams, x, n_valid = res
    g_loss, _g_mses = cts  # mses are LOG-ONLY: their cotangent is dropped
    scaled = jax.tree_util.tree_map(lambda a: g_loss * a, dparams)
    return scaled, jnp.zeros_like(jnp.asarray(x)), jnp.zeros_like(
        jnp.asarray(n_valid, jnp.float32)
    )


_ns_wobj_prim.defvjp(_ns_wobj_fwd, _ns_wobj_bwd)


def ns_residual_weighted_obj(params, x, physics, norm, weights,
                             np_tile: int = 4096, interpret: bool = False,
                             n_valid=None, n_mean=None):
    """(weighted_loss, (mse_mass, mse_u, mse_v)) in ONE kernel launch.

    ``weighted_loss = w·mses`` is differentiable w.r.t. ``params`` at zero
    extra cost: the kernel is the backward kernel called with the loss
    WEIGHTS as cotangents, so it produces the parameter gradients of the
    weighted loss in the same pass that materializes the residuals; the
    custom VJP just scales the stashed gradients.  This replaces the
    fwd+bwd kernel pair of a ``value_and_grad`` over ``ns_residual_mse``
    (4 propagation units and two HBM streams of the batch -> 3 units, one
    stream, one launch).

    ``n_valid`` (traced scalar, default = len(x)) masks tail padding rows;
    ``n_mean`` (static int, default = len(x)) is the mean denominator —
    under a mesh each shard passes its local valid count with the GLOBAL
    denominator, and the psum of per-shard results is the exact global
    objective for any batch length (tpinn.sharding.sharded_ns_weighted_obj).

    CONTRACT: the returned ``mses`` are for LOGGING ONLY — their cotangent
    is dropped by the VJP.  Wrap them in ``lax.stop_gradient`` at the call
    site (tpinn.pipeline.FusedNSWeightedObjective does)."""
    phys_items = (
        ("nv", float(norm.norm_vel)), ("npre", float(norm.norm_pre)),
        ("scale", float(norm.residual_scale)),
        ("conv", float(physics.conv)), ("visc", float(physics.visc)),
        ("pres", float(physics.pres)), ("time", float(physics.time)),
    )
    w = tuple(float(v) for v in weights)
    n = int(jnp.shape(x)[0])
    nv = jnp.asarray(n if n_valid is None else n_valid, jnp.float32)
    return _ns_wobj_prim(params, x, nv, w, phys_items, int(np_tile),
                         bool(interpret),
                         int(n if n_mean is None else n_mean))


def ns_residual_mse(params, x, physics, norm, np_tile: int = 4096,
                    interpret: bool = False, n_valid=None, n_mean=None):
    """(mse_mass, mse_u, mse_v) for the 2-D NS residual, steady or unsteady
    — one fused Pallas kernel with an in-kernel chunk loop and reduction,
    differentiable w.r.t. ``params`` via a hand-written backward kernel
    (recompute-based: the bwd pass re-propagates the Taylor streams and
    accumulates dW/db per chunk).  When ``physics.time != 0`` the batch is
    (t, x, y) with column 0 = t (the reference derivative-column
    convention, cavity_unsteady.py:188) and the momentum residual gains the
    a_t·nv·∂t U_k term.  ``n_valid``/``n_mean`` as in
    :func:`ns_residual_weighted_obj` (exact-mean masking for sharded tail
    padding).  Gradients w.r.t. ``x`` are defined as zero — training never
    differentiates the loss w.r.t. collocation points."""
    phys_items = (
        ("nv", float(norm.norm_vel)), ("npre", float(norm.norm_pre)),
        ("scale", float(norm.residual_scale)),
        ("conv", float(physics.conv)), ("visc", float(physics.visc)),
        ("pres", float(physics.pres)), ("time", float(physics.time)),
    )
    n = int(jnp.shape(x)[0])
    nv = jnp.asarray(n if n_valid is None else n_valid, jnp.float32)
    return _ns_mse_prim(params, x, nv, phys_items, int(np_tile),
                        bool(interpret),
                        int(n if n_mean is None else n_mean))


# ---------------------------------------------------------------------------
# Fused Poisson-residual kernels: r = −Δu − f  (the last jet-path PDE family)
# ---------------------------------------------------------------------------
#
# Same per-stream Taylor machinery as the NS kernels with two differences:
# the head is scalar (d_out = 1) and only the Hessian-diagonal streams feed
# the residual, so the output cotangents are (0, 0, [c, c]) and the whole
# backward reduces to the shared _reverse_walk.  The per-point forcing f
# rides feature row ``d_in`` of the HBM stream — one of the zero padding rows
# the sublane tiling forces us to DMA anyway (see _prep_residual_args), so
# it costs no extra bandwidth; W0's matching row is zero so the forward
# Taylor propagation never sees it.
#
# Reference semantics: Examples/Poisson_Problem/poisson.py:58-63 (−Δu − f
# under a persistent tape); this kernel replaces that whole tape walk plus
# the jet-path fallback with one launch (and, via the weighted-objective
# variant, folds the parameter gradients into the same launch).


_POISSON_SPATIAL = (0, 1)  # steady (x, y); d_in = 2


def _poisson_kernel(xt_ref, nv_ref, *refs, widths: Sequence[int], chunk: int,
                    n_chunks: int, scale: float, prec):
    """Forward sum of squared Poisson residuals (masked), streamed from HBM
    exactly like :func:`_residual_kernel`."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers = len(widths) - 1
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers : 2 * n_layers]
    out_ref = refs[2 * n_layers]

    d_in = widths[0]
    dp = max(d_in, _DP)
    dtype = xt_ref.dtype
    ws = [w_refs[i][...] for i in range(n_layers)]
    bs = [b_refs[i][...] for i in range(n_layers)]
    n_valid = nv_ref[0, 0]

    def scoped(xbuf, sems):
        def get_dma(slot, c):
            return pltpu.make_async_copy(
                xt_ref.at[c], xbuf.at[slot], sems.at[slot]
            )

        get_dma(0, 0).start()

        def body(c, acc):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

            get_dma(slot, c).wait()
            xt = xbuf[slot]
            _, _, sh, _, _ = _taylor_streams(
                ws, bs, xt, spatial=_POISSON_SPATIAL, d_in=d_in, chunk=chunk,
                dtype=dtype, prec=prec, keep_aux=False,
            )
            f_row = xt[d_in : d_in + 1]  # forcing stream (1, chunk)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            valid = (lane + c * chunk).astype(jnp.float32) < n_valid
            r = jnp.where(valid, (sh[0] + sh[1] + f_row) * scale, 0.0)
            return acc + jnp.sum(r * r)

        acc = jax.lax.fori_loop(0, n_chunks, body,
                                jnp.zeros((), dtype=dtype))
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        out_ref[...] = jnp.where((sub == 0) & (lane == 0), acc, 0.0)

    pl.run_scoped(
        scoped,
        xbuf=pltpu.VMEM((2, dp, chunk), dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _poisson_bwd_kernel(xt_ref, nv_ref, *refs, widths: Sequence[int],
                        chunk: int, n_chunks: int, scale: float,
                        n_mean: int, prec):
    """Backward of the Poisson-residual MSE w.r.t. the MLP parameters, with
    the raw squared-residual sum accumulated in the same pass (the one-pass
    weighted-objective contract of :func:`_residual_bwd_kernel`).  The
    residual touches only the Hessian-diagonal output streams, so the
    cotangent assembly is (ds_v, ds_g, ds_h) = (0, 0, [c, c]) with
    c = ḡ·(2/n)·r·scale, and the layer recursion is the shared
    :func:`_reverse_walk`."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers = len(widths) - 1
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers : 2 * n_layers]
    gbar_ref = refs[2 * n_layers]
    out_refs = refs[2 * n_layers + 1 :]
    dw_refs = out_refs[:n_layers]
    db_refs = out_refs[n_layers : 2 * n_layers]
    mse_ref = out_refs[2 * n_layers]

    d_in = widths[0]
    dp = max(d_in, _DP)
    dtype = xt_ref.dtype
    ws = [w_refs[i][...] for i in range(n_layers)]
    bs = [b_refs[i][...] for i in range(n_layers)]
    g_cot = gbar_ref[...][0, 0]
    n_valid = nv_ref[0, 0]

    def scoped(xbuf, sems):
        def get_dma(slot, c):
            return pltpu.make_async_copy(
                xt_ref.at[c], xbuf.at[slot], sems.at[slot]
            )

        get_dma(0, 0).start()

        def body(c, carry):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

            get_dma(slot, c).wait()
            return _bwd_chunk(c, xbuf[slot], carry)

        acc = jax.lax.fori_loop(0, n_chunks, body, init)
        for i in range(n_layers):
            dw_refs[i][...] = acc[i]
            db_refs[i][...] = acc[n_layers + i]
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        mse_ref[...] = jnp.where((sub == 0) & (lane == 0),
                                 acc[2 * n_layers], 0.0)

    def _bwd_chunk(c, xt, carry):
        grams = list(carry[:n_layers])
        dbs = list(carry[n_layers : 2 * n_layers])
        sq = carry[2 * n_layers]

        _, _, sh, s_layers, aux = _taylor_streams(
            ws, bs, xt, spatial=_POISSON_SPATIAL, d_in=d_in, chunk=chunk,
            dtype=dtype, prec=prec, keep_aux=True,
        )
        f_row = xt[d_in : d_in + 1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        valid = (lane + c * chunk).astype(jnp.float32) < n_valid
        r = jnp.where(valid, (sh[0] + sh[1] + f_row) * scale, 0.0)
        sq = sq + jnp.sum(r * r)

        two_over_n = jnp.asarray(2.0 / n_mean, dtype=dtype)
        c_h = g_cot * two_over_n * r * scale  # (1, chunk)
        # value/gradient head cotangents are STRUCTURAL zeros (the Poisson
        # residual touches only the Hessian streams) — pass None so the
        # reverse walk skips their head-layer matmuls entirely
        _reverse_walk(ws, s_layers, aux, None, [None] * d_in, [c_h, c_h],
                      grams, dbs, spatial=_POISSON_SPATIAL, d_in=d_in,
                      dp=dp, widths=widths, dtype=dtype, prec=prec)
        return tuple(grams) + tuple(dbs) + (sq,)

    in_dims = [dp] + [widths[i] for i in range(1, n_layers)]
    out_dims = [widths[i + 1] for i in range(n_layers)]
    init = tuple(
        jnp.zeros((in_dims[i], out_dims[i]), dtype=dtype)
        for i in range(n_layers)
    ) + tuple(
        jnp.zeros((1, widths[i + 1]), dtype=dtype) for i in range(n_layers)
    ) + (jnp.zeros((), dtype=dtype),)
    pl.run_scoped(
        scoped,
        xbuf=pltpu.VMEM((2, dp, chunk), dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _poisson_mse_forward(params, x, f, n_valid, scale, chunk, interpret,
                         n_mean):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    probe_widths = [int(p["kernel"].shape[0]) for p in params] + [
        int(params[-1]["kernel"].shape[1])
    ]
    chunk = _fwd_chunk_cap(probe_widths, 2, 2, chunk, jnp.asarray(x).dtype)
    xt, w_args, b_args, widths, n, dtype = _prep_residual_args(
        params, x, chunk, 2, rhs=f
    )
    if n_mean is None:
        n_mean = n
    nv = jnp.asarray(n if n_valid is None else n_valid,
                     jnp.float32).reshape(1, 1)
    kernel = functools.partial(
        _poisson_kernel, widths=widths, chunk=chunk, n_chunks=xt.shape[0],
        scale=float(scale), prec=_dot_precision(dtype),
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * len(w_args))
    acc = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), dtype),
        interpret=interpret,
    )(xt, nv, *w_args, *b_args)
    return acc[0, 0] / n_mean


def _poisson_mse_backward(params, x, f, gbar, n_valid, scale, chunk,
                          interpret, n_mean):
    """(dparams, mse): parameter cotangents for the scalar MSE cotangent
    ``gbar``, plus the raw MSE (accumulated in the same pass)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    probe_widths = [int(p["kernel"].shape[0]) for p in params] + [
        int(params[-1]["kernel"].shape[1])
    ]
    chunk = _bwd_chunk_cap(probe_widths, 2, 2, chunk, jnp.asarray(x).dtype)
    xt, w_args, b_args, widths, n, dtype = _prep_residual_args(
        params, x, chunk, 2, rhs=f
    )
    if n_mean is None:
        n_mean = n
    nv = jnp.asarray(n if n_valid is None else n_valid,
                     jnp.float32).reshape(1, 1)
    n_layers = len(w_args)
    kernel = functools.partial(
        _poisson_bwd_kernel, widths=widths, chunk=chunk,
        n_chunks=xt.shape[0], scale=float(scale), n_mean=int(n_mean),
        prec=_dot_precision(dtype),
    )
    gpad = jnp.zeros((8, 128), dtype=dtype).at[0, 0].set(
        jnp.asarray(gbar, dtype=dtype)
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + 2 * n_layers)
    dp = max(widths[0], _DP)
    out_shape = [
        jax.ShapeDtypeStruct((dp if i == 0 else widths[i], widths[i + 1]),
                             dtype)
        for i in range(n_layers)
    ] + [
        jax.ShapeDtypeStruct((1, widths[i + 1]), dtype)
        for i in range(n_layers)
    ] + [jax.ShapeDtypeStruct((8, 128), dtype)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_layers + 1)
    outs = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(xt, nv, *w_args, *b_args, gpad)
    dparams = [
        {"kernel": outs[i][: widths[i]], "bias": outs[n_layers + i][0]}
        for i in range(n_layers)
    ]
    mse = outs[2 * n_layers][0, 0] / n_mean
    return dparams, mse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _poisson_mse_prim(params, x, f, n_valid, scale, chunk, interpret,
                      n_mean):
    return _poisson_mse_forward(params, x, f, n_valid, scale, chunk,
                                interpret, n_mean)


def _poisson_mse_fwd(params, x, f, n_valid, scale, chunk, interpret, n_mean):
    out = _poisson_mse_forward(params, x, f, n_valid, scale, chunk,
                               interpret, n_mean)
    return out, (params, x, f, n_valid)


def _poisson_mse_bwd(scale, chunk, interpret, n_mean, res, gbar):
    params, x, f, n_valid = res
    dparams, _ = _poisson_mse_backward(
        params, x, f, gbar, n_valid, scale, chunk, interpret, n_mean
    )
    return dparams, jnp.zeros_like(jnp.asarray(x)), jnp.zeros_like(
        jnp.asarray(f)
    ), jnp.zeros_like(jnp.asarray(n_valid, jnp.float32))


_poisson_mse_prim.defvjp(_poisson_mse_fwd, _poisson_mse_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _poisson_wobj_prim(params, x, f, n_valid, weight, scale, chunk,
                       interpret, n_mean):
    _, mse = _poisson_mse_backward(
        params, x, f, jnp.asarray(weight), n_valid, scale, chunk, interpret,
        n_mean,
    )
    return weight * mse, mse


def _poisson_wobj_fwd(params, x, f, n_valid, weight, scale, chunk, interpret,
                      n_mean):
    dparams, mse = _poisson_mse_backward(
        params, x, f, jnp.asarray(weight), n_valid, scale, chunk, interpret,
        n_mean,
    )
    return (weight * mse, mse), (dparams, x, f, n_valid)


def _poisson_wobj_bwd(weight, scale, chunk, interpret, n_mean, res, cts):
    dparams, x, f, n_valid = res
    g_loss, _g_mse = cts  # mse is LOG-ONLY: its cotangent is dropped
    scaled = jax.tree_util.tree_map(lambda a: g_loss * a, dparams)
    return scaled, jnp.zeros_like(jnp.asarray(x)), jnp.zeros_like(
        jnp.asarray(f)
    ), jnp.zeros_like(jnp.asarray(n_valid, jnp.float32))


_poisson_wobj_prim.defvjp(_poisson_wobj_fwd, _poisson_wobj_bwd)


def poisson_residual_mse(params, x, f, normalization: float = 1.0,
                         np_tile: int = 4096, interpret: bool = False,
                         n_valid=None, n_mean=None):
    """mean(((−Δu − f)/normalization)²) for a scalar tanh MLP — one fused
    Pallas kernel, differentiable w.r.t. ``params`` via a hand-written
    backward kernel.  ``x`` is (N, 2); ``f`` is the per-point forcing (N,).
    ``n_valid``/``n_mean`` follow the exact-mean masking contract of
    :func:`ns_residual_mse`."""
    n = int(jnp.shape(x)[0])
    nv = jnp.asarray(n if n_valid is None else n_valid, jnp.float32)
    return _poisson_mse_prim(params, x, jnp.asarray(f).reshape(n), nv,
                             1.0 / float(normalization), int(np_tile),
                             bool(interpret),
                             int(n if n_mean is None else n_mean))


def poisson_residual_weighted_obj(params, x, f, weight: float,
                                  normalization: float = 1.0,
                                  np_tile: int = 4096,
                                  interpret: bool = False,
                                  n_valid=None, n_mean=None):
    """(weight·mse, mse) in ONE kernel launch — the Poisson analog of
    :func:`ns_residual_weighted_obj`: the backward kernel invoked with the
    loss weight as cotangent yields the weighted PDE loss, the raw MSE log
    channel, and the parameter gradients in a single pass.  The returned
    ``mse`` is LOG-ONLY (its cotangent is dropped by the VJP)."""
    n = int(jnp.shape(x)[0])
    nv = jnp.asarray(n if n_valid is None else n_valid, jnp.float32)
    return _poisson_wobj_prim(params, x, jnp.asarray(f).reshape(n), nv,
                              float(weight), 1.0 / float(normalization),
                              int(np_tile), bool(interpret),
                              int(n if n_mean is None else n_mean))


def mlp_taylor_bundle(
    params: List[dict],
    x,
    dim: int | None = None,
    np_tile: int = 512,
    interpret: bool | None = None,
):
    """Fused (value, jac, hdiag) of an MLP parameter list over batch x.

    params: list of {"kernel": (in, out), "bias": (out,)} (tpinn.models.MLP).
    x: (N, d_in).  Returns (value (N, d_out), jac (N, d_out, dim),
    hdiag (N, d_out, dim)).  N is padded internally to a tile multiple.
    interpret=None auto-selects interpret mode off-TPU (same policy as the
    fused NS-MSE kernel), so TPINN_USE_PALLAS=1 works on the CPU test mesh.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(x)
    n, d_in = x.shape
    if dim is None:
        dim = d_in
    widths = [int(p["kernel"].shape[0]) for p in params] + [
        int(params[-1]["kernel"].shape[1])
    ]
    d_out = widths[-1]
    dtype = x.dtype

    n_pad = -(-n // np_tile) * np_tile
    if n_pad != n:
        x = jnp.concatenate(
            [x, jnp.zeros((n_pad - n, d_in), dtype=dtype)], axis=0
        )

    n_layers = len(params)
    w_args = [jnp.asarray(p["kernel"], dtype=dtype) for p in params]
    b_args = [jnp.asarray(p["bias"], dtype=dtype)[None, :] for p in params]

    kernel = functools.partial(
        _kernel, dim=dim, widths=widths, np_tile=np_tile
    )

    grid = (n_pad // np_tile,)
    in_specs = [
        pl.BlockSpec((np_tile, d_in), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    ]
    for w in w_args:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    for b in b_args:
        in_specs.append(
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    out_shape = [
        jax.ShapeDtypeStruct((n_pad, d_out), dtype),
        jax.ShapeDtypeStruct((n_pad, d_out, dim), dtype),
        jax.ShapeDtypeStruct((n_pad, d_out, dim), dtype),
    ]
    out_specs = [
        pl.BlockSpec((np_tile, d_out), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((np_tile, d_out, dim), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((np_tile, d_out, dim), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    value, jac, hdiag = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x, *w_args, *b_args)
    return value[:n], jac[:n], hdiag[:n]
