"""Fused MLP Taylor-bundle Pallas kernel.

Computes, for every collocation point, the MLP outputs plus all first input
derivatives and the Hessian diagonals — the full bundle a Navier–Stokes
residual needs — in ONE kernel pass.

Layout (TPU-first): features live on sublanes, points on lanes.  The five
Taylor streams per direction pair —

    v   : value
    g_k : ∂/∂x_k        (k = 0..d-1)
    h_k : ∂²/∂x_k²

— are stacked along the LANE axis, so each dense layer is a single
(out, in) @ (in, S·Np) matmul on the MXU (S = 1 + 2d streams).  The tanh
coupling uses lane slices at Np-multiples (Np is a multiple of 128):

    z streams:  v' = tanh(z_v);  g' = (1 − v'²) g_z;
    h' = −2 v' (1 − v'²) g_z² + (1 − v'²) h_z

Biases are added to the value stream only.  Derivation: standard truncated
Taylor (jet) propagation; identical math to tpinn.operators.taylor_bundle,
which serves as the cross-checked XLA fallback (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
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
    'float32').  tpinn.optimize.minimize wraps every round in that context
    (bf16 matmul passes inject ~1e-3 loss jitter that breaks quasi-Newton
    accept tests); Mosaic then emits multi-pass f32 matmuls whose scoped
    VMEM scratch is ~4-6x larger — measured 22M vs the 16M limit at
    chunk=2048 — so the streamed kernels must shrink their chunk."""
    prec = jax.config.jax_default_matmul_precision
    return prec is not None and str(prec).lower() in ("highest", "float32")


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


def _residual_kernel(xt_ref, *refs, spatial: Sequence[int],
                     widths: Sequence[int], chunk: int, n_chunks: int,
                     phys: dict, n_total: int):
    """Single-instance fused NS-residual kernel (steady OR unsteady).

    The (transposed) point batch stays in HBM; a double-buffered DMA
    pipeline streams one (d_in, chunk) lane-chunk at a time into a VMEM
    scratch while the previous chunk computes, so VMEM use is O(chunk) and
    the kernel scales to arbitrarily large point batches.  Each chunk
    propagates the Taylor streams — [val | g_0 .. g_{d_in-1} | h_x h_y],
    one gradient stream per input column, Hessian-diagonal streams for the
    spatial columns only (S = 5 steady, 6 unsteady where column 0 is t) —
    through the MLP (one (out, in) @ (in, S*chunk) MXU matmul per layer)
    and accumulates the three squared-residual partial sums in the
    fori_loop carry.  No grid, no output-block revisiting — the pipeline
    serialization of a constant-output accumulator block is avoided
    entirely.  ``spatial`` maps (x, y) to input columns ((0, 1) steady,
    (1, 2) unsteady, the reference derivative-column convention,
    cavity_unsteady.py:188); ``phys["time"]`` multiplies the nv·∂t U_k
    momentum term.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers = len(widths) - 1
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers : 2 * n_layers]
    out_ref = refs[2 * n_layers]

    d_in = widths[0]
    dp = max(d_in, _DP)  # padded feature rows (see _prep_residual_args)
    n_h = len(spatial)
    sx, sy = spatial
    dtype = xt_ref.dtype
    eye = jnp.eye(dp, dtype=dtype)
    nv, npre, scale = phys["nv"], phys["npre"], phys["scale"]
    conv, visc, pres = phys["conv"], phys["visc"], phys["pres"]
    timec = phys.get("time", 0.0)

    ws = [w_refs[i][...] for i in range(n_layers)]
    bs = [b_refs[i][...] for i in range(n_layers)]

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
            xt = xbuf[slot]  # (d_in, CH)
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
        streams = [xt]
        for k in range(d_in):
            streams.append(
                jnp.broadcast_to(eye[:, k : k + 1], (dp, chunk))
            )
        for _ in range(n_h):
            streams.append(jnp.zeros((dp, chunk), dtype=dtype))
        s = jnp.concatenate(streams, axis=1)  # (d_in, S*CH)

        for li in range(n_layers):
            z = jax.lax.dot_general(
                ws[li], s, (((0,), (0,)), ((), ())),
                preferred_element_type=dtype,
            )
            zv = z[:, :chunk] + bs[li].T
            if li < n_layers - 1:
                v = jnp.tanh(zv)
                tp = 1.0 - v * v
                new = [v]
                for k in range(d_in):
                    gz = z[:, (1 + k) * chunk : (2 + k) * chunk]
                    new.append(tp * gz)
                for j, pk in enumerate(spatial):
                    gz = z[:, (1 + pk) * chunk : (2 + pk) * chunk]
                    hz = z[:, (1 + d_in + j) * chunk
                           : (2 + d_in + j) * chunk]
                    new.append(-2.0 * v * tp * gz * gz + tp * hz)
                s = jnp.concatenate(new, axis=1)
            else:
                s = jnp.concatenate([zv, z[:, chunk:]], axis=1)

        val = s[:, :chunk]
        gx = s[:, (1 + sx) * chunk : (2 + sx) * chunk]
        gy = s[:, (1 + sy) * chunk : (2 + sy) * chunk]
        hx = s[:, (1 + d_in) * chunk : (2 + d_in) * chunk]
        hy = s[:, (2 + d_in) * chunk : (3 + d_in) * chunk]
        gt = s[:, chunk : 2 * chunk]  # ∂t stream (column 0; unsteady only)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)[0]
        valid = (lane + c * chunk) < n_total

        r_mass = jnp.where(valid, gx[0] + gy[1], 0.0)
        U = nv * val[0]
        V = nv * val[1]
        pm = jnp.sum(r_mass * r_mass)
        moms = []
        for k in (0, 1):
            dkx = nv * gx[k]
            dky = nv * gy[k]
            lap = nv * (hx[k] + hy[k])
            dpk = npre * (gx[2] if k == 0 else gy[2])
            r = conv * (U * dkx + V * dky) - visc * lap + pres * dpk
            if timec != 0.0:
                r = r + timec * nv * gt[k]
            r = jnp.where(valid, r * scale, 0.0)
            moms.append(jnp.sum(r * r))
        return acc + jnp.stack([pm, moms[0], moms[1]])

    pl.run_scoped(
        scoped,
        xbuf=pltpu.VMEM((2, dp, chunk), dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _residual_bwd_kernel(xt_ref, *refs, spatial: Sequence[int],
                         widths: Sequence[int], chunk: int, n_chunks: int,
                         phys: dict, n_total: int):
    """Backward of the fused NS-residual MSEs w.r.t. the MLP parameters.

    One pass per chunk: recompute the Taylor streams layer by layer
    (storing per-layer inputs + activation auxiliaries), form the residual
    cotangents from the incoming (3,) MSE cotangents, and walk the layers in
    reverse accumulating dW/db in the fori_loop carry.  Gradients w.r.t. the
    collocation points are NOT produced (training never needs them).

    The three raw squared-residual SUMS are accumulated alongside and
    written to a final (8, 128) output block — they come for free (the
    residuals are materialized for the cotangents anyway), which is what
    makes the ONE-PASS training objective possible: calling this kernel
    with the loss weights as cotangents yields the weighted PDE loss, its
    raw MSE components, AND the parameter gradients in a single launch,
    replacing the fwd+bwd pair (4 propagation units -> 3, one HBM stream
    of the batch instead of two).  See ``ns_residual_weighted_obj``.

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
    eye = jnp.eye(dp, dtype=dtype)
    nv, npre, scale = phys["nv"], phys["npre"], phys["scale"]
    conv, visc, pres = phys["conv"], phys["visc"], phys["pres"]
    timec = phys.get("time", 0.0)

    ws = [w_refs[i][...] for i in range(n_layers)]
    bs = [b_refs[i][...] for i in range(n_layers)]
    gbar = gbar_ref[...]
    g_cot = [gbar[0, j] for j in range(3)]  # mass, mom-u, mom-v cotangents

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
        gram = acc[0]  # packed (Σ in_li, Σ out_li) dW Gram — see _bwd_chunk
        for i in range(n_layers):
            dw_refs[i][...] = gram[
                row_off[i] : row_off[i + 1], col_off[i] : col_off[i + 1]
            ]
            db_refs[i][...] = acc[1 + i]
        sq = acc[1 + n_layers]  # (3,) squared-residual sums
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        out = jnp.zeros((8, 128), dtype=dtype)
        for j in range(3):
            out = out + jnp.where((sub == 0) & (lane == j), sq[j], 0.0)
        mse_ref[...] = out

    def _bwd_chunk(c, xt, carry):
        streams = [xt]
        for k in range(d_in):
            streams.append(jnp.broadcast_to(eye[:, k : k + 1], (dp, chunk)))
        for _ in range(n_h):
            streams.append(jnp.zeros((dp, chunk), dtype=dtype))
        s = jnp.concatenate(streams, axis=1)

        s_list = [s]  # layer inputs
        aux = []  # per hidden layer: (v, tp, gz list, hz list)
        for li in range(n_layers):
            z = jax.lax.dot_general(
                ws[li], s_list[-1], (((0,), (0,)), ((), ())),
                preferred_element_type=dtype,
            )
            zv = z[:, :chunk] + bs[li].T
            if li < n_layers - 1:
                v = jnp.tanh(zv)
                tp = 1.0 - v * v
                gz = [z[:, (1 + k) * chunk : (2 + k) * chunk]
                      for k in range(d_in)]
                hz = [z[:, (1 + d_in + j) * chunk : (2 + d_in + j) * chunk]
                      for j in range(n_h)]
                new = [v]
                for k in range(d_in):
                    new.append(tp * gz[k])
                for j, pk in enumerate(spatial):
                    new.append(-2.0 * v * tp * gz[pk] * gz[pk] + tp * hz[j])
                aux.append((v, tp, gz, hz))
                s_list.append(jnp.concatenate(new, axis=1))
            else:
                aux.append(None)
                s_list.append(jnp.concatenate([zv, z[:, chunk:]], axis=1))

        sL = s_list[-1]
        val = sL[:, :chunk]
        gx = sL[:, (1 + sx) * chunk : (2 + sx) * chunk]
        gy = sL[:, (1 + sy) * chunk : (2 + sy) * chunk]
        hx = sL[:, (1 + d_in) * chunk : (2 + d_in) * chunk]
        hy = sL[:, (2 + d_in) * chunk : (3 + d_in) * chunk]
        gt = sL[:, chunk : 2 * chunk]  # ∂t stream (col 0; unsteady only)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)[0]
        valid = (lane + c * chunk) < n_total

        # residuals (same as forward) and per-point cotangents c_* = ḡ·2r/n
        two_over_n = jnp.asarray(2.0 / n_total, dtype=dtype)
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
        dhx = jnp.stack([-c_k[0] * visc * nv, -c_k[1] * visc * nv, zero])
        dhy = jnp.stack([-c_k[0] * visc * nv, -c_k[1] * visc * nv, zero])

        dg_by_col = {sx: dgx, sy: dgy}
        if timec != 0.0:
            dg_by_col[0] = jnp.stack(
                [c_k[0] * (timec * nv), c_k[1] * (timec * nv), zero]
            )
        zero3 = jnp.zeros((3, chunk), dtype=dtype)
        ds = jnp.concatenate(
            [dval]
            + [dg_by_col.get(k, zero3) for k in range(d_in)]
            + [dhx, dhy],
            axis=1,
        )  # (3, S·CH)

        dbs = list(carry[1 : 1 + n_layers])
        sq = carry[1 + n_layers] + jnp.stack(sq_parts)
        dz_list = [None] * n_layers
        for li in range(n_layers - 1, -1, -1):
            if li == n_layers - 1:
                dz = ds
            else:
                v, tp, gz, hz = aux[li]
                dv_ = ds[:, :chunk]
                dG = [ds[:, (1 + k) * chunk : (2 + k) * chunk]
                      for k in range(d_in)]
                dH = [ds[:, (1 + d_in + j) * chunk : (2 + d_in + j) * chunk]
                      for j in range(n_h)]
                dz_v = dv_ * tp
                for k in range(d_in):
                    dz_v = dz_v + dG[k] * (-2.0 * v * tp * gz[k])
                for j, pk in enumerate(spatial):
                    dz_v = dz_v + dH[j] * (
                        -2.0 * tp * (tp - 2.0 * v * v) * gz[pk] * gz[pk]
                        - 2.0 * v * tp * hz[j]
                    )
                dz_parts = [dz_v]
                for k in range(d_in):
                    part = dG[k] * tp
                    for j, pk in enumerate(spatial):
                        if pk == k:
                            part = part + dH[j] * (-4.0 * v * tp * gz[k])
                    dz_parts.append(part)
                for j in range(n_h):
                    dz_parts.append(dH[j] * tp)
                dz = jnp.concatenate(dz_parts, axis=1)
            # bias feeds the value stream only
            dbs[li] = dbs[li] + jnp.sum(dz[:, :chunk], axis=1)[None, :]
            dz_list[li] = dz
            if li > 0:
                # layer 0's input gradient is never used (training never
                # differentiates w.r.t. the collocation points) — skip it.
                ds = jax.lax.dot_general(
                    ws[li], dz, (((1,), (0,)), ((), ())),
                    preferred_element_type=dtype,
                )
        # ONE packed dW contraction per chunk: the per-layer dW matmuls have
        # tiny (in_li, out_li) output tiles (32×32 ≪ the 128×128 MXU), so
        # four separate long-K matmuls waste ~4× the MXU passes.  Stacking
        # the layer inputs (Σ in_li = 104 rows for the standard 3×32 net)
        # against the stacked dz cotangents (Σ out_li = 99 rows) fills one
        # MXU tile; the per-layer dW blocks are the diagonal of the Gram,
        # sliced out once after the chunk loop.
        s_cat = jnp.concatenate(s_list[:n_layers], axis=0)
        dz_cat = jnp.concatenate(dz_list, axis=0)
        gram = carry[0] + jax.lax.dot_general(
            s_cat, dz_cat, (((1,), (1,)), ((), ())),
            preferred_element_type=dtype,
        )
        return (gram,) + tuple(dbs) + (sq,)

    in_dims = [dp] + [widths[i] for i in range(1, n_layers)]
    out_dims = [widths[i + 1] for i in range(n_layers)]
    row_off = [0]
    for d in in_dims:
        row_off.append(row_off[-1] + d)
    col_off = [0]
    for d in out_dims:
        col_off.append(col_off[-1] + d)
    init = (
        jnp.zeros((row_off[-1], col_off[-1]), dtype=dtype),
    ) + tuple(
        jnp.zeros((1, widths[i + 1]), dtype=dtype) for i in range(n_layers)
    ) + (jnp.zeros((3,), dtype=dtype),)
    pl.run_scoped(
        scoped,
        xbuf=pltpu.VMEM((2, dp, chunk), dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


_DP = 8  # padded feature rows: the HBM-streamed (n_chunks, d_in, chunk)
# memref is sublane-tiled, and Mosaic requires DMA slices aligned to the
# tile (observed: d_in=3 picks a (4,128) tiling and the slice fails).
# Padding the feature dim to the f32 sublane tile (8) with zero rows —
# and the first-layer weights to match — keeps every DMA tile-aligned with
# no in-kernel slicing; the padded rows are exact zeros so the first-layer
# matmul is unchanged.


def _prep_residual_args(params, x, chunk, expect_d_in):
    """Shared layout prep: pad features to _DP rows + points to a chunk
    multiple, transpose to (n_chunks, _DP, chunk), zero-pad W0 rows."""
    x = jnp.asarray(x)
    n, d_in = x.shape
    if d_in != expect_d_in:
        # steady wants (x, y); unsteady wants (t, x, y).  A mismatched
        # column count would silently misassign the Taylor streams.
        raise ValueError(
            f"ns_residual_mse: input has d_in={d_in} columns but "
            f"expected {expect_d_in} ({'unsteady (t,x,y)' if expect_d_in == 3 else 'steady (x,y)'})"
        )
    widths = [int(p["kernel"].shape[0]) for p in params] + [
        int(params[-1]["kernel"].shape[1])
    ]
    dtype = x.dtype
    n_pad = -(-n // chunk) * chunk
    if n_pad != n:
        x = jnp.concatenate(
            [x, jnp.zeros((n_pad - n, d_in), dtype=dtype)], axis=0
        )
    if d_in < _DP:
        x = jnp.concatenate(
            [x, jnp.zeros((x.shape[0], _DP - d_in), dtype=dtype)], axis=1
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


def _ns_mse_forward(params, x, phys, chunk, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if _high_precision_ambient():
        chunk = min(chunk, 512)
    spatial, expect_d_in = _phys_layout(phys)
    xt, w_args, b_args, widths, n, dtype = _prep_residual_args(
        params, x, chunk, expect_d_in
    )
    kernel = functools.partial(
        _residual_kernel, spatial=spatial, widths=widths, chunk=chunk,
        n_chunks=xt.shape[0], phys=dict(phys), n_total=n,
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)] + [
        pl.BlockSpec(memory_space=pltpu.VMEM)
    ] * (2 * len(w_args))
    acc = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), dtype),
        interpret=interpret,
    )(xt, *w_args, *b_args)
    return acc[0, :3] / n


def _ns_mse_backward(params, x, gbar, phys, chunk, interpret):
    """(dparams, mses): parameter cotangents for the given (3,) MSE
    cotangents, plus the raw MSE values (accumulated in the same pass)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # The backward pass stores per-layer streams + activation auxiliaries for
    # the whole chunk (~4.5 KB/point at width 32); cap the chunk so the
    # working set stays inside the ~16 MB scoped VMEM budget.  The batch
    # itself streams from HBM, so this cap is independent of batch size.
    chunk = min(chunk, 512 if _high_precision_ambient() else 2048)
    spatial, expect_d_in = _phys_layout(phys)
    xt, w_args, b_args, widths, n, dtype = _prep_residual_args(
        params, x, chunk, expect_d_in
    )
    n_layers = len(w_args)
    kernel = functools.partial(
        _residual_bwd_kernel, spatial=spatial, widths=widths, chunk=chunk,
        n_chunks=xt.shape[0], phys=dict(phys), n_total=n,
    )
    gpad = jnp.zeros((8, 128), dtype=dtype).at[0, :3].set(
        jnp.asarray(gbar, dtype=dtype)
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)] + [
        pl.BlockSpec(memory_space=pltpu.VMEM)
    ] * (1 + 2 * n_layers)
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
    )(xt, *w_args, *b_args, gpad)
    dparams = [
        {"kernel": outs[i][: widths[i]], "bias": outs[n_layers + i][0]}
        for i in range(n_layers)
    ]
    mses = outs[2 * n_layers][0, :3] / n
    return dparams, mses


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _ns_mse_prim(params, x, phys_items, chunk, interpret):
    return _ns_mse_forward(params, x, dict(phys_items), chunk, interpret)


def _ns_mse_fwd(params, x, phys_items, chunk, interpret):
    out = _ns_mse_forward(params, x, dict(phys_items), chunk, interpret)
    return out, (params, x)


def _ns_mse_bwd(phys_items, chunk, interpret, res, gbar):
    params, x = res
    dparams, _ = _ns_mse_backward(
        params, x, gbar, dict(phys_items), chunk, interpret
    )
    # no gradient w.r.t. the collocation points (never needed in training;
    # a zero cotangent keeps custom_vjp's signature satisfied)
    return dparams, jnp.zeros_like(jnp.asarray(x))


_ns_mse_prim.defvjp(_ns_mse_fwd, _ns_mse_bwd)


# ---------------------------------------------------------------------------
# One-pass weighted objective: loss + raw MSEs + parameter grads, ONE kernel
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _ns_wobj_prim(params, x, weights, phys_items, chunk, interpret):
    _, mses = _ns_mse_backward(
        params, x, jnp.asarray(weights), dict(phys_items), chunk, interpret
    )
    w = jnp.asarray(weights, mses.dtype)
    return jnp.dot(w, mses), mses


def _ns_wobj_fwd(params, x, weights, phys_items, chunk, interpret):
    dparams, mses = _ns_mse_backward(
        params, x, jnp.asarray(weights), dict(phys_items), chunk, interpret
    )
    w = jnp.asarray(weights, mses.dtype)
    return (jnp.dot(w, mses), mses), (dparams, x)


def _ns_wobj_bwd(weights, phys_items, chunk, interpret, res, cts):
    dparams, x = res
    g_loss, _g_mses = cts  # mses are LOG-ONLY: their cotangent is dropped
    scaled = jax.tree_util.tree_map(lambda a: g_loss * a, dparams)
    return scaled, jnp.zeros_like(jnp.asarray(x))


_ns_wobj_prim.defvjp(_ns_wobj_fwd, _ns_wobj_bwd)


def ns_residual_weighted_obj(params, x, physics, norm, weights,
                             np_tile: int = 4096, interpret: bool = False):
    """(weighted_loss, (mse_mass, mse_u, mse_v)) in ONE kernel launch.

    ``weighted_loss = w·mses`` is differentiable w.r.t. ``params`` at zero
    extra cost: the kernel is the backward kernel called with the loss
    WEIGHTS as cotangents, so it produces the parameter gradients of the
    weighted loss in the same pass that materializes the residuals; the
    custom VJP just scales the stashed gradients.  This replaces the
    fwd+bwd kernel pair of a ``value_and_grad`` over ``ns_residual_mse``
    (4 propagation units and two HBM streams of the batch -> 3 units, one
    stream, one launch).

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
    return _ns_wobj_prim(params, x, w, phys_items, int(np_tile),
                         bool(interpret))


def ns_residual_mse(params, x, physics, norm, np_tile: int = 4096,
                    interpret: bool = False):
    """(mse_mass, mse_u, mse_v) for the 2-D NS residual, steady or unsteady
    — one fused Pallas kernel with an in-kernel chunk loop and reduction,
    differentiable w.r.t. ``params`` via a hand-written backward kernel
    (recompute-based: the bwd pass re-propagates the Taylor streams and
    accumulates dW/db per chunk).  When ``physics.time != 0`` the batch is
    (t, x, y) with column 0 = t (the reference derivative-column
    convention, cavity_unsteady.py:188) and the momentum residual gains the
    a_t·nv·∂t U_k term.  Gradients w.r.t. ``x`` are defined as zero —
    training never differentiates the loss w.r.t. collocation points."""
    phys_items = (
        ("nv", float(norm.norm_vel)), ("npre", float(norm.norm_pre)),
        ("scale", float(norm.residual_scale)),
        ("conv", float(physics.conv)), ("visc", float(physics.visc)),
        ("pres", float(physics.pres)), ("time", float(physics.time)),
    )
    return _ns_mse_prim(params, x, phys_items, int(np_tile), bool(interpret))


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
