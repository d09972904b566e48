"""Roofline probe — attainable MXU/VPU rates at the fused kernels' shapes.

The fused NS kernels move ~all their FLOPs through three dot shapes and a
fixed set of (width, chunk) elementwise ops.  Chip peaks (v5e: 197 TFLOP/s
bf16) are unreachable for 32-wide operands, so the honest roofline for the
train kernel is the ATTAINABLE rate at its own shapes, measured by bare
Pallas kernels that do nothing else:

  * fwd-style dot  (32, 32)ᵀ @ (32, C)  — S independent chains, matching
    the Taylor-stream parallelism (5 streams steady);
  * gram-style dot (32, C) × (32, C) → (32, 32) — lane-contracted dW;
  * VPU fma chains on (32, C) — the tanh-coupling/cotangent algebra.

Each probe prints achieved FLOP/s (or VPU op/s).  bench.py's analytic
per-point op counts then convert the one-pass train kernel's measured
pts/s into per-unit rates, and the gap to the probe ceilings says which
unit binds (docs/DESIGN.md roofline note).

Run on the real chip: python scripts/roofline_probe.py
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=2816)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--streams", type=int, default=5)
    ap.add_argument("--reps", type=int, default=96)
    # outer sized so one timed loop call does >=1 s of work: the axon
    # tunnel's per-dispatch overhead (~0.1 s) otherwise dominates and the
    # probe reads latency, not unit throughput
    ap.add_argument("--outer", type=int, default=32768)
    ap.add_argument("--hp", action="store_true",
                    help="probe under default_matmul_precision('highest') "
                         "with the TPINN_HP_DOT per-dot policy")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpinn.pallas.mlp_bundle import (
        _dot_fwd, _dot_gram, _dot_precision,
    )

    W, C, S, R = args.width, args.chunk, args.streams, args.reps
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(W, W)) * 0.1, dtype)
    streams = jnp.asarray(rng.normal(size=(S, W, C)) * 0.1, dtype)

    def run(kernel_body, flops_per_outer, tag, n_in=2):
        kern = pl.pallas_call(
            kernel_body,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, W, C), dtype),
        )

        @jax.jit
        def loop(wv, sv):
            def body(acc, _):
                return kern(wv, acc), None
            out, _ = jax.lax.scan(body, sv, None, length=args.outer)
            return out

        # block_until_ready does not reliably block through the axon remote
        # tunnel — force a host transfer of one element inside the timing.
        # MIN over reps: per-call tunnel-dispatch jitter only ever ADDS time
        _ = float(loop(w, streams)[0, 0, 0])
        times = []
        for _i in range(4):
            t0 = time.perf_counter()
            _ = float(loop(w, streams)[0, 0, 0])
            times.append(time.perf_counter() - t0)
        dt = min(times)
        rate = flops_per_outer * args.outer / dt
        print(json.dumps({"probe": tag, "rate_per_sec": rate,
                          "seconds": dt, "chunk": C, "width": W,
                          "streams": S, "reps": R}))
        return rate

    prec = _dot_precision(dtype)

    # All bodies keep S INDEPENDENT chains in flight (rep loop outer,
    # stream loop inner) — the real kernels have the same S-way ILP; a
    # serial per-stream chain would measure unit latency, not throughput.

    def fwd_body(w_ref, s_ref, o_ref):
        wv = w_ref[...]
        accs = [s_ref[si] for si in range(S)]
        for _ in range(R):
            # the 1e-3 rescale keeps the chain finite across reps and
            # costs one VPU op vs the matmul's 2·W²·C FLOPs
            accs = [_dot_fwd(wv, a, dtype, prec) * 1e-3 for a in accs]
        o_ref[...] = jnp.stack(accs)

    def gram_body(w_ref, s_ref, o_ref):
        # accumulate R gram contractions per stream into per-stream (W, W)
        # carries, then broadcast back out (forces materialization)
        accs = [s_ref[si] for si in range(S)]
        gs = [jnp.zeros((W, W), dtype) for _ in range(S)]
        for _ in range(R):
            gs = [g + _dot_gram(a, a, dtype, prec) for g, a in zip(gs, accs)]
            accs = [a * 0.999 for a in accs]  # new operands (defeats CSE)
        g = sum(gs[1:], gs[0])
        o_ref[...] = jnp.broadcast_to(g[:, :1], (S, W, C)) + s_ref[...] * 0.0

    def vpu_body(w_ref, s_ref, o_ref):
        accs = [s_ref[si] for si in range(S)]
        bs = [s_ref[(si + 1) % S] for si in range(S)]
        for _ in range(R):
            accs = [a * b + 0.5 for a, b in zip(accs, bs)]  # 1 fma = 2 ops
        o_ref[...] = jnp.stack(accs)

    def tanh_body(w_ref, s_ref, o_ref):
        # tanh throughput in ELEMENTS/s (bench counts it as 1 VPU op; the
        # probe says what it really costs on this chip)
        accs = [s_ref[si] for si in range(S)]
        for _ in range(R):
            accs = [jnp.tanh(a) for a in accs]
        o_ref[...] = jnp.stack(accs)

    def overlap_body(w_ref, s_ref, o_ref):
        # scheduling probe: an MXU chain (stream 0) and INDEPENDENT VPU
        # fma chains (streams 1..S-1) interleaved per rep.  MEASURED
        # (v5e): ≈ the serial SUM of the mxu-only and vpu-only probe
        # times, whether the chains are zipped per-rep or traced as
        # coarse blocks — at these operand sizes the probe chains spill
        # vregs and no co-scheduling materializes.  The real-kernel A/B
        # (TPINN_BWD_ILV) was also negative; the roofline note therefore
        # models the train kernel additively (docs/DESIGN.md).
        wv = w_ref[...]
        accs = [s_ref[si] for si in range(S)]
        bs = [s_ref[(si + 1) % S or 1] for si in range(S)]
        for _ in range(R):
            accs = [_dot_fwd(wv, accs[0], dtype, prec) * 1e-3] + [
                a * b + 0.5 for a, b in zip(accs[1:], bs[1:])
            ]
        o_ref[...] = jnp.stack(accs)

    matmul_flops = 2.0 * W * W * C * S * R
    ctx = (jax.default_matmul_precision("highest") if args.hp
           else jax.default_matmul_precision("default"))
    with ctx:
        run(fwd_body, matmul_flops, "fwd_dot" + ("_hp" if args.hp else ""))
        run(gram_body, matmul_flops, "gram_dot" + ("_hp" if args.hp else ""))
        run(vpu_body, 2.0 * W * C * S * R, "vpu_fma")
        run(tanh_body, 1.0 * W * C * S * R, "tanh_elems")
        # overlap: report wall seconds; compare against the fwd_dot (1/S of
        # its matmul work) and vpu_fma ((S-1)/S of its fma work) probes
        run(overlap_body, 2.0 * W * W * C * R + 2.0 * W * C * (S - 1) * R,
            "overlap_mix")


if __name__ == "__main__":
    main()
