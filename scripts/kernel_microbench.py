"""Round-4 kernel tuning microbench — run on the real TPU.

Measures the fused NS-residual kernels (tpinn/pallas/mlp_bundle.py) across
the tuning knobs so the chunk caps / precision policy are set from data:

  * forward kernel pts/s vs chunk size
  * one-pass train objective (value_and_grad of ns_residual_weighted_obj)
    pts/s vs chunk size
  * the high-precision path (ambient default_matmul_precision('highest'),
    the mode every second-order round runs in) vs chunk AND vs the internal
    dot precision (TPINN_HP_DOT=highest 6-pass vs high 3-pass bf16_3x),
    including the numerical deviation of `high` from the trusted `highest`
    lowering (loss and gradient), which decides whether the 3-pass mode is
    admissible for the quasi-Newton accept tests.

Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=4194304)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--hp-points", type=int, default=1048576)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpinn.geometry import Normalization
    from tpinn.models import MLP
    from tpinn.pallas import mlp_bundle as mb
    from tpinn.pipeline import NSPhysics

    model = MLP(2, 3, width=32, depth=3, seed=0)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), model.params
    )
    norm = Normalization(np.array([0.0, 500.0]), np.array([0.0, 250.0]),
                         np.array([-1e4, 1e4]))
    phys = NSPhysics(conv=1.0, visc=1.0)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (args.points, 2)),
        dtype=jnp.float32,
    )

    def timed(loop, ops_args, n, iters):
        out = float(jax.device_get(loop(*ops_args)))
        t0 = time.perf_counter()
        out = float(jax.device_get(loop(*ops_args)))
        dt = (time.perf_counter() - t0) / iters
        return n / dt, out

    def fwd_loop(np_tile, xb, iters):
        @jax.jit
        def loop(p, xx):
            def body(acc, _):
                m = mb.ns_residual_mse(p, xx, phys, norm, np_tile=np_tile)
                return acc + 10.0 * m[0] + m[1] + m[2], None
            acc, _ = jax.lax.scan(body, 0.0, None, length=iters)
            return acc
        return loop

    def train_loop(np_tile, xb, iters):
        def loss_fn(p, xx):
            L, _ = mb.ns_residual_weighted_obj(
                p, xx, phys, norm, (10.0, 1.0, 1.0), np_tile=np_tile)
            return L

        @jax.jit
        def loop(p, xx):
            def body(acc, _):
                l, g = jax.value_and_grad(loss_fn)(p, xx)
                return acc + l + g[0]["bias"][0], None
            acc, _ = jax.lax.scan(body, 0.0, None, length=iters)
            return acc
        return loop

    results = []

    # ---- default-precision sweep -------------------------------------
    for np_tile in (1024, 2048, 4096, 8192):
        jax.clear_caches()
        pts, _ = timed(fwd_loop(np_tile, x, args.iters), (params, x),
                       args.points, args.iters)
        r = {"mode": "fwd", "np_tile": np_tile, "pts_per_sec": round(pts, 1)}
        print(json.dumps(r), flush=True)
        results.append(r)
    for np_tile, budget in ((1024, None), (2048, None), (4096, 15 << 20),
                            (8192, None)):
        jax.clear_caches()
        saved = mb._VMEM_BUDGET
        if budget:
            mb._VMEM_BUDGET = budget  # probe past the default cap
        try:
            pts, _ = timed(train_loop(np_tile, x, args.iters), (params, x),
                           args.points, args.iters)
            r = {"mode": "train_onepass", "np_tile": np_tile,
                 "pts_per_sec": round(pts, 1)}
        except Exception as e:
            r = {"mode": "train_onepass", "np_tile": np_tile,
                 "error": str(e)[:200]}
        finally:
            mb._VMEM_BUDGET = saved
        print(json.dumps(r), flush=True)
        results.append(r)

    # ---- high-precision sweep ----------------------------------------
    xh = x[: args.hp_points]
    ref = {}
    for dot in ("highest", "high"):
        os.environ["TPINN_HP_DOT"] = dot
        for np_tile in (512, 1024, 2048):
            jax.clear_caches()
            with jax.default_matmul_precision("highest"):
                pts, _ = timed(train_loop(np_tile, xh, args.iters),
                               (params, xh), args.hp_points, args.iters)
            r = {"mode": "train_hp", "dot": dot, "np_tile": np_tile,
                 "pts_per_sec": round(pts, 1)}
            print(json.dumps(r), flush=True)
            results.append(r)
        # numerics: loss + grad under this dot precision at max chunk
        jax.clear_caches()
        with jax.default_matmul_precision("highest"):
            def loss_fn(p):
                L, _ = mb.ns_residual_weighted_obj(
                    p, xh, phys, norm, (10.0, 1.0, 1.0), np_tile=2048)
                return L
            l, g = jax.jit(jax.value_and_grad(loss_fn))(params)
            gf, _ = jax.flatten_util.ravel_pytree(g)
            ref[dot] = (float(l), np.asarray(jax.device_get(gf)))
    os.environ.pop("TPINN_HP_DOT", None)
    l_hi, g_hi = ref["highest"]
    l_h3, g_h3 = ref["high"]
    dev = {
        "mode": "hp_dot_deviation",
        "loss_rel": abs(l_h3 - l_hi) / max(abs(l_hi), 1e-30),
        "grad_rel_max": float(
            np.max(np.abs(g_h3 - g_hi)) / (np.max(np.abs(g_hi)) + 1e-30)
        ),
    }
    print(json.dumps(dev), flush=True)


if __name__ == "__main__":
    main()
