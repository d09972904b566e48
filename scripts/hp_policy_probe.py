"""On-chip throughput A/B for the TPINN_HP_DOT policy (round-4 item 3).

Runs the one-pass Pallas train step under jax.default_matmul_precision
('highest') — the mode every second-order round traces in — with the
kernel's per-dot policy set to 6-pass f32-exact ('highest', the default)
vs 3-pass bf16_3x ('high').  The env var is read at TRACE time; each
bench_train_step call builds fresh closures, so flipping os.environ
between calls is safe (no jit-cache collision).

Usage: python scripts/hp_policy_probe.py [--points 262144] [--iters 20]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    # MATCH bench.py's defaults: at small batches the remote-tunnel dispatch
    # (~100 ms/call) dominates and the A/B reads pure latency, not the kernel
    ap.add_argument("--points", type=int, default=4194304)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from bench import _setup, bench_train_step

    model, params, norm, physics, dtype = _setup("float32")
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (args.points, 2)), dtype=dtype
    )

    out = {}
    for policy in ("highest", "high"):
        os.environ["TPINN_HP_DOT"] = policy
        pts, _, _ = bench_train_step(model, params, norm, physics, x,
                                     args.iters, use_pallas=True,
                                     highest=True)
        out[policy] = round(pts, 1)
        print(json.dumps({"policy": policy, "hp_train_pts_per_sec": out[policy]}))
    base, _, _ = bench_train_step(model, params, norm, physics, x,
                                  args.iters, use_pallas=True, highest=False)
    print(json.dumps({"policy": "ambient-default (bf16 1-pass)",
                      "train_pts_per_sec": round(base, 1),
                      "high_vs_highest": round(out["high"] / out["highest"], 3)}))


if __name__ == "__main__":
    main()
