"""TPINN_HP_DOT accept-test validation (round-4 VERDICT item 3).

Every second-order round runs under jax.default_matmul_precision("highest");
the fused kernels respond per-dot via TPINN_HP_DOT (tpinn/pallas/
mlp_bundle.py::_dot_precision): ``highest`` = 6-pass f32-exact, ``high`` =
3-pass bf16_3x (~2e-6 relative — ~2 ½ orders below the 1e-3 single-pass
bf16 jitter the precision context exists to kill, at half the MXU passes).

This scan runs the SAME short Poiseuille campaign (Adam + a quasi-Newton
second round on the fused-kernel loss) under both policies on the real chip
and reports, per policy: the logged loss trajectory, final test losses, and
the second round's wall time.  ``high`` is safe to make the default iff its
trajectory tracks ``highest`` to ~1e-4 relative (the accept logic never
stalls) while running measurably faster.

Usage: python scripts/hp_dot_accept_scan.py [--epochs 150] [--rounds jax,jax-bfgs]
"""

import argparse
import importlib.util
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "examples", "Poiseuille_Flow")


def run_one(policy, second_round, epochs):
    """Child process per run: TPINN_HP_DOT is read at trace time, and the
    jit cache would otherwise mix the two policies."""
    env = dict(os.environ, TPINN_HP_DOT=policy)
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, os.path.join(SRC, "poiseuille_flow.py"),
         "--epochs", str(epochs), "--second-round", second_round,
         "--scratch"],
        env=env, capture_output=True, text=True, cwd=ROOT, timeout=3600,
    )
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        print(f"{policy}/{second_round}: FAILED\n{r.stdout[-800:]}\n{r.stderr[-800:]}")
        return None
    # --scratch writes into the example's Last_Training (read between runs;
    # the next run overwrites it)
    case = os.path.join(SRC, "Last_Training")
    hist = json.load(open(os.path.join(case, "History_Loss.json")))
    return {"policy": policy, "round": second_round, "wall_s": dt,
            "iters": hist["log"]["iter"],
            "loss": hist["log"]["loss_global"],
            "test": {k: v["log"][-1] for k, v in hist["losses_test"].items()}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--rounds", default="jax,jax-bfgs")
    args = ap.parse_args()

    for second_round in args.rounds.split(","):
        runs = {}
        for policy in ("highest", "high"):
            runs[policy] = run_one(policy, second_round, args.epochs)
        if not all(runs.values()):
            continue
        hi, lo = runs["highest"], runs["high"]
        n = min(len(hi["loss"]), len(lo["loss"]))
        rel = [abs(a - b) / max(abs(a), 1e-30)
               for a, b in zip(hi["loss"][:n], lo["loss"][:n])]
        print(f"=== {second_round} (epochs={args.epochs}) ===")
        print(f"  wall: highest {hi['wall_s']:.0f}s  high {lo['wall_s']:.0f}s "
              f"({hi['wall_s'] / lo['wall_s']:.2f}x)")
        print(f"  final loss: highest {hi['loss'][-1]:.6e}  "
              f"high {lo['loss'][-1]:.6e}")
        print(f"  trajectory rel dev: max {max(rel):.2e} "
              f"@ logged point {rel.index(max(rel))}")
        for k in hi["test"]:
            print(f"  test {k}: highest {hi['test'][k]:.3e}  "
                  f"high {lo['test'][k]:.3e}")


if __name__ == "__main__":
    main()
