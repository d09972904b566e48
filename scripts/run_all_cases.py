"""Run the full six-case campaign sequentially and record final metrics.

    python scripts/run_all_cases.py --epochs-scale 1.0 --second-round jax

Writes RESULTS.md at the repo root with the final test losses per case next
to the reference's published numbers (BASELINE.md).  Cases save their
artifacts under examples/<Case>/Test_Case_#NNN as usual.
"""

import argparse
import importlib.util
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CASES = [
    # (name, module path, epochs at scale 1.0, reference final test losses)
    ("Poisson", "examples/Poisson_Problem/poisson.py", 10000,
     {"fit": "~1e-7 (report, 10k ep)"}),
    ("Poisson_misto", "examples/Poisson_Problem/poisson_misto.py", 7500,
     {"fit": "~1e-7 (report)"}),
    ("Poiseuille_Flow", "examples/Poiseuille_Flow/poiseuille_flow.py", 10000,
     {"u_test": 1.20e-9, "v_test": 8.11e-11, "p_test": 1.90e-11}),
    ("Colliding_Flow", "examples/Colliding_Flow/colliding_flow.py", 10000,
     {"u_test": 2.05e-7, "v_test": 4.02e-7, "p_test": 2.25e-4}),
    ("Cavity_Steady", "examples/Cavity_Steady/cavity_steady.py", 10000,
     {"u_test": 5.01e-5, "v_test": 3.46e-4, "p_test": 6.90e-4}),
    ("Cavity_Unsteady", "examples/Cavity_Unsteady/cavity_unsteady.py", 5000,
     {"u_test": "~1e-3 (report)", "v_test": "", "p_test": ""}),
    ("Coronary_Flow", "examples/Coronary_Flow/coronary_flow_steady.py", 30000,
     {"u_test": 6.73e-5, "v_test": 6.47e-5, "p_test": 1.34e-5}),
]


def load_module(path):
    name = os.path.splitext(os.path.basename(path))[0]
    spec = importlib.util.spec_from_file_location(name, os.path.join(ROOT, path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_case(name, path, epochs, second_round):
    print(f"\n===== {name} ({epochs} epochs, second round {second_round}) =====",
          flush=True)
    mod = load_module(path)
    t0 = time.time()
    result = mod.main(epochs=epochs, second_round=second_round)
    wall = time.time() - t0
    if isinstance(result, tuple):
        pb = result[0]
    else:
        pb = result.pb
    finals = {k: v["log"][-1] for k, v in pb.history.losses_test.items()}
    print(f"{name}: {wall:.0f}s, finals {finals}", flush=True)
    return {"wall_seconds": round(wall, 1), "final_test_losses": finals,
            "loss_global": pb.history.loss_global[-1]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs-scale", type=float, default=1.0)
    ap.add_argument("--second-round", default="jax", choices=["jax", "jax-bfgs", "scipy"])
    ap.add_argument("--only", default=None,
                    help="comma-separated case names to run")
    ap.add_argument("--out", default=os.path.join(ROOT, "RESULTS.md"))
    args = ap.parse_args()

    only = set(args.only.split(",")) if args.only else None
    rows = []
    for name, path, epochs, ref in CASES:
        if only and name not in only:
            continue
        try:
            res = run_case(name, path, int(epochs * args.epochs_scale),
                           args.second_round)
        except Exception as e:
            import traceback

            traceback.print_exc()
            res = {"error": str(e)}
        rows.append((name, epochs, ref, res))
        _write(args.out, rows, args)
    print("\nwrote", args.out)


def _write(out_path, rows, args):
    import jax

    lines = [
        "# RESULTS — tpinn six-case campaign",
        "",
        f"Backend: `{jax.default_backend()}` · second round: "
        f"`{args.second_round}` · epochs scale: {args.epochs_scale}",
        "",
        "| Case | Epochs | Final test losses (u/v/p) | Reference (BASELINE.md) | Wall (s) |",
        "|---|---|---|---|---|",
    ]
    for name, epochs, ref, res in rows:
        if "error" in res:
            lines.append(f"| {name} | {epochs} | ERROR: {res['error']} | | |")
            continue
        f = res["final_test_losses"]
        ours = " / ".join(f"{v:.2e}" for v in f.values())
        refs = " / ".join(str(v) for v in ref.values())
        lines.append(
            f"| {name} | {int(epochs * args.epochs_scale)} | {ours} | {refs} "
            f"| {res['wall_seconds']} |"
        )
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
