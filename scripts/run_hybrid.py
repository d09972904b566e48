"""Hybrid TPU→CPU-f64 campaign: long float32 Adam on the TPU backend, then a
float64 dense-BFGS polish on the CPU backend.

Rationale (measured, round 2): float32 quasi-Newton stalls once the
achievable per-step decrease falls below eps·|loss| — on the stiff
Poiseuille valley that happens at global loss ~0.56.  First-order Adam is
immune (no f-comparisons) and runs at full TPU throughput; the f64 polish
then recovers reference-class accuracy in a fraction of the epochs.  This is
the explicit hybrid mode suggested in VERDICT.md item 2.

    python scripts/run_hybrid.py --only Poiseuille_Flow,Cavity_Steady

Each case:
  stage A (subprocess, ambient TPU env):
      python example.py --epochs <adam_epochs> --second-round adam
  stage B (subprocess, JAX_PLATFORMS=cpu JAX_ENABLE_X64=1):
      python example.py --resume <folder> --epochs <bfgs_epochs> \
          --second-round jax-bfgs

Writes RESULTS_TPU_HYBRID.md with the final test losses per case.
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = {
    # name -> (example path, adam_epochs, bfgs_epochs)
    "Poiseuille_Flow": ("examples/Poiseuille_Flow/poiseuille_flow.py", 20000, 10000),
    "Colliding_Flow": ("examples/Colliding_Flow/colliding_flow.py", 20000, 10000),
    "Cavity_Steady": ("examples/Cavity_Steady/cavity_steady.py", 20000, 10000),
    "Cavity_Unsteady": ("examples/Cavity_Unsteady/cavity_unsteady.py", 10000, 5000),
    "Coronary_Flow": ("examples/Coronary_Flow/coronary_flow_steady.py", 20000, 30000),
}

REFERENCE = {
    "Poiseuille_Flow": "1.20e-9 / 8.11e-11 / 1.90e-11",
    "Colliding_Flow": "2.05e-7 / 4.02e-7 / 2.25e-4",
    "Cavity_Steady": "5.01e-5 / 3.46e-4 / 6.90e-4",
    "Cavity_Unsteady": "~1e-3 (report)",
    "Coronary_Flow": "6.73e-5 / 6.47e-5 / 1.34e-5",
}


def newest_case_folder(example_path):
    case_dir = os.path.dirname(os.path.join(ROOT, example_path))
    folders = glob.glob(os.path.join(case_dir, "Test_Case_#*"))
    return max(folders, key=os.path.getmtime) if folders else None


def run_case(name, example, adam_epochs, bfgs_epochs, log):
    path = os.path.join(ROOT, example)
    t0 = time.time()

    env_a = dict(os.environ)  # ambient (TPU via axon)
    env_a["PYTHONPATH"] = ROOT + os.pathsep + env_a.get("PYTHONPATH", "")
    cmd_a = [sys.executable, path, "--epochs", str(adam_epochs),
             "--second-round", "adam"]
    print(f"[{name}] stage A (TPU f32 Adam {adam_epochs}): {' '.join(cmd_a)}",
          flush=True)
    subprocess.run(cmd_a, env=env_a, check=True, stdout=log, stderr=log)
    folder = newest_case_folder(example)
    assert folder, "stage A produced no experiment folder"
    t_a = time.time() - t0

    env_b = dict(os.environ)
    env_b["JAX_PLATFORMS"] = "cpu"
    env_b["JAX_ENABLE_X64"] = "1"
    env_b["PYTHONPATH"] = ROOT  # drop the axon sitecustomize
    cmd_b = [sys.executable, path, "--resume", folder,
             "--epochs", str(bfgs_epochs), "--second-round", "jax-bfgs"]
    print(f"[{name}] stage B (CPU f64 BFGS {bfgs_epochs}) resuming {folder}",
          flush=True)
    subprocess.run(cmd_b, env=env_b, check=True, stdout=log, stderr=log)
    t_total = time.time() - t0

    h = json.load(open(os.path.join(folder, "History_Loss.json")))
    finals = {k: v["log"][-1] for k, v in h["losses_test"].items()}
    rounds = h["log_rounds"]["rounds"]
    print(f"[{name}] rounds={rounds} finals={finals} "
          f"({t_a:.0f}s TPU + {t_total - t_a:.0f}s CPU)", flush=True)
    return {
        "folder": folder, "finals": finals, "rounds": rounds,
        "wall_tpu": round(t_a, 1), "wall_cpu": round(t_total - t_a, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default=os.path.join(ROOT, "RESULTS_TPU_HYBRID.md"))
    ap.add_argument("--log", default="/tmp/hybrid_campaign.log")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    rows = []
    with open(args.log, "a") as log:
        for name, (example, adam_e, bfgs_e) in CASES.items():
            if only and name not in only:
                continue
            try:
                res = run_case(name, example, adam_e, bfgs_e, log)
            except Exception as e:
                res = {"error": str(e)}
                print(f"[{name}] FAILED: {e}", flush=True)
            rows.append((name, adam_e, bfgs_e, res))
            write(args.out, rows)
    print("wrote", args.out)


def write(out_path, rows):
    lines = [
        "# RESULTS — hybrid campaign: TPU f32 Adam (long) + CPU f64 dense-BFGS polish",
        "",
        "Stage A runs on the TPU backend (`keras_Adam` rounds, cosine-decayed"
        " lr); stage B resumes the same experiment folder on the CPU f64"
        " backend (`jax_BFGS` round). History_Loss.json carries all rounds.",
        "",
        "| Case | Adam (TPU) | BFGS (CPU f64) | Final test losses (u/v/p) | Reference | TPU wall (s) | CPU wall (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, adam_e, bfgs_e, res in rows:
        if "error" in res:
            lines.append(f"| {name} | {adam_e} | {bfgs_e} | ERROR {res['error']} | | | |")
            continue
        ours = " / ".join(f"{v:.2e}" for v in res["finals"].values())
        lines.append(
            f"| {name} | {adam_e} | {bfgs_e} | {ours} | {REFERENCE.get(name, '')} "
            f"| {res['wall_tpu']} | {res['wall_cpu']} |"
        )
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
