"""Reproduce the pure-TPU beats-reference table with ONE command per case.

Round-5 VERDICT item 2: the RESULTS_TPU.md headline rows were produced by
30+ one-shot lane scripts whose recipes (seeds, round chaining, physics
weights, f64-on-TPU LM) lived only in campaign history.  This script IS the
committed manifest: per case it encodes the distilled winning recipe as a
sequence of stages (fresh f32 Adam round -> on-device BFGS -> chained
fast-Gram f64-on-TPU LM rounds, with per-case twists), runs them
end-to-end from scratch, checks the reference-row targets after every LM
round, and early-stops once the row class is reached.

    python scripts/run_pure_tpu.py --case poiseuille
    python scripts/run_pure_tpu.py --case all            # everything
    python scripts/run_pure_tpu.py --list                # show recipes

Logs are written to docs/pure_tpu_runs/<case>/ (commit them: the RESULTS
tables cite these, never /tmp).  Each case trains into a FRESH
Test_Case_#NNN folder (auto-numbered next free slot) so the committed
artifacts are never touched; the final artifact folder is printed and can
be diffed against the committed one.

Reference rows being beaten (BASELINE.md):
  poiseuille      ref #016: u/v/p_test 1.20e-9 / 8.11e-11 / 1.90e-11
  cavity_steady   ref #014: 5.01e-5 / 3.46e-4 / 6.90e-4
  colliding       ref #003: 2.05e-7 / 4.02e-7 / 2.25e-4
  cavity_unsteady ref #011 fit: 4.58e-4 / 3.52e-4 / 1.23e-4
  coronary        ref #123: 6.73e-5 / 6.47e-5 / 1.34e-5
  poisson         Report.pdf App. A.1: test MSE ~1e-7
  poisson_misto   Report.pdf App. A.2: test MSE ~1e-7, sup-norm 0.002
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG_DIR = os.path.join(ROOT, "docs", "pure_tpu_runs")

X64 = {"JAX_ENABLE_X64": "1"}  # f64-on-TPU (XLA software emulation)


def _stage(args, env=None, repeat=1, tag=None):
    return {"args": args, "env": env or {}, "repeat": repeat,
            "tag": tag or ("lm" if "lm" in args else "stage")}


# The manifest: each case is a list of stages run in order.  A stage with
# repeat > 1 is re-run (always resuming the SAME folder — exact
# optimizer-state resume makes chained rounds equivalent to one long round)
# until the case targets are met or the repeat budget is exhausted.
# {folder} is substituted with the fresh Test_Case folder after stage 1.
MANIFEST = {
    "poiseuille": {
        "script": "examples/Poiseuille_Flow/poiseuille_flow.py",
        "artifact_dir": "examples/Poiseuille_Flow",
        "stages": [
            _stage(["--seed", "0", "--epochs", "50000",
                    "--second-round", "adam"], tag="adam"),
            _stage(["--resume", "{folder}", "--seed", "0", "--epochs",
                    "5000", "--second-round", "jax-bfgs"], tag="bfgs"),
            _stage(["--resume", "{folder}", "--seed", "0", "--epochs",
                    "300", "--second-round", "lm"], env=X64, repeat=4),
        ],
        "targets": {"u_test": 1.20e-9, "v_test": 8.11e-11,
                    "p_test": 1.90e-11},
        "committed": "Test_Case_#003",
    },
    "cavity_steady": {
        "script": "examples/Cavity_Steady/cavity_steady.py",
        "artifact_dir": "examples/Cavity_Steady",
        "stages": [
            _stage(["--seed", "2", "--epochs", "20000",
                    "--second-round", "adam"], tag="adam"),
            _stage(["--resume", "{folder}", "--seed", "2", "--epochs",
                    "5000", "--second-round", "jax-bfgs"], tag="bfgs"),
            _stage(["--resume", "{folder}", "--seed", "2", "--epochs",
                    "300", "--second-round", "lm"], env=X64, repeat=4),
        ],
        "targets": {"u_test": 5.01e-5, "v_test": 3.46e-4, "p_test": 6.90e-4},
        "committed": "Test_Case_#005",
    },
    "colliding": {
        "script": "examples/Colliding_Flow/colliding_flow.py",
        "artifact_dir": "examples/Colliding_Flow",
        "stages": [
            _stage(["--seed", "0", "--epochs", "20000",
                    "--second-round", "adam"], tag="adam"),
            _stage(["--resume", "{folder}", "--seed", "0", "--epochs",
                    "5000", "--second-round", "jax-bfgs"], tag="bfgs"),
            _stage(["--resume", "{folder}", "--seed", "0", "--epochs",
                    "300", "--second-round", "lm"], env=X64, repeat=3),
        ],
        "targets": {"u_test": 2.05e-7, "v_test": 4.02e-7, "p_test": 2.25e-4},
        "committed": "Test_Case_#002",
    },
    "cavity_unsteady": {
        "script": "examples/Cavity_Unsteady/cavity_unsteady.py",
        "artifact_dir": "examples/Cavity_Unsteady",
        "stages": [
            _stage(["--seed", "0", "--epochs", "10000",
                    "--second-round", "adam"], tag="adam"),
            _stage(["--resume", "{folder}", "--seed", "0", "--epochs",
                    "5000", "--second-round", "jax-bfgs"], tag="bfgs"),
            # the round-4 twist: plain LM overfits the 5% fit/BC noise;
            # boosting the PDE weights (mass 1e2, momentum 1e1) makes the
            # noise-free physics dominate the least-squares system
            # (scripts/cavun_polish_scan.py, commit 549f370)
            _stage(["--resume", "{folder}", "--seed", "0", "--epochs",
                    "250", "--second-round", "lm",
                    "--pde-weights", "1e2,1e1,1e1"], env=X64, repeat=3),
        ],
        "targets": {"u_test": 4.58e-4, "v_test": 3.52e-4, "p_test": 1.23e-4},
        "committed": "Test_Case_#003",
    },
    "coronary": {
        "script": "examples/Coronary_Flow/coronary_flow_steady.py",
        "artifact_dir": "examples/Coronary_Flow",
        "extra": ["--refine", "1", "--noise-bnd", "0.01"],
        "stages": [
            _stage(["--seed", "0", "--epochs", "40000",
                    "--second-round", "adam"], tag="adam"),
            _stage(["--resume", "{folder}", "--seed", "0", "--epochs",
                    "20000", "--second-round", "jax-bfgs"], tag="bfgs",
                   repeat=2),
            _stage(["--resume", "{folder}", "--seed", "0", "--epochs",
                    "450", "--second-round", "lm"], env=X64, repeat=10),
        ],
        "targets": {"u_test": 6.73e-5, "v_test": 6.47e-5, "p_test": 1.34e-5},
        "committed": "Test_Case_#005",
        "note": "longest case: the committed run took ~10 h of chained "
                "f64-on-TPU LM rounds (each ~35 min); budget accordingly",
    },
    "poisson": {
        "script": "examples/Poisson_Problem/poisson.py",
        "history": "examples/Poisson_Problem/Images/"
                   "Poisson_history_loss.json",
        "stages": [
            _stage(["--epochs", "300", "--second-round", "lm",
                    "--no-plots"], env=X64, tag="lm"),
        ],
        "targets": {"fit": 1e-7},
        "committed": "Images/Poisson_history_loss.json",
    },
    "poisson_misto": {
        "script": "examples/Poisson_Problem/poisson_misto.py",
        "history": "examples/Poisson_Problem/Images/"
                   "Poisson_misto_history_loss.json",
        "stages": [
            # round-5 recipe: one LONG fast-Gram f64 LM round.  The training
            # losses converge to 1e-10..1e-12 within ~300 iters; the test MSE
            # is then generalization-limited and descends at a steady
            # ~0.12%/iter (measured: 900 iters -> 1.07e-7, still on-slope), so
            # the <=5e-8 target needs ~3000 iters (2000 measured 5.92e-8).  Runs on the on-device
            # damping ladder (TPINN_LM_SOLVER auto).
            _stage(["--epochs", "3000", "--second-round", "lm",
                    "--no-plots"], env=X64, tag="lm"),
        ],
        "targets": {"fit": 5e-8},
        "committed": "Images/Poisson_misto_history_loss.json",
    },
}


def _existing_cases(artifact_dir):
    pat = re.compile(r"Test_Case_#(\d+)$")
    return {
        d for d in os.listdir(os.path.join(ROOT, artifact_dir))
        if pat.search(d)
    }


def _final_test_losses(history_path):
    with open(history_path) as f:
        h = json.load(f)
    return {k: v["log"][-1] for k, v in h.get("losses_test", {}).items()}


def _targets_met(losses, targets):
    try:
        return all(losses[k] <= v for k, v in targets.items())
    except KeyError:
        return False


def run_case(name, spec, dry=False):
    print(f"=== {name}: {len(spec['stages'])} stages, targets "
          + ", ".join(f"{k}<={v:.3g}" for k, v in spec["targets"].items()))
    if spec.get("note"):
        print(f"    note: {spec['note']}")
    case_log_dir = os.path.join(LOG_DIR, name)
    os.makedirs(case_log_dir, exist_ok=True)
    folder = None
    history = spec.get("history")
    t_case = time.time()
    for si, stage in enumerate(spec["stages"], 1):
        for rep in range(1, stage["repeat"] + 1):
            args = [
                a.format(folder=folder) if "{folder}" in a else a
                for a in stage["args"]
            ] + spec.get("extra", [])
            env = {**os.environ, **stage["env"],
                   "PYTHONPATH": ROOT + os.pathsep
                   + os.environ.get("PYTHONPATH", "")}
            cmd = [sys.executable, "-u",
                   os.path.join(ROOT, spec["script"])] + args
            tag = f"stage{si}_{stage['tag']}" + (
                f"_r{rep}" if stage["repeat"] > 1 else "")
            log = os.path.join(case_log_dir, tag + ".log")
            print(f"--- {name} {tag}: {' '.join(args)}")
            if dry:
                continue
            before = (_existing_cases(spec["artifact_dir"])
                      if folder is None and "artifact_dir" in spec else None)
            t0 = time.time()
            with open(log, "w") as lf:
                lf.write(f"# {' '.join(cmd)}\n# env: {stage['env']}\n")
                lf.flush()
                r = subprocess.run(cmd, stdout=lf, stderr=subprocess.STDOUT,
                                   env=env, cwd=ROOT)
            dt = time.time() - t0
            if r.returncode != 0:
                print(f"    FAILED (exit {r.returncode}, {dt:.0f}s) — "
                      f"see {os.path.relpath(log, ROOT)}")
                return False
            if before is not None:
                new = _existing_cases(spec["artifact_dir"]) - before
                if new:
                    folder = os.path.join(ROOT, spec["artifact_dir"],
                                          sorted(new)[-1])
                    history = os.path.join(folder, "History_Loss.json")
                    print(f"    -> fresh artifact {os.path.relpath(folder, ROOT)}")
            losses = _final_test_losses(history) if history else {}
            shown = {k: f"{v:.3e}" for k, v in losses.items()
                     if k in spec["targets"]}
            print(f"    done in {dt:.0f}s; test {shown}")
            if _targets_met(losses, spec["targets"]):
                print(f"=== {name}: TARGETS MET in {time.time()-t_case:.0f}s "
                      f"(stage {si}, round {rep}) ===")
                return True
    met = _targets_met(_final_test_losses(history) if history else {},
                       spec["targets"])
    status = "TARGETS MET" if met else "targets NOT met"
    print(f"=== {name}: {status} after all stages "
          f"({time.time()-t_case:.0f}s) ===")
    return met


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default=None,
                    help="case name or 'all' (see --list)")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--dry-run", action="store_true",
                    help="print the stage commands without running")
    args = ap.parse_args()
    if args.list or not args.case:
        for name, spec in MANIFEST.items():
            tgt = ", ".join(f"{k}<={v:.3g}"
                            for k, v in spec["targets"].items())
            print(f"{name:<16} {spec['script']}")
            print(f"{'':<16} targets: {tgt}")
            for st in spec["stages"]:
                rep = f" x{st['repeat']}" if st["repeat"] > 1 else ""
                env = " ".join(f"{k}={v}" for k, v in st["env"].items())
                print(f"{'':<16}   {env} {' '.join(st['args'])}{rep}")
        return
    names = list(MANIFEST) if args.case == "all" else [args.case]
    results = {}
    for name in names:
        if name not in MANIFEST:
            raise SystemExit(f"unknown case {name!r}; use --list")
        results[name] = run_case(name, MANIFEST[name], dry=args.dry_run)
    if not args.dry_run:
        print(json.dumps({"targets_met": results}))


if __name__ == "__main__":
    main()
