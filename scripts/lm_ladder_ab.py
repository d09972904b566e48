"""A/B the on-device LM damping ladder vs the host eigh loop (round-5 item 7).

Config: the VERDICT-named Poiseuille #003 polish — resume the committed
Test_Case_#003 (copied to a temp dir; the committed artifact is never
touched) and run a 20-iter f64-on-TPU LM round, once per solver
(TPINN_LM_SOLVER=host | device), twice each: run 1 pays the Mosaic/XLA
compiles (amortized across runs by the persistent compilation cache),
run 2 is the warm steady-state number.  Reports the round wall clock from
History_Loss.json (the same bookkeeping RESULTS_TPU.md's 4.8 s/iter host
figure used) and the final test losses so solver agreement is visible.

Run under the ambient TPU env:  python scripts/lm_ladder_ab.py
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "examples", "Poiseuille_Flow", "Test_Case_#003")
SCRIPT = os.path.join(ROOT, "examples", "Poiseuille_Flow",
                      "poiseuille_flow.py")
ITERS = 20


def main():
    results = {}
    for solver in ("host", "device"):
        work = tempfile.mkdtemp(prefix=f"lm_ab_{solver}_")
        dst = os.path.join(work, "Test_Case_#003")
        shutil.copytree(SRC, dst)
        env = {**os.environ, "JAX_ENABLE_X64": "1",
               "TPINN_LM_SOLVER": solver,
               "PYTHONPATH": ROOT + os.pathsep
               + os.environ.get("PYTHONPATH", "")}
        for rep in (1, 2):
            r = subprocess.run(
                [sys.executable, "-u", SCRIPT, "--resume", dst,
                 "--seed", "0", "--epochs", str(ITERS),
                 "--second-round", "lm"],
                env=env, cwd=ROOT, capture_output=True, text=True)
            if r.returncode != 0:
                print(r.stdout[-2000:])
                print(r.stderr[-2000:])
                raise SystemExit(f"{solver} rep {rep} failed")
            with open(os.path.join(dst, "History_Loss.json")) as f:
                h = json.load(f)
            wall = h["log_rounds"]["wall_time_seconds"][-1]
            test = {k: v["log"][-1]
                    for k, v in h.get("losses_test", {}).items()}
            key = f"{solver}_run{rep}"
            results[key] = {"wall_s": wall, "s_per_iter": wall / ITERS,
                            "test": test}
            print(f"{key}: wall {wall:.1f}s = {wall/ITERS:.2f} s/iter, "
                  f"test {{"
                  + ", ".join(f"{k}: {v:.3e}" for k, v in test.items())
                  + "}}", flush=True)
    warm_host = results["host_run2"]["s_per_iter"]
    warm_dev = results["device_run2"]["s_per_iter"]
    print(json.dumps({
        "config": "Poiseuille #003 resume, 20-iter f64-on-TPU LM",
        "host_warm_s_per_iter": round(warm_host, 3),
        "device_warm_s_per_iter": round(warm_dev, 3),
        "speedup": round(warm_host / warm_dev, 3),
        "all": results,
    }))


if __name__ == "__main__":
    main()
