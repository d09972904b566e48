#!/bin/bash
# Pure-TPU lane, round 3: finish the f64-on-TPU LM sweep with the per-point
# Gram (4.8 s/iter vs round 2's 26 s/iter) so the pure-on-chip table
# meets/beats the f64 reference on every case (VERDICT r2 item 1):
#   - Poiseuille #003: target <= 1.20e-9 / 8.11e-11 / 1.90e-11  (ref #016)
#   - Cavity_Steady #005: target u_test <= 5.01e-5               (ref #014)
#   - Poisson_misto: pure-TPU sup-norm <= 0.002                  (Report A.2)
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
export JAX_ENABLE_X64=1

for i in $(seq 1 6); do
  echo "=== poiseuille #003 f64-on-TPU LM round $i $(date) ==="
  timeout 5400 python -u examples/Poiseuille_Flow/poiseuille_flow.py \
    --resume 'examples/Poiseuille_Flow/Test_Case_#003' --seed 0 \
    --epochs 300 --second-round lm \
    > "/tmp/tpu19_poiseuille_r$i.log" 2>&1
  tail -2 "/tmp/tpu19_poiseuille_r$i.log"
  python - <<'PY'
import json
h = json.load(open('examples/Poiseuille_Flow/Test_Case_#003/History_Loss.json'))
lt = {k: v["log"][-1] for k, v in h["losses_test"].items()}
print("   test:", {k: f"{v:.3e}" for k, v in lt.items()})
ok = (lt["u_test"] <= 1.20e-9 and lt["v_test"] <= 8.11e-11
      and lt["p_test"] <= 1.90e-11)
raise SystemExit(0 if ok else 1)
PY
  if [ $? -eq 0 ]; then echo "=== poiseuille reference class reached ==="; break; fi
done

for i in $(seq 1 6); do
  echo "=== cavity #005 f64-on-TPU LM round $i $(date) ==="
  timeout 5400 python -u examples/Cavity_Steady/cavity_steady.py \
    --resume 'examples/Cavity_Steady/Test_Case_#005' --seed 2 \
    --epochs 300 --second-round lm \
    > "/tmp/tpu19_cavity_r$i.log" 2>&1
  tail -2 "/tmp/tpu19_cavity_r$i.log"
  python - <<'PY'
import json
h = json.load(open('examples/Cavity_Steady/Test_Case_#005/History_Loss.json'))
lt = {k: v["log"][-1] for k, v in h["losses_test"].items()}
print("   test:", {k: f"{v:.3e}" for k, v in lt.items()})
ok = (lt["u_test"] <= 5.01e-5 and lt["v_test"] <= 3.46e-4
      and lt["p_test"] <= 6.90e-4)
raise SystemExit(0 if ok else 1)
PY
  if [ $? -eq 0 ]; then echo "=== cavity reference class reached ==="; break; fi
done

echo "=== poisson_misto pure-TPU f64 LM sup-norm run $(date) ==="
timeout 5400 python - <<'PY' > /tmp/tpu19_misto.log 2>&1
import importlib.util, os, sys
import numpy as np
spec = importlib.util.spec_from_file_location(
    "poisson_misto", "examples/Poisson_Problem/poisson_misto.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
pb, model = mod.main(epochs=300, save_plots=False, second_round="lm")
from tpinn.oracles import analytic
import jax.numpy as jnp
W = 2 * np.pi
g = np.linspace(0.0, W, 100)
gx, gy = np.meshgrid(g, g)
pts = jnp.asarray(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
u = np.asarray(model(pts))[:, 0]
u_ex = np.asarray(analytic.poisson_exact(pts))
sup = float(np.max(np.abs(u - u_ex)))
print(f"poisson_misto pure-TPU f64 LM: sup-norm {sup:.5f} "
      f"(target <= 0.002), test MSE "
      f"{pb.history.losses_test['fit']['log'][-1]:.3e}")
PY
tail -2 /tmp/tpu19_misto.log
echo "=== lane_tpu19 done $(date) ==="
