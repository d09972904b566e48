#!/bin/bash
# Pure-TPU lane, part 18 (round 2): extend the f64-on-TPU LM polish that
# closed the coronary gap to the remaining pure-TPU rows, so the pure-on-chip
# table meets/beats the f64 reference on every case:
#   - Poiseuille #003 (f32 BFGS floor 5.13e-8/1.47e-8/9.01e-9; reference
#     run #016 = 1.20e-9/8.11e-11/1.90e-11)
#   - Cavity_Steady #005 (9.97e-5/8.61e-5/1.22e-4; reference run #014 =
#     5.01e-5/3.46e-4/6.90e-4 — u is the only component still behind)
# Queues behind lane_tpu17 (coronary endgame) for the single chip.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
export JAX_ENABLE_X64=1

while kill -0 "$(cat /tmp/lane_tpu17.pid 2>/dev/null)" 2>/dev/null; do sleep 120; done

for i in $(seq 1 4); do
  echo "=== poiseuille #003 f64-on-TPU LM round $i $(date) ==="
  timeout 10800 python -u examples/Poiseuille_Flow/poiseuille_flow.py \
    --resume 'examples/Poiseuille_Flow/Test_Case_#003' --seed 0 \
    --epochs 300 --second-round lm \
    > "/tmp/tpu18_poiseuille_r$i.log" 2>&1
  tail -2 "/tmp/tpu18_poiseuille_r$i.log"
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

for i in $(seq 1 4); do
  echo "=== cavity #005 f64-on-TPU LM round $i $(date) ==="
  timeout 10800 python -u examples/Cavity_Steady/cavity_steady.py \
    --resume 'examples/Cavity_Steady/Test_Case_#005' --seed 2 \
    --epochs 300 --second-round lm \
    > "/tmp/tpu18_cavity_r$i.log" 2>&1
  tail -2 "/tmp/tpu18_cavity_r$i.log"
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
echo "=== lane_tpu18 done $(date) ==="
