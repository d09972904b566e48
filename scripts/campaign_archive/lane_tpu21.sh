#!/bin/bash
# Pure-TPU lane, round 3 part 3 (queues behind lane_tpu20): f64-on-TPU
# fast-Gram LM polish of Cavity_Unsteady #003 — the one pure-TPU row
# merely AT the reference (u/v within 1.02x/1.10x of run #011's fits,
# p already 1.7x better).  Target: strictly better on all three.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
export JAX_ENABLE_X64=1

while kill -0 "$(cat /tmp/lane_tpu20.pid 2>/dev/null)" 2>/dev/null; do sleep 120; done

for i in $(seq 1 3); do
  echo "=== cavity_unsteady #003 f64 LM round $i $(date) ==="
  timeout 9000 python -u examples/Cavity_Unsteady/cavity_unsteady.py \
    --resume 'examples/Cavity_Unsteady/Test_Case_#003' --seed 0 \
    --epochs 300 --second-round lm \
    > "/tmp/tpu21_cavun_r$i.log" 2>&1
  tail -2 "/tmp/tpu21_cavun_r$i.log"
  python - <<'PY'
import json
h = json.load(open('examples/Cavity_Unsteady/Test_Case_#003/History_Loss.json'))
lt = {k: v["log"][-1] for k, v in h["losses_test"].items()}
print("   test:", {k: f"{v:.3e}" for k, v in lt.items()})
ok = (lt["u_test"] <= 4.58e-4 and lt["v_test"] <= 3.52e-4
      and lt["p_test"] <= 1.23e-4)
raise SystemExit(0 if ok else 1)
PY
  if [ $? -eq 0 ]; then echo "=== unsteady strictly better than run #011 fits ==="; break; fi
done
echo "=== lane_tpu21 done $(date) ==="
