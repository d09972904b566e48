#!/bin/bash
# Pure-TPU lane, round 3 part 2 (queues behind lane_tpu19): push the
# already-winning rows further with the per-point-Gram f64 LM (~5 s/iter):
#   - Coronary #005: currently 3.48e-5/4.30e-5/1.07e-5 (beats ref); keep
#     polishing — geometric convergence showed no floor in round 2.
#   - Poisson (Dirichlet): pure-TPU f32 row is 2.49e-7 test MSE (report
#     ~1e-7); one f64 LM run should go far below reference class.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
export JAX_ENABLE_X64=1

while kill -0 "$(cat /tmp/lane_tpu19.pid 2>/dev/null)" 2>/dev/null; do sleep 120; done

for i in $(seq 1 2); do
  echo "=== coronary #005 f64 fast-Gram LM round $i $(date) ==="
  timeout 7200 python -u examples/Coronary_Flow/coronary_flow_steady.py \
    --resume 'examples/Coronary_Flow/Test_Case_#005' --seed 0 \
    --epochs 450 --second-round lm --refine 1 --noise-bnd 0.01 \
    > "/tmp/tpu20_coronary_r$i.log" 2>&1
  tail -2 "/tmp/tpu20_coronary_r$i.log"
  python - <<'PY'
import json
h = json.load(open('examples/Coronary_Flow/Test_Case_#005/History_Loss.json'))
lt = {k: v["log"][-1] for k, v in h["losses_test"].items()}
print("   test:", {k: f"{v:.3e}" for k, v in lt.items()})
ok = (lt["u_test"] <= 1e-5 and lt["v_test"] <= 1e-5 and lt["p_test"] <= 5e-6)
raise SystemExit(0 if ok else 1)
PY
  if [ $? -eq 0 ]; then echo "=== coronary 10x-beyond-reference reached ==="; break; fi
done

echo "=== poisson (Dirichlet) pure-TPU f64 LM $(date) ==="
timeout 5400 python -u examples/Poisson_Problem/poisson.py \
  --epochs 300 --second-round lm --no-plots \
  > /tmp/tpu20_poisson.log 2>&1
tail -2 /tmp/tpu20_poisson.log
echo "=== lane_tpu20 done $(date) ==="
