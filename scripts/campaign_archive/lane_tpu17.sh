#!/bin/bash
# Pure-TPU lane, part 17 (round 2, VERDICT item 2 endgame): drive coronary
# #005 to reference class (u/v/p_test <= 6.73e-5/6.47e-5/1.34e-5, the
# reference run /root/reference/Examples/Coronary_Flow/Test_Case_#123).
#
# Route: f64-on-TPU LM (JAX_ENABLE_X64=1 — XLA software-emulated float64 on
# the v5e chip; no CPU stage, so the row stays pure-on-chip).  lane_tpu16's
# first 150-iter round descended geometrically (~1%/iter on u_test) from the
# f32 forward-eval noise floor; ~300-500 more iterations project to the
# target.  Exact optimizer-state resume (theta64 carry + damping) makes the
# chained rounds equivalent to one long round.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
export JAX_ENABLE_X64=1

for i in $(seq 1 10); do
  echo "=== coronary #005 f64-on-TPU LM round $i $(date) ==="
  timeout 13500 python -u examples/Coronary_Flow/coronary_flow_steady.py \
    --resume 'examples/Coronary_Flow/Test_Case_#005' --seed 0 --refine 1 \
    --noise-bnd 0.01 --epochs 450 --second-round lm \
    > "/tmp/tpu17_coronary_r$i.log" 2>&1
  tail -2 "/tmp/tpu17_coronary_r$i.log"
  python - <<'PY'
import json
h = json.load(open('examples/Coronary_Flow/Test_Case_#005/History_Loss.json'))
lt = {k: v["log"][-1] for k, v in h["losses_test"].items()}
print("   test:", {k: f"{v:.3e}" for k, v in lt.items()})
ok = (lt["u_test"] <= 6.73e-5 and lt["v_test"] <= 6.47e-5
      and lt["p_test"] <= 1.34e-5)
raise SystemExit(0 if ok else 1)
PY
  if [ $? -eq 0 ]; then echo "=== reference class reached ==="; break; fi
done
echo "=== lane_tpu17 done $(date) ==="
