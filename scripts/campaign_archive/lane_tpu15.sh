#!/bin/bash
# Pure-TPU lane, part 15 (round 2, VERDICT item 2): drive coronary #005
# split-parameter LM to reference class (u/v/p_test <= 6.73e-5/6.47e-5/1.34e-5,
# /root/reference/Examples/Coronary_Flow/Test_Case_#123/History_Loss.json).
#
# New vs lane_tpu14: exact optimizer-state resume (optimize.py
# _consume_resume_state) — each round adopts the previous round's float64
# theta carry + damping from checkpoint.pkl instead of cold-starting from the
# f32-materialized weights, so the sub-ulp lo channel and the adapted mu
# survive the process restart.  Mid-round CheckpointCallback snapshots are
# now self-consistent (params published at every log point), so a timeout
# mid-round loses at most LOG_STRIDE iterations.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"

for i in $(seq 1 12); do
  echo "=== coronary #005 split-LM round $i $(date) ==="
  timeout 13000 python -u examples/Coronary_Flow/coronary_flow_steady.py \
    --resume 'examples/Coronary_Flow/Test_Case_#005' --seed 0 --refine 1 \
    --noise-bnd 0.01 --epochs 300 --second-round lm \
    > "/tmp/tpu15_coronary_r$i.log" 2>&1
  tail -2 "/tmp/tpu15_coronary_r$i.log"
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
echo "=== lane_tpu15 done $(date) ==="
