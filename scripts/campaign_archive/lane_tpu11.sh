#!/bin/bash
# Pure-TPU lane, part 11 (queued behind lane_tpu10's polish stages):
# coronary #005 through the CHANNEL-SEPARATED split-parameter LM — the
# summed r+dr variant re-stalled at loss 0.0078 because the f32 addition
# quantized the jvp correction at ulp(r_i); with the value and correction
# channels kept separate into the paired accept diff and the normal
# equations, sub-ulp(theta) steps certify at the dr channel's resolution.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"

while kill -0 "$(cat /tmp/lane_tpu10.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

for i in 1 2 3 4 5 6; do
  echo "=== coronary #005 split-LM 150 round $i $(date) ==="
  timeout 10800 python -u examples/Coronary_Flow/coronary_flow_steady.py \
    --resume 'examples/Coronary_Flow/Test_Case_#005' --seed 0 --refine 1 \
    --noise-bnd 0.01 --epochs 150 --second-round lm 2>&1 | tail -2
done
echo "=== lane_tpu11 done $(date) ==="
