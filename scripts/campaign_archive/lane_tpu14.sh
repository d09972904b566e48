#!/bin/bash
# Pure-TPU lane, part 14 (queued behind lane_tpu13): continue coronary #005
# split-parameter LM from the committed state (the lane_tpu11 attempt hit
# its timeout mid-round while CPU-starved by the lane8 f64-BFGS lane,
# leaving the dangling-round history hazard; state was git-restored).
# 100 iters per round (not 150) + 4h cap so every round completes and
# saves even when the CPU lane contends the host-side eigh work.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"

while kill -0 "$(cat /tmp/lane_tpu13.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

for i in 1 2 3; do
  echo "=== coronary #005 split-LM 100 round $i $(date) ==="
  timeout 14400 python -u examples/Coronary_Flow/coronary_flow_steady.py \
    --resume 'examples/Coronary_Flow/Test_Case_#005' --seed 0 --refine 1 \
    --noise-bnd 0.01 --epochs 100 --second-round lm \
    > "/tmp/tpu14_coronary_r$i.log" 2>&1
  tail -2 "/tmp/tpu14_coronary_r$i.log"
done
echo "=== lane_tpu14 done $(date) ==="
