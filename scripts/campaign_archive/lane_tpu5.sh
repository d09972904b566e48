#!/bin/bash
# Pure-TPU lane, part 5: push the coronary pure-TPU run (Test_Case_#005)
# through successive on-device f32 BFGS rounds.  The CPU refine-1 campaign
# (#004) needed >100k epochs; each 30k-epoch TPU round costs ~20 min, so
# four rounds here give the pure-TPU row a comparable budget.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"

for i in 1 2 3 4; do
  echo "=== coronary #005 (pure-TPU) BFGS 30k round $i $(date) ==="
  timeout 7200 python -u examples/Coronary_Flow/coronary_flow_steady.py \
    --resume 'examples/Coronary_Flow/Test_Case_#005' --epochs 30000 \
    --second-round jax-bfgs --seed 0 --refine 1 --noise-bnd 0.01 2>&1 | tail -2
done
echo "=== lane_tpu5 done $(date) ==="
