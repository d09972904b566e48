#!/bin/bash
# Pure-TPU lane, part 6: coronary #005 via Levenberg-Marquardt rounds.
# The on-device f32 BFGS stalled at u/v/p 5.4e-3/2.2e-3/3.8e-3 (two
# successive 30k-epoch rounds returned bit-identical test losses); LM's
# least-squares structure is what broke the identical stall on Poisson
# (RESULTS.md pure-TPU rows), so push #005 through LM rounds instead.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"

for i in 1 2 3; do
  echo "=== coronary #005 (pure-TPU) LM 150 round $i $(date) ==="
  timeout 10800 python -u examples/Coronary_Flow/coronary_flow_steady.py \
    --resume 'examples/Coronary_Flow/Test_Case_#005' --epochs 150 \
    --second-round lm --seed 0 --refine 1 --noise-bnd 0.01 2>&1 | tail -3
done
echo "=== lane_tpu6 done $(date) ==="
