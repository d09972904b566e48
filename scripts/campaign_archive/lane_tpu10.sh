#!/bin/bash
# Pure-TPU lane, part 10: paired-accept LM broke the coronary #005 f32
# floor (0.016381 bit-identical stall -> 0.0098 and descending within one
# 150-iter round).  Ride it: four more LM rounds, then the small-case
# paired-BFGS polish originally queued as lane_tpu9.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"

for i in 1 2 3 4; do
  echo "=== coronary #005 paired-LM 150 round $i $(date) ==="
  timeout 10800 python -u examples/Coronary_Flow/coronary_flow_steady.py \
    --resume 'examples/Coronary_Flow/Test_Case_#005' --seed 0 --refine 1 \
    --noise-bnd 0.01 --epochs 150 --second-round lm 2>&1 | tail -2
done

echo "=== poiseuille #003 paired-BFGS 5k $(date) ==="
timeout 3600 python -u examples/Poiseuille_Flow/poiseuille_flow.py \
  --resume 'examples/Poiseuille_Flow/Test_Case_#003' --seed 0 \
  --epochs 5000 --second-round jax-bfgs 2>&1 | tail -2

echo "=== cavity steady #005 paired-BFGS 5k $(date) ==="
timeout 5400 python -u examples/Cavity_Steady/cavity_steady.py \
  --resume 'examples/Cavity_Steady/Test_Case_#005' --seed 2 \
  --epochs 5000 --second-round jax-bfgs 2>&1 | tail -2

echo "=== colliding #002 paired-BFGS 5k $(date) ==="
timeout 5400 python -u examples/Colliding_Flow/colliding_flow.py \
  --resume 'examples/Colliding_Flow/Test_Case_#002' --seed 0 \
  --epochs 5000 --second-round jax-bfgs 2>&1 | tail -2

echo "=== lane_tpu10 done $(date) ==="
