#!/bin/bash
# Pure-TPU lane, part 13: re-polish the three small cases through the
# SPLIT-CARRY dense BFGS (committed after the lane_tpu10 re-polish, which
# reproduced every pure-TPU floor bit-identically — the binding wall was
# the f32 parameter grid theta+delta==theta).  The split carry walks the
# parameter pair (hi,lo) with error-free TwoSum accumulation and certifies
# on the channel-separated paired diff, so sub-ulp(theta) steps make
# certified progress entirely on device.  Host-light: overlaps the CPU-f64
# coronary lane.  Full per-round logs under /tmp/tpu13_<case>.log.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"

echo "=== poiseuille #003 split-BFGS 5000 $(date) ==="
timeout 7200 python -u examples/Poiseuille_Flow/poiseuille_flow.py \
  --resume 'examples/Poiseuille_Flow/Test_Case_#003' --seed 0 \
  --epochs 5000 --second-round jax-bfgs > /tmp/tpu13_poiseuille.log 2>&1
tail -2 /tmp/tpu13_poiseuille.log

echo "=== colliding #002 split-BFGS 5000 $(date) ==="
timeout 7200 python -u examples/Colliding_Flow/colliding_flow.py \
  --resume 'examples/Colliding_Flow/Test_Case_#002' --seed 0 \
  --epochs 5000 --second-round jax-bfgs > /tmp/tpu13_colliding.log 2>&1
tail -2 /tmp/tpu13_colliding.log

echo "=== cavity steady #005 split-BFGS 5000 $(date) ==="
timeout 7200 python -u examples/Cavity_Steady/cavity_steady.py \
  --resume 'examples/Cavity_Steady/Test_Case_#005' --seed 2 \
  --epochs 5000 --second-round jax-bfgs > /tmp/tpu13_cavity.log 2>&1
tail -2 /tmp/tpu13_cavity.log

echo "=== lane_tpu13 done $(date) ==="
