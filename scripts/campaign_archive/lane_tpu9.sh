#!/bin/bash
# Pure-TPU lane, part 9 (queued behind lane_tpu8): re-polish the small
# cases with the paired-residual BFGS line search.  Their previous pure-TPU
# rows (RESULTS.md) were set by the eps*|loss| certification floor that the
# paired Delta-phi evaluation removes — each gets a short resume round to
# measure how much further f32 descends now.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"

# wait for lane_tpu8 to release the chip
while kill -0 "$(cat /tmp/lane_tpu8.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

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

echo "=== lane_tpu9 done $(date) ==="
