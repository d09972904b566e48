#!/bin/bash
# Pure-TPU lane, part 8: coronary #005 long paired-residual BFGS campaign.
# The paired-residual line search (Δφ = Σ(r1−r0)(r1+r0)) broke the f32
# certification stall: the 20k retry round dropped test losses to
# 5.6e-3/2.2e-3/3.0e-3 (from 1.7e-2/3.6e-3/1.8e-2) in 19 min.  Keep
# descending: two 60k BFGS rounds with an LM round between them.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"

run() {
  timeout 14400 python -u examples/Coronary_Flow/coronary_flow_steady.py \
    --resume 'examples/Coronary_Flow/Test_Case_#005' --seed 0 --refine 1 \
    --noise-bnd 0.01 "$@" 2>&1 | tail -2
}

echo "=== coronary #005 paired-BFGS 60k $(date) ==="
run --epochs 60000 --second-round jax-bfgs
echo "=== coronary #005 LM 150 $(date) ==="
run --epochs 150 --second-round lm
echo "=== coronary #005 paired-BFGS 60k (2) $(date) ==="
run --epochs 60000 --second-round jax-bfgs
echo "=== lane_tpu8 done $(date) ==="
