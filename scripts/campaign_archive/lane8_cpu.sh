#!/bin/bash
# CPU-f64 lane, part 6: coronary #004 (refine-1, 0.01 boundary noise) in
# 15k-epoch chunks — the 30k/40k chunks kept hitting their timeout BEFORE
# the end-of-round save, losing the tail of every round to crash recovery.
# 15k at the measured ~230 s/1k (contended by the TPU lane's host work)
# fits comfortably in the 7000 s budget including artifact writes.
cd /root/repo
export JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 PYTHONPATH=/root/repo

for i in 1 2 3 4 5 6; do
  echo "=== coronary #004 paired-BFGS 15k chunk $i $(date) ==="
  timeout 7000 python -u examples/Coronary_Flow/coronary_flow_steady.py \
    --resume 'examples/Coronary_Flow/Test_Case_#004' --seed 0 --refine 1 \
    --noise-bnd 0.01 --epochs 15000 --second-round jax-bfgs 2>&1 | tail -2
done
echo "=== lane8_cpu done $(date) ==="
