#!/bin/bash
# TPU lane (sequential): fresh Cavity_Steady seeds, stage-A f32 Adam on TPU.
# Each run lands in a new Test_Case_#NNN; the best gets a CPU-f64 BFGS polish
# afterwards (scripts/lane_cpu.sh picks them up by folder name).
cd /root/repo
for seed in 1 2; do
  echo "=== cavity seed $seed stage A $(date) ==="
  timeout 1800 python examples/Cavity_Steady/cavity_steady.py \
    --epochs 20000 --second-round adam --seed "$seed" 2>&1 | tail -5
done
echo "=== lane_tpu done $(date) ==="
