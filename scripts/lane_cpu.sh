#!/bin/bash
# CPU-f64 polish lane (sequential, single core): longest-lever resumes first.
cd /root/repo
export JAX_PLATFORMS=cpu JAX_ENABLE_X64=1

echo "=== coronary resume 60k $(date) ==="
timeout 10000 python examples/Coronary_Flow/coronary_flow_steady.py \
  --resume 'examples/Coronary_Flow/Test_Case_#001' \
  --epochs 60000 --second-round jax-bfgs 2>&1 | tail -5

echo "=== cavity #001 resume 20k $(date) ==="
timeout 5400 python examples/Cavity_Steady/cavity_steady.py \
  --resume 'examples/Cavity_Steady/Test_Case_#001' \
  --epochs 20000 --second-round jax-bfgs 2>&1 | tail -5

echo "=== poisson misto fresh 30k $(date) ==="
timeout 5400 python examples/Poisson_Problem/poisson_misto.py \
  --epochs 30000 --second-round jax-bfgs 2>&1 | tail -5

echo "=== lane_cpu done $(date) ==="
