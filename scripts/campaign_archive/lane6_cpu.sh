#!/bin/bash
# CPU-f64 lane, round 3 part 4: finish the lane5 steps that died with the
# session (cavity unsteady #002 polish, coronary #004 refine-1 campaign).
# Sequential on the single CPU core; the TPU lane runs concurrently.
cd /root/repo
export JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 PYTHONPATH=/root/repo

echo "=== cavity unsteady #002 (seed1) resume BFGS 5k $(date) ==="
timeout 7200 python examples/Cavity_Unsteady/cavity_unsteady.py \
  --resume 'examples/Cavity_Unsteady/Test_Case_#002' --seed 1 \
  --epochs 5000 --second-round jax-bfgs 2>&1 | tail -3

echo "=== coronary #004 (refine1) resume BFGS 40k $(date) ==="
timeout 7200 python examples/Coronary_Flow/coronary_flow_steady.py \
  --resume 'examples/Coronary_Flow/Test_Case_#004' --seed 0 \
  --refine 1 --noise-bnd 0.01 \
  --epochs 40000 --second-round jax-bfgs 2>&1 | tail -3

echo "=== coronary #004 (refine1) resume BFGS 40k (2) $(date) ==="
timeout 7200 python examples/Coronary_Flow/coronary_flow_steady.py \
  --resume 'examples/Coronary_Flow/Test_Case_#004' --seed 0 \
  --refine 1 --noise-bnd 0.01 \
  --epochs 40000 --second-round jax-bfgs 2>&1 | tail -3

echo "=== coronary #004 (refine1) resume BFGS 40k (3) $(date) ==="
timeout 7200 python examples/Coronary_Flow/coronary_flow_steady.py \
  --resume 'examples/Coronary_Flow/Test_Case_#004' --seed 0 \
  --refine 1 --noise-bnd 0.01 \
  --epochs 40000 --second-round jax-bfgs 2>&1 | tail -3

echo "=== lane6 done $(date) ==="
