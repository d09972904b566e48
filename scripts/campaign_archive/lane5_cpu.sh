#!/bin/bash
# CPU-f64 lane, round 3 part 3: refined-data coronary campaign + unsteady
# seed-1 polish (redo of lane4 steps that hit the f32-checkpoint dtype bug).
cd /root/repo
export JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 PYTHONPATH=/root/repo

echo "=== coronary #004 (refine1) resume L-BFGS 30k $(date) ==="
timeout 4200 python examples/Coronary_Flow/coronary_flow_steady.py \
  --resume 'examples/Coronary_Flow/Test_Case_#004' --seed 0 \
  --refine 1 --noise-bnd 0.01 \
  --epochs 30000 --second-round jax 2>&1 | tail -3

echo "=== coronary #004 (refine1) resume BFGS 40k $(date) ==="
timeout 7200 python examples/Coronary_Flow/coronary_flow_steady.py \
  --resume 'examples/Coronary_Flow/Test_Case_#004' --seed 0 \
  --refine 1 --noise-bnd 0.01 \
  --epochs 40000 --second-round jax-bfgs 2>&1 | tail -3

echo "=== cavity unsteady #002 (seed1) resume BFGS 5k $(date) ==="
timeout 5400 python examples/Cavity_Unsteady/cavity_unsteady.py \
  --resume 'examples/Cavity_Unsteady/Test_Case_#002' --seed 1 \
  --epochs 5000 --second-round jax-bfgs 2>&1 | tail -3

echo "=== lane5 done $(date) ==="
