#!/bin/bash
# CPU-f64 polish lane (sequential, single core).
cd /root/repo
# PYTHONPATH must drop /root/.axon_site: its sitecustomize overrides
# JAX_PLATFORMS and claims the TPU backend even when cpu is requested
# (same recipe as scripts/run_hybrid.py stage B and conftest.py)
export JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 PYTHONPATH=/root/repo

echo "=== cavity seed-1 (#003) polish 10k $(date) ==="
timeout 5400 python examples/Cavity_Steady/cavity_steady.py \
  --resume 'examples/Cavity_Steady/Test_Case_#003' --seed 1 \
  --epochs 10000 --second-round jax-bfgs 2>&1 | tail -3

echo "=== coronary resume 60k $(date) ==="
timeout 10000 python examples/Coronary_Flow/coronary_flow_steady.py \
  --resume 'examples/Coronary_Flow/Test_Case_#001' \
  --epochs 60000 --second-round jax-bfgs 2>&1 | tail -3

echo "=== poisson misto fresh 30k $(date) ==="
timeout 5400 python examples/Poisson_Problem/poisson_misto.py \
  --epochs 30000 --second-round jax-bfgs 2>&1 | tail -4

echo "=== poiseuille #001 resume 10k $(date) ==="
timeout 5400 python examples/Poiseuille_Flow/poiseuille_flow.py \
  --resume 'examples/Poiseuille_Flow/Test_Case_#001' \
  --epochs 10000 --second-round jax-bfgs 2>&1 | tail -3

echo "=== lane_cpu done $(date) ==="
