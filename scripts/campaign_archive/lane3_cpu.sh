#!/bin/bash
# CPU-f64 polish lane, round 3 (sequential, single core).
# PYTHONPATH must drop /root/.axon_site: its sitecustomize overrides
# JAX_PLATFORMS and claims the TPU backend even when cpu is requested.
cd /root/repo
export JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 PYTHONPATH=/root/repo

echo "=== coronary #001 resume 60k $(date) ==="
timeout 9000 python examples/Coronary_Flow/coronary_flow_steady.py \
  --resume 'examples/Coronary_Flow/Test_Case_#001' \
  --epochs 60000 --second-round jax-bfgs 2>&1 | tail -3

echo "=== poisson misto fresh 30k $(date) ==="
timeout 5400 python examples/Poisson_Problem/poisson_misto.py \
  --epochs 30000 --second-round jax-bfgs 2>&1 | tail -4

echo "=== poiseuille #001 resume 10k $(date) ==="
timeout 5400 python examples/Poiseuille_Flow/poiseuille_flow.py \
  --resume 'examples/Poiseuille_Flow/Test_Case_#001' \
  --epochs 10000 --second-round jax-bfgs 2>&1 | tail -3

echo "=== coronary seed1 #002 L-BFGS 30k $(date) ==="
timeout 4500 python examples/Coronary_Flow/coronary_flow_steady.py \
  --resume 'examples/Coronary_Flow/Test_Case_#002' --seed 1 \
  --epochs 30000 --second-round jax 2>&1 | tail -3

echo "=== coronary seed1 #002 BFGS 40k $(date) ==="
timeout 7200 python examples/Coronary_Flow/coronary_flow_steady.py \
  --resume 'examples/Coronary_Flow/Test_Case_#002' --seed 1 \
  --epochs 40000 --second-round jax-bfgs 2>&1 | tail -3

echo "=== lane3 done $(date) ==="
