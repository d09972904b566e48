#!/bin/bash
# Pure-TPU lane, round 3: full f32 campaigns on the v5e backend for every
# case — stage A Adam + stage B on-device BFGS/LM, no CPU-f64 polish.
# Requires the full-f32-accumulation fix (bf16 matmul jitter otherwise
# stalls every quasi-Newton round at ~1e-5).  Sequential: single chip.
cd /root/repo
export PYTHONPATH=/root/repo

newest() { ls -dt "$1"/Test_Case_* | head -1; }

echo "=== colliding stage A (Adam 20k) $(date) ==="
timeout 3600 python -u examples/Colliding_Flow/colliding_flow.py \
  --epochs 20000 --second-round adam --seed 0 2>&1 | tail -2
TC=$(newest examples/Colliding_Flow)
echo "=== colliding stage B (TPU BFGS 5k) -> $TC $(date) ==="
timeout 5400 python -u examples/Colliding_Flow/colliding_flow.py \
  --resume "$TC" --epochs 5000 --second-round jax-bfgs --seed 0 2>&1 | tail -2

echo "=== poisson pure-TPU (Adam 100 + BFGS 10k) $(date) ==="
timeout 5400 python -u examples/Poisson_Problem/poisson.py \
  --epochs 10000 --second-round jax-bfgs 2>&1 | tail -2

echo "=== poisson misto pure-TPU (Adam 100 + LM 200) $(date) ==="
timeout 5400 python -u examples/Poisson_Problem/poisson_misto.py \
  --epochs 200 --second-round lm 2>&1 | tail -2

echo "=== cavity unsteady stage A (Adam 10k) $(date) ==="
timeout 5400 python -u examples/Cavity_Unsteady/cavity_unsteady.py \
  --epochs 10000 --second-round adam --seed 0 2>&1 | tail -2
TC=$(newest examples/Cavity_Unsteady)
echo "=== cavity unsteady stage B (TPU BFGS 5k) -> $TC $(date) ==="
timeout 10800 python -u examples/Cavity_Unsteady/cavity_unsteady.py \
  --resume "$TC" --epochs 5000 --second-round jax-bfgs --seed 0 2>&1 | tail -2

echo "=== coronary stage A (Adam 20k, refine1, noise parity) $(date) ==="
timeout 5400 python -u examples/Coronary_Flow/coronary_flow_steady.py \
  --epochs 20000 --second-round adam --seed 0 \
  --refine 1 --noise-bnd 0.01 2>&1 | tail -2
TC=$(newest examples/Coronary_Flow)
echo "=== coronary stage B (TPU BFGS 40k) -> $TC $(date) ==="
timeout 14400 python -u examples/Coronary_Flow/coronary_flow_steady.py \
  --resume "$TC" --epochs 40000 --second-round jax-bfgs --seed 0 \
  --refine 1 --noise-bnd 0.01 2>&1 | tail -2

echo "=== lane_tpu2 done $(date) ==="
