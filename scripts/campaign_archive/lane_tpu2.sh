#!/bin/bash
# Pure-TPU lane, round 3: full f32 campaigns on the v5e backend for every
# case — stage A Adam + stage B on-device BFGS/LM, no CPU-f64 polish.
# Requires the full-f32-accumulation fix (bf16 matmul jitter otherwise
# stalls every quasi-Newton round at ~1e-5).  Sequential: single chip.
cd /root/repo
# Ambient env only: PYTHONPATH must keep /root/.axon_site (the sitecustomize
# that registers the axon PJRT plugin) — overriding it leaves
# JAX_PLATFORMS=axon pointing at an unregistered backend.
export PYTHONPATH="/root/repo:${PYTHONPATH}"

MARK=/tmp/lane_tpu2.mark

# two_stage <case dir> <script> <adam epochs> <stage-B strategy> <stage-B epochs> [extra args...]
two_stage() {
  dir=$1; script=$2; adam=$3; strat=$4; sb=$5; shift 5
  touch "$MARK"; sleep 1
  echo "=== $script stage A (Adam $adam) $(date) ==="
  timeout 5400 python -u "$script" --epochs "$adam" --second-round adam "$@" 2>&1 | tail -2
  TC=$(find "$dir" -maxdepth 1 -name 'Test_Case_*' -newer "$MARK" | head -1)
  if [ -z "$TC" ]; then
    echo "!!! stage A produced no new Test_Case folder — skipping stage B"
    return 1
  fi
  echo "=== $script stage B ($strat $sb) -> $TC $(date) ==="
  timeout 14400 python -u "$script" --resume "$TC" --epochs "$sb" \
    --second-round "$strat" "$@" 2>&1 | tail -2
}

two_stage examples/Colliding_Flow examples/Colliding_Flow/colliding_flow.py \
  20000 jax-bfgs 5000 --seed 0

echo "=== poisson pure-TPU (Adam 100 + BFGS 10k) $(date) ==="
timeout 5400 python -u examples/Poisson_Problem/poisson.py \
  --epochs 10000 --second-round jax-bfgs 2>&1 | tail -2

echo "=== poisson misto pure-TPU (Adam 100 + LM 200) $(date) ==="
timeout 5400 python -u examples/Poisson_Problem/poisson_misto.py \
  --epochs 200 --second-round lm 2>&1 | tail -2

two_stage examples/Cavity_Unsteady examples/Cavity_Unsteady/cavity_unsteady.py \
  10000 jax-bfgs 5000 --seed 0

two_stage examples/Coronary_Flow examples/Coronary_Flow/coronary_flow_steady.py \
  20000 jax-bfgs 40000 --seed 0 --refine 1 --noise-bnd 0.01

echo "=== lane_tpu2 done $(date) ==="
