#!/bin/bash
# CPU-f64 lane, part 5: continue coronary #004 (refine-1 oracle, 0.01
# boundary noise — the reference #123 protocol) toward reference-class test
# losses.  Current state: 5.1e-4/4.2e-4/8.4e-5 at iter 132k, still
# descending; previous 40k-epoch rounds kept hitting the 2h timeout before
# their final flush, so run 30k-epoch chunks that fit comfortably.
cd /root/repo
export JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 PYTHONPATH=/root/repo

run() {
  timeout 7000 python -u examples/Coronary_Flow/coronary_flow_steady.py \
    --resume 'examples/Coronary_Flow/Test_Case_#004' --seed 0 --refine 1 \
    --noise-bnd 0.01 --epochs 30000 --second-round jax-bfgs 2>&1 | tail -2
}

for i in 1 2 3 4; do
  echo "=== coronary #004 paired-BFGS 30k chunk $i $(date) ==="
  run
done
echo "=== lane7_cpu done $(date) ==="
