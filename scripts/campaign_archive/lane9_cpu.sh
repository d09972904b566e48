#!/bin/bash
# CPU-f64 lane, part 7: continue coronary #004 (refine-1, 0.01 boundary
# noise) past lane8's six 15k-epoch chunks.  At the measured trajectory
# (test losses roughly halving per ~12k epochs around iter 180k:
# 3.2e-4 @175k -> 1.6e-4 @187k, reference floor 6.7e-5/6.5e-5/1.3e-5)
# two-to-four more chunks should land u/v at the reference class.
cd /root/repo
export JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 PYTHONPATH=/root/repo

# queue behind lane8
while kill -0 "$(cat /tmp/lane8_cpu.pid 2>/dev/null)" 2>/dev/null; do sleep 120; done

for i in 1 2 3 4; do
  echo "=== coronary #004 paired-BFGS 15k cont-chunk $i $(date) ==="
  timeout 7000 python -u examples/Coronary_Flow/coronary_flow_steady.py \
    --resume 'examples/Coronary_Flow/Test_Case_#004' --seed 0 --refine 1 \
    --noise-bnd 0.01 --epochs 15000 --second-round jax-bfgs 2>&1 | tail -2
done
echo "=== lane9_cpu done $(date) ==="
