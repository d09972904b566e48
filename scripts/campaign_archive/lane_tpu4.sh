#!/bin/bash
# Pure-TPU lane, part 4: coronary stage B on the folder stage A actually
# created (#005 — lane_tpu2's -newer pick collided with the CPU lane's
# live #004).  15k on-device BFGS epochs: a pure-TPU progress row; full
# parity needs the 130k+ epoch budget the CPU campaign used.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"

while kill -0 "$(cat /tmp/lane_tpu3.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

echo "=== coronary stage B (TPU BFGS 15k) -> Test_Case_#005 $(date) ==="
timeout 13500 python -u examples/Coronary_Flow/coronary_flow_steady.py \
  --resume 'examples/Coronary_Flow/Test_Case_#005' --epochs 15000 \
  --second-round jax-bfgs --seed 0 --refine 1 --noise-bnd 0.01 2>&1 | tail -2
echo "=== lane_tpu4 done $(date) ==="
