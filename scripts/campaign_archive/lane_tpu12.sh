#!/bin/bash
# Pure-TPU lane, part 12 (queued behind lane_tpu11): split-parameter LM on
# the small cases.  The lane_tpu10 paired-BFGS re-polish reproduced every
# previous pure-TPU floor BIT-IDENTICALLY (poiseuille 5.13e-8/1.47e-8/9.01e-9,
# cavity steady 9.97e-5/8.61e-5/1.22e-4) — the binding wall on all cases is
# the f32 parameter grid, which only the f64-carry LM can cross.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"

while kill -0 "$(cat /tmp/lane_tpu11.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

echo "=== poiseuille #003 split-LM 100 $(date) ==="
timeout 7200 python -u examples/Poiseuille_Flow/poiseuille_flow.py \
  --resume 'examples/Poiseuille_Flow/Test_Case_#003' --seed 0 \
  --epochs 100 --second-round lm 2>&1 | tail -2

echo "=== cavity steady #005 split-LM 100 $(date) ==="
timeout 7200 python -u examples/Cavity_Steady/cavity_steady.py \
  --resume 'examples/Cavity_Steady/Test_Case_#005' --seed 2 \
  --epochs 100 --second-round lm 2>&1 | tail -2

echo "=== colliding #002 split-LM 100 $(date) ==="
timeout 7200 python -u examples/Colliding_Flow/colliding_flow.py \
  --resume 'examples/Colliding_Flow/Test_Case_#002' --seed 0 \
  --epochs 100 --second-round lm 2>&1 | tail -2

echo "=== lane_tpu12 done $(date) ==="
