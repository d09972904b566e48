#!/bin/bash
# Pure-TPU lane, part 3: retries after the dense-BFGS non-finite fix.
# Waits for lane_tpu2 (single chip), then: colliding full rerun (its first
# stage-B NaN'd pre-fix), poisson with an LM second round (BFGS stalled at
# 8e-5 from the 100-epoch Adam start; LM reaches 1e-7 class in ~50 iters).
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"

while kill -0 "$(cat /tmp/lane_tpu2.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

MARK=/tmp/lane_tpu3.mark
touch "$MARK"; sleep 1
echo "=== colliding stage A (Adam 20k) $(date) ==="
timeout 3600 python -u examples/Colliding_Flow/colliding_flow.py \
  --epochs 20000 --second-round adam --seed 0 2>&1 | tail -2
TC=$(find examples/Colliding_Flow -maxdepth 1 -name 'Test_Case_*' -newer "$MARK" | head -1)
if [ -n "$TC" ]; then
  echo "=== colliding stage B (TPU BFGS 5k) -> $TC $(date) ==="
  timeout 7200 python -u examples/Colliding_Flow/colliding_flow.py \
    --resume "$TC" --epochs 5000 --second-round jax-bfgs --seed 0 2>&1 | tail -2
fi

echo "=== poisson pure-TPU (Adam 100 + LM 200) $(date) ==="
timeout 5400 python -u examples/Poisson_Problem/poisson.py \
  --epochs 200 --second-round lm 2>&1 | tail -2

echo "=== lane_tpu3 done $(date) ==="
