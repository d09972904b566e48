#!/bin/bash
# TPU-tunnel guard: the axon tunnel went UNAVAILABLE at ~22:43 (every TPU
# round since crashed with "Unable to initialize backend 'axon'").  Poll
# until a device probe succeeds, then run the queued TPU lanes in order:
# lane_tpu13 (split-BFGS re-polish of the small cases) followed by
# lane_tpu14's body (coronary #005 split-LM) via its pid-file wait.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"

echo "=== guard start $(date) ==="
while true; do
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "=== tunnel back $(date) ==="
    break
  fi
  sleep 600
done

bash scripts/lane_tpu13.sh
echo "=== guard: lane13 done, starting lane14 body $(date) ==="
for i in 1 2 3; do
  echo "=== coronary #005 split-LM 100 round $i $(date) ==="
  timeout 14400 python -u examples/Coronary_Flow/coronary_flow_steady.py \
    --resume 'examples/Coronary_Flow/Test_Case_#005' --seed 0 --refine 1 \
    --noise-bnd 0.01 --epochs 100 --second-round lm \
    > "/tmp/tpu14_coronary_r$i.log" 2>&1
  tail -2 "/tmp/tpu14_coronary_r$i.log"
done
echo "=== guard done $(date) ==="
