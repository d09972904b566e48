#!/bin/bash
# TPU-tunnel guard v2 (round 2): poll until the axon tunnel is back, then
# run the queued TPU work in priority order:
#   1. full TPU bench capture (VERDICT r1 item 1 — persists BENCH_TPU.json
#      and commits it, so the perf claims become a driver-visible artifact)
#   2. lane_tpu13 (split-BFGS re-polish of the three small pure-TPU cases)
#   3. lane_tpu14 body (coronary #005 split-LM rounds — VERDICT item 2)
#   4. a final bench capture (post-campaign, refreshed numbers)
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"

echo "=== guard2 start $(date) ==="
while true; do
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "=== tunnel back $(date) ==="
    break
  fi
  sleep 600
done

echo "=== bench capture $(date) ==="
BENCH_TPU_WAIT_S=60 timeout 3600 python bench.py > /tmp/bench_tpu_r02.log 2>&1
tail -2 /tmp/bench_tpu_r02.log
if [ -f BENCH_TPU.json ]; then
  git add BENCH_TPU.json && git commit -q -m "$(printf 'Record the TPU bench capture as a committed artifact (BENCH_TPU.json)\n\nNo-Verification-Needed: bench-output artifact only')" && echo "bench committed"
fi

bash scripts/lane_tpu13.sh
echo "=== guard2: lane13 done, starting lane14 body $(date) ==="
for i in 1 2 3; do
  echo "=== coronary #005 split-LM 100 round $i $(date) ==="
  timeout 14400 python -u examples/Coronary_Flow/coronary_flow_steady.py \
    --resume 'examples/Coronary_Flow/Test_Case_#005' --seed 0 --refine 1 \
    --noise-bnd 0.01 --epochs 100 --second-round lm \
    > "/tmp/tpu14_coronary_r$i.log" 2>&1
  tail -2 "/tmp/tpu14_coronary_r$i.log"
done

echo "=== final bench capture $(date) ==="
BENCH_TPU_WAIT_S=60 timeout 3600 python bench.py > /tmp/bench_tpu_r02_final.log 2>&1
tail -2 /tmp/bench_tpu_r02_final.log
if [ -f BENCH_TPU.json ]; then
  git add BENCH_TPU.json && git commit -q -m "$(printf 'Refresh the committed TPU bench capture after the round-2 campaigns\n\nNo-Verification-Needed: bench-output artifact only')" && echo "final bench committed"
fi
echo "=== guard2 done $(date) ==="
