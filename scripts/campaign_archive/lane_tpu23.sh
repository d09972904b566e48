#!/bin/bash
# Round-4 lane B (queues behind lane_tpu22): regenerate the plain-Poisson
# pure-TPU f64 fast-Gram LM artifact (the 15:04 run reached test MSE
# 2.93e-9 — /tmp/tpu22_poisson.log — but a CPU smoke clobbered the history
# file before it was committed; poisson.py now takes --out-dir so smoke
# runs can't collide again).
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
export JAX_ENABLE_X64=1
echo $$ > /tmp/lane_tpu23.pid

while kill -0 "$(cat /tmp/lane_tpu22.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

echo "=== poisson (Dirichlet) pure-TPU f64 fast-Gram LM rerun $(date) ==="
timeout 5400 python -u examples/Poisson_Problem/poisson.py \
  --epochs 300 --second-round lm \
  > /tmp/tpu23_poisson.log 2>&1
tail -3 /tmp/tpu23_poisson.log
rm -f /tmp/lane_tpu23.pid
echo "=== lane_tpu23 done $(date) ==="
