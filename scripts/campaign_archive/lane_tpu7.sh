#!/bin/bash
# Pure-TPU lane, part 7: coronary #005 Adam anneal.
# Diagnosis (scripts/diag_coronary_floor.py): at the #005 stall point the
# gradient is NOT zero (||g|| = 3.3e-2) but every -grad probe step increases
# the f32 loss — the refine-1 objective's curvature spread exceeds what any
# accept-test optimizer (BFGS line search, LM damping) can resolve in f32.
# Adam needs no accept test and its diagonal preconditioner handles the
# scale spread, so anneal: cosine 3e-4 -> 3e-7 over 60k epochs, then a
# cooler 1e-4 round, then retry BFGS from the new basin.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"

run() {
  timeout 10800 python -u examples/Coronary_Flow/coronary_flow_steady.py \
    --resume 'examples/Coronary_Flow/Test_Case_#005' --seed 0 --refine 1 \
    --noise-bnd 0.01 "$@" 2>&1 | tail -2
}

echo "=== coronary #005 adam anneal 3e-4 x60k $(date) ==="
run --epochs 60000 --second-round adam --adam-lr 3e-4
echo "=== coronary #005 adam anneal 1e-4 x40k $(date) ==="
run --epochs 40000 --second-round adam --adam-lr 1e-4
echo "=== coronary #005 BFGS retry 20k $(date) ==="
run --epochs 20000 --second-round jax-bfgs
echo "=== lane_tpu7 done $(date) ==="
