"""Benchmark: Navier–Stokes residual-evaluation throughput (pts/sec/chip).

North-star metric from BASELINE.md / BASELINE.json: collocation pts/sec/chip
on the fused PDE residual evaluation (forward + all first derivatives +
Laplacians — the hot loop that is ≥99% of reference runtime, SURVEY.md §3.2).
The reference publishes no throughput numbers; the baseline is the
reference's own implementation style — an eager, tape-walking autograd
evaluation on CPU (the reference is TF2-eager CPU; measured here with the
equivalent torch-CPU tape implementation, since TF is not in this image).

Prints ONE JSON line:
  {"metric": "ns_residual_pts_per_sec", "value": ..., "unit": "pts/s",
   "vs_baseline": ...}

vs_baseline = (tpinn on this chip) / (reference-style tape eval on CPU).
Target from BASELINE.json: ≥10x.
"""

import argparse
import json
import sys
import time

import numpy as np


def bench_tpinn(n_points: int, iters: int, dtype_name: str = "float32"):
    import jax
    import jax.numpy as jnp

    from tpinn.geometry import Normalization
    from tpinn.models import MLP
    from tpinn.pipeline import (
        NSPhysics,
        ResidualBundle,
        mass_residual,
        momentum_residual,
    )

    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64
    model = MLP(2, 3, width=32, depth=3, seed=0)
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), model.params)
    model.params = params
    norm = Normalization(np.array([0.0, 500.0]), np.array([0.0, 250.0]),
                         np.array([-1e4, 1e4]))
    physics = NSPhysics(conv=1.0, visc=1.0)

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (n_points, 2)), dtype=dtype
    )

    def residual_eval(params, x):
        prev = model._bound
        model._bound = params
        bundle = ResidualBundle(model, x)
        rm = mass_residual(bundle, norm)
        ru = momentum_residual(bundle, 0, physics, norm)
        rv = momentum_residual(bundle, 1, physics, norm)
        model._bound = prev
        return (
            10.0 * jnp.mean(rm**2) + jnp.mean(ru**2) + jnp.mean(rv**2)
        )

    fn = jax.jit(residual_eval)
    out = fn(params, x)
    jax.block_until_ready(out)  # compile + warm
    out = fn(params, x)
    jax.block_until_ready(out)

    # synchronize every iteration: dispatch latency is counted, so the
    # number is an honest end-to-end throughput, not a pipelined upper bound
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(params, x))
    dt = time.perf_counter() - t0
    return n_points * iters / dt, float(out)


def bench_torch_reference_style(n_points: int, iters: int):
    """Reference-style eager tape evaluation on CPU (torch stands in for the
    reference's TF2-eager implementation; same algorithmic structure as
    nisaba's GradientTape walks — one forward per loss, per-derivative
    autograd.grad calls with create_graph, SURVEY.md §3.3)."""
    import torch

    torch.set_num_threads(max(1, torch.get_num_threads()))
    torch.manual_seed(0)
    model = torch.nn.Sequential(
        torch.nn.Linear(2, 32), torch.nn.Tanh(),
        torch.nn.Linear(32, 32), torch.nn.Tanh(),
        torch.nn.Linear(32, 32), torch.nn.Tanh(),
        torch.nn.Linear(32, 3),
    ).double()
    x = torch.rand(n_points, 2, dtype=torch.float64)
    norm_vel, norm_pre = 500.0, 2e4
    scale = 1.0 / max(norm_vel, norm_pre)

    def grad_col(y, x):
        return torch.autograd.grad(
            y, x, torch.ones_like(y), create_graph=True
        )[0]

    def residual_eval():
        losses = []
        # PDE_MASS: its own tape walk (reference PDE_MASS, :173-178)
        xg = x.clone().requires_grad_(True)
        out = model(xg)
        du = grad_col(out[:, 0], xg)
        dv = grad_col(out[:, 1], xg)
        losses.append(10.0 * torch.mean((du[:, 0] + dv[:, 1]) ** 2))
        # PDE_MOM(k): forward + grads + laplacian per component (:180-197)
        for k in (0, 1):
            xg = x.clone().requires_grad_(True)
            out = model(xg)
            p = out[:, 2] * norm_pre
            u_eq = out[:, k] * norm_vel
            grad_eq = grad_col(u_eq, xg)
            dp = grad_col(p, xg)[:, k]
            d2x = grad_col(grad_eq[:, 0], xg)[:, 0]
            d2y = grad_col(grad_eq[:, 1], xg)[:, 1]
            conv = (
                norm_vel * out[:, 0] * grad_eq[:, 0]
                + norm_vel * out[:, 1] * grad_eq[:, 1]
            )
            r = (conv - (d2x + d2y) + dp) * scale
            losses.append(torch.mean(r**2))
        return sum(losses)

    residual_eval()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = residual_eval()
    dt = time.perf_counter() - t0
    return n_points * iters / dt, float(out.detach())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--baseline-points", type=int, default=4096)
    ap.add_argument("--baseline-iters", type=int, default=5)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args(argv)
    if args.quick:
        args.points, args.iters = 8192, 5
        args.baseline_points, args.baseline_iters = 1024, 2

    pts_per_sec, loss = bench_tpinn(args.points, args.iters)
    try:
        base_pts_per_sec, _ = bench_torch_reference_style(
            args.baseline_points, args.baseline_iters
        )
    except Exception as e:  # torch missing/broken: report absolute only
        print(f"baseline failed: {e}", file=sys.stderr)
        base_pts_per_sec = None

    result = {
        "metric": "ns_residual_pts_per_sec",
        "value": round(pts_per_sec, 1),
        "unit": "pts/s",
        "vs_baseline": (
            round(pts_per_sec / base_pts_per_sec, 2)
            if base_pts_per_sec
            else None
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
