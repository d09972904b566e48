"""Benchmark: NS residual + full train-step throughput (pts/sec/chip) + MFU.

North-star metric from BASELINE.md / BASELINE.json: collocation pts/sec/chip
on the fused PDE residual evaluation (forward + all first derivatives +
Laplacians — the hot loop that is ≥99% of reference runtime, SURVEY.md §3.2).
The reference publishes no throughput numbers; the baseline is the
reference's own implementation style — an eager, tape-walking autograd
evaluation on CPU.  Primary baseline: the reference's ACTUAL stack, TF2
eager + persistent GradientTape, float64 CPU (TF 2.21 ships in this image);
a torch-CPU tape stand-in remains as fallback when TF cannot load.

Measured modes (scan-amortized: a lax.scan of K iterations inside ONE jit,
result fetched to host — the same shape as the real training loop's
run_chunk, so dispatch/tunnel latency is amortized exactly as in training;
per-call block_until_ready through the remote-TPU tunnel was measured to be
unreliable in both directions):
  * forward residual loss (XLA jet path)        — the round-1 headline metric
  * full train step: value_and_grad + Adam      — what training actually runs
  * the same train step through the Pallas fused kernel (custom fwd+bwd)

MFU is estimated from XLA's own cost analysis (compiled.cost_analysis()
flops) against the chip's bf16 peak (v5e ≈ 197 TFLOP/s); for the f32 runs
this understates achievable peak, so it is a conservative bound.
``train_mfu_bf16_peak`` reports the DEFAULT train path (the Pallas fused
kernel when it wins); the Pallas step computes bit-for-bit the same math
per point as the XLA step, so its model-flops rate is the XLA step's
per-point cost-analysis count times the Pallas pts/s (cost_analysis cannot
see inside a pallas_call custom kernel).  ``train_mfu_xla`` keeps the plain
XLA-path number for continuity with earlier captures.

Prints ONE JSON line; headline metric unchanged across rounds
(ns_residual_pts_per_sec), extra keys carry the train-step/Pallas numbers:
  {"metric": "ns_residual_pts_per_sec", "value": ..., "unit": "pts/s",
   "vs_baseline": ..., "train_step_pts_per_sec": ..., "train_mfu_bf16": ...,
   "pallas_train_pts_per_sec": ..., "train_default": "xla"|"pallas"}
"""

import argparse
import json
import os
import sys
import time

import numpy as np

PEAK_FLOPS = {  # bf16 peak per chip
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
}


def _setup(dtype_name, width=32, depth=3):
    import jax
    import jax.numpy as jnp

    from tpinn.geometry import Normalization
    from tpinn.models import MLP
    from tpinn.pipeline import NSPhysics

    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64
    model = MLP(2, 3, width=width, depth=depth, seed=0)
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), model.params)
    model.params = params
    norm = Normalization(np.array([0.0, 500.0]), np.array([0.0, 250.0]),
                         np.array([-1e4, 1e4]))
    physics = NSPhysics(conv=1.0, visc=1.0)
    return model, params, norm, physics, dtype


def _time_scan(loop_fn, args, iters):
    """Scan-amortized timing: loop_fn is a jitted function that runs `iters`
    inner iterations via lax.scan and returns a scalar; the scalar is fetched
    (device_get) so the measurement includes full completion."""
    import jax

    out = float(jax.device_get(loop_fn(*args)))  # compile + warm
    t0 = time.perf_counter()
    out = float(jax.device_get(loop_fn(*args)))
    return (time.perf_counter() - t0) / iters, out


def _flops_of(fn, args):
    import jax

    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def _xla_loss_fn(model, norm, physics):
    import jax.numpy as jnp

    from tpinn.pipeline import ResidualBundle, mass_residual, momentum_residual

    def loss_fn(params, x):
        prev = model._bound
        model._bound = params
        bundle = ResidualBundle(model, x, use_pallas=False)
        rm = mass_residual(bundle, norm)
        ru = momentum_residual(bundle, 0, physics, norm)
        rv = momentum_residual(bundle, 1, physics, norm)
        model._bound = prev
        return 10.0 * jnp.mean(rm**2) + jnp.mean(ru**2) + jnp.mean(rv**2)

    return loss_fn


def bench_forward(model, params, norm, physics, x, iters):
    import jax

    loss_fn = _xla_loss_fn(model, norm, physics)

    @jax.jit
    def loop(p, x):
        def body(acc, _):
            return acc + loss_fn(p, x), None

        acc, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return acc

    dt, out = _time_scan(loop, (params, x), iters)
    return x.shape[0] / dt, out


def bench_train_step(model, params, norm, physics, x, iters, use_pallas,
                     highest=False):
    """highest=True traces the step under full-f32 matmul accumulation —
    the mode every second-order round (BFGS/LM line-search evals) runs in
    (tpinn.optimize.minimize); quantifies what the accuracy campaigns pay
    per loss+grad evaluation vs the bf16-pass Adam step."""
    import contextlib

    import jax
    import optax

    ctx = (jax.default_matmul_precision("highest") if highest
           else contextlib.nullcontext())
    with ctx:
        return _bench_train_step(model, params, norm, physics, x, iters,
                                 use_pallas)


def _bench_train_step(model, params, norm, physics, x, iters, use_pallas):
    import jax
    import optax

    if use_pallas:
        # one-pass objective (round 3): the production single-device train
        # path — loss + log MSEs + grads from ONE kernel launch
        # (3 propagation units vs fwd+bwd's 4)
        from tpinn.pallas.mlp_bundle import ns_residual_weighted_obj

        def loss_fn(p, x):
            L, _ = ns_residual_weighted_obj(
                p, x, physics, norm, (10.0, 1.0, 1.0)
            )
            return L
    else:
        loss_fn = _xla_loss_fn(model, norm, physics)

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, x)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    @jax.jit
    def loop(p, s, x):
        (_, _), losses = jax.lax.scan(step, (p, s), None, length=iters)
        return losses[-1]

    dt, out = _time_scan(loop, (params, opt_state, x), iters)
    # XLA's cost_analysis counts the lax.scan body ONCE (verified: the
    # reported flops equal one train step's), so it is already per-iteration
    flops = _flops_of(loop, (params, opt_state, x))
    return (
        x.shape[0] / dt,
        flops,
        (flops / dt if flops else None),
    )


def bench_tf_reference_style(n_points: int, iters: int):
    """The reference's ACTUAL stack: TF2 eager + persistent GradientTape on
    CPU, float64 — the same algorithmic structure as the reference hot loop
    (Examples/Poiseuille_Flow/poiseuille_flow.py:180-197: one Keras forward
    per loss, per-derivative tape.gradient calls, second derivatives by
    re-differentiating a first-derivative column).  Written fresh against
    the public tf.GradientTape API — not copied from the reference."""
    import os

    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
    import tensorflow as tf

    tf.keras.utils.set_random_seed(0)
    model = tf.keras.Sequential(
        [tf.keras.layers.Input(shape=(2,), dtype=tf.float64)]
        + [tf.keras.layers.Dense(32, activation="tanh", dtype=tf.float64)
           for _ in range(3)]
        + [tf.keras.layers.Dense(3, dtype=tf.float64)]
    )
    x = tf.random.uniform((n_points, 2), dtype=tf.float64)
    norm_vel, norm_pre = 500.0, 2e4
    scale = 1.0 / max(norm_vel, norm_pre)

    def residual_eval():
        losses = []
        with tf.GradientTape(persistent=True) as tape:
            tape.watch(x)
            out = model(x)
            du = tape.gradient(out[:, 0], x)
            dv = tape.gradient(out[:, 1], x)
        losses.append(10.0 * tf.reduce_mean((du[:, 0] + dv[:, 1]) ** 2))
        for k in (0, 1):
            with tf.GradientTape(persistent=True) as tape:
                tape.watch(x)
                out = model(x)
                p = out[:, 2] * norm_pre
                u_eq = out[:, k] * norm_vel
                grad_eq = tape.gradient(u_eq, x)
                dp = tape.gradient(p, x)[:, k]
                d2x = tape.gradient(grad_eq[:, 0], x)[:, 0]
                d2y = tape.gradient(grad_eq[:, 1], x)[:, 1]
            conv = (
                norm_vel * out[:, 0] * grad_eq[:, 0]
                + norm_vel * out[:, 1] * grad_eq[:, 1]
            )
            r = (conv - (d2x + d2y) + dp) * scale
            losses.append(tf.reduce_mean(r**2))
        return tf.add_n(losses)

    residual_eval()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = residual_eval()
    dt = time.perf_counter() - t0
    return n_points * iters / dt, float(out.numpy())


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
        xg = x.clone().requires_grad_(True)
        out = model(xg)
        du = grad_col(out[:, 0], xg)
        dv = grad_col(out[:, 1], xg)
        losses.append(10.0 * torch.mean((du[:, 0] + dv[:, 1]) ** 2))
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


def analytic_kernel_work_per_point(widths=(2, 32, 32, 32, 3),
                                   unsteady=False):
    """Direct per-point work count of the fused residual kernels.

    MATMUL flops: the Pallas kernels propagate S Taylor streams (value, one
    gradient per input column, Hessian diagonal for the two spatial
    columns: S = 3 + dim) through the MLP — one (n_in, n_out) matmul over
    S·chunk lanes per layer (tpinn/pallas/mlp_bundle.py::_fwd_chunk).  The
    ONE-PASS train step (ns_residual_weighted_obj, the production path) is
    the backward kernel alone: forward-stream propagation + dW accumulation
    (s_li @ dz) + ds backprop (W @ dz) per layer (::_bwd_chunk) — 3x the
    forward's matmul work per step.  Counted with the TRUE feature dims
    (not the sublane padding to 8), so the resulting MFU is a conservative
    utilization figure.

    VPU ops: elementwise work on the (width, S·chunk) streams — tanh
    (counted as 1 op/element), tp = 1 − v², per-gradient-stream tp·gz, the
    Hessian-stream update (−2·v·tp·gz² + tp·hz: 5 ops), bias adds, and the
    residual assembly — for the forward; the backward roughly triples the
    hidden-layer stream algebra (cotangent assembly + dz chain terms).
    This is deliberately order-of-magnitude: it feeds the roofline note,
    not a headline metric.

    Returns dict(fwd_matmul, train_matmul, fwd_vpu, train_vpu) per point.
    """
    dim = 3 if unsteady else 2
    n_h = 2
    S = 1 + dim + n_h
    fwd_mm = sum(2 * a * b * S for a, b in zip(widths[:-1], widths[1:]))
    train_mm = 3 * fwd_mm  # one-pass kernel: recompute + dW + ds

    fwd_vpu = 0
    for w in widths[1:-1]:  # hidden layers
        per_elem = (
            1 + 1          # bias add + tanh (value stream)
            + 2            # tp = 1 - v*v
            + dim          # tp * gz per gradient stream
            + n_h * 5      # hessian-stream update
        )
        fwd_vpu += w * per_elem
    fwd_vpu += 40  # residual assembly + masked square-accumulate
    train_vpu = fwd_vpu * 3 + 60  # fwd streams + cotangent/dz chain algebra
    return {"fwd_matmul": fwd_mm, "train_matmul": train_mm,
            "fwd_vpu": fwd_vpu, "train_vpu": train_vpu}


def _backend_available(timeout_s=300):
    """Probe backend init in a subprocess: the remote-TPU tunnel can go
    UNAVAILABLE (observed 2026-08-17, ~hours), in which case jax.devices()
    in this process would hang/raise and the bench would record a crash.
    Returns True when the ambient backend initializes a non-CPU device."""
    import os
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, sys; sys.exit(0 if jax.devices()[0].platform != 'cpu' else 3)"],
            timeout=timeout_s, capture_output=True, env=dict(os.environ),
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_for_backend(wait_s: float, probe_timeout_s=180) -> bool:
    """Poll the ambient backend for up to ``wait_s`` seconds (tunnel outages
    are transient — VERDICT r1 item 1 asks the bench to retry past them
    instead of immediately recording a CPU fallback)."""
    deadline = time.monotonic() + wait_s
    first = True
    while True:
        if _backend_available(timeout_s=probe_timeout_s):
            return True
        if time.monotonic() >= deadline:
            return False
        if first:
            print("bench: ambient backend unavailable; polling "
                  f"(up to {wait_s:.0f}s, BENCH_TPU_WAIT_S to change)",
                  file=sys.stderr)
            first = False
        time.sleep(min(60.0, max(1.0, deadline - time.monotonic())))


_TPU_CAPTURE_PATH = "BENCH_TPU.json"


def _persist_tpu_capture(result: dict) -> None:
    """Record the most recent successful TPU measurement next to the repo
    root so a later CPU-fallback run can still report it (committed as
    BENCH_TPU.json; the driver's BENCH_r*.json then always carries TPU
    numbers with provenance)."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        _TPU_CAPTURE_PATH)
    payload = dict(result)
    payload["captured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime())
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    os.replace(tmp, path)


def _last_tpu_capture():
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        _TPU_CAPTURE_PATH)
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    # 4M: the forward scan carries a fixed ~0.8ms per-iteration overhead on
    # the tunnel TPU, so smaller batches underreport per-point throughput
    # (measured: 2.9e8 pts/s at 262k vs 2.1e9 at 4M for the same XLA
    # forward); 4M is firmly compute-bound for forward AND train step.
    ap.add_argument("--points", type=int, default=4194304)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--baseline-points", type=int, default=4096)
    ap.add_argument("--baseline-iters", type=int, default=5)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--width", type=int, default=32,
                    help="hidden width of the benched MLP (default 32, the "
                         "reference architecture; use 64/128 for the "
                         "width-scaling envelope — docs/DESIGN.md §3b)")
    ap.add_argument("--depth", type=int, default=3,
                    help="hidden depth of the benched MLP (default 3)")
    ap.add_argument("--cpu-fallback", action="store_true",
                    help=argparse.SUPPRESS)  # set by the self re-exec below
    args = ap.parse_args(argv)
    if args.quick:
        args.points, args.iters = 8192, 5
        args.baseline_points, args.baseline_iters = 1024, 2

    import os

    wait_s = float(os.environ.get("BENCH_TPU_WAIT_S", "600"))
    if (not args.cpu_fallback and os.environ.get("JAX_PLATFORMS") != "cpu"
            and not _wait_for_backend(wait_s)):
        # Tunnel down: re-exec onto the host CPU so the bench still reports
        # an honest (clearly labeled) number instead of hanging or crashing.
        print("bench: ambient backend unavailable; falling back to CPU",
              file=sys.stderr)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        # Drop sitecustomize-injected plugin paths (e.g. the remote-TPU
        # registration hook): with the tunnel down, letting the plugin
        # register means backend init hangs even under JAX_PLATFORMS=cpu
        # (same recipe as __graft_entry__.dryrun_multichip / conftest.py).
        env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
        os.execve(sys.executable,
                  [sys.executable, os.path.abspath(__file__),
                   "--cpu-fallback", "--quick"]
                  + (["--no-pallas"] if args.no_pallas else []),
                  env)

    import jax
    import jax.numpy as jnp

    model, params, norm, physics, dtype = _setup(
        "float32", width=args.width, depth=args.depth
    )
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (args.points, 2)), dtype=dtype
    )

    fwd_pts_per_sec, _ = bench_forward(model, params, norm, physics, x,
                                       args.iters)
    train_pts, train_flops, train_flops_per_sec = bench_train_step(
        model, params, norm, physics, x, args.iters, use_pallas=False
    )

    pallas_train_pts = None
    hp_train_pts = None
    hp3_train_pts = None
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and not args.no_pallas:
        try:
            pallas_train_pts, _, _ = bench_train_step(
                model, params, norm, physics, x, args.iters, use_pallas=True
            )
        except Exception as e:  # pragma: no cover
            print(f"pallas train bench failed: {e}", file=sys.stderr)
        try:
            hp_train_pts, _, _ = bench_train_step(
                model, params, norm, physics, x, args.iters,
                use_pallas=True, highest=True,
            )
        except Exception as e:  # pragma: no cover
            print(f"highest-precision train bench failed: {e}",
                  file=sys.stderr)
        # the 3-pass bf16_3x per-dot policy (TPINN_HP_DOT=high): measured
        # ~1.5x the 6-pass rate at 2-3e-5 relative deviation
        # (docs/DESIGN.md §3b); record it so the opt-in has a pinned number
        try:
            os.environ["TPINN_HP_DOT"] = "high"
            jax.clear_caches()
            hp3_train_pts, _, _ = bench_train_step(
                model, params, norm, physics, x, args.iters,
                use_pallas=True, highest=True,
            )
        except Exception as e:  # pragma: no cover
            hp3_train_pts = None
            print(f"bf16_3x train bench failed: {e}", file=sys.stderr)
        finally:
            os.environ.pop("TPINN_HP_DOT", None)
            # drop traces keyed under the 'high' policy: the env var is read
            # at trace time, so a lingering cache entry would silently serve
            # the 3-pass lowering to any later identical-signature call
            jax.clear_caches()

    dev_kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(dev_kind)
    mfu_xla = (
        round(train_flops_per_sec / peak, 4)
        if (train_flops_per_sec and peak)
        else None
    )
    # Pallas-path MFU from the same per-point flop model: the fused kernel
    # computes the identical loss+grad per point, so model-flops/sec =
    # (XLA flops / points) * pallas pts/s.  cost_analysis cannot count
    # inside the pallas_call, which is why the XLA step's count is reused.
    mfu_pallas = (
        round(train_flops / x.shape[0] * pallas_train_pts / peak, 4)
        if (train_flops and peak and pallas_train_pts)
        else None
    )
    mfu = mfu_pallas if (
        mfu_pallas and pallas_train_pts and pallas_train_pts > train_pts
    ) else mfu_xla

    # Direct analytically-counted MFU (VERDICT r2 item 5): the kernel's
    # matmul work per point is fixed by the propagation math — no XLA
    # cost_analysis proxy needed.  Also estimate the VPU (elementwise)
    # op rate for the roofline: the Taylor-stream activation algebra is
    # the train step's suspected bound, not the MXU.
    work = analytic_kernel_work_per_point(
        widths=(2,) + (args.width,) * args.depth + (3,)
    )
    best_train_pts = max(
        [p for p in (train_pts, pallas_train_pts) if p] or [0]
    )
    fwd_mfu_direct = (
        round(work["fwd_matmul"] * fwd_pts_per_sec / peak, 4)
        if peak else None
    )
    train_mfu_direct = (
        round(work["train_matmul"] * best_train_pts / peak, 4)
        if (peak and best_train_pts) else None
    )
    train_vpu_ops_per_sec = (
        round(work["train_vpu"] * best_train_pts) if best_train_pts else None
    )

    # Measure BOTH reference-style CPU baselines (round-3 advisor finding:
    # swapping the baseline implementation between rounds made the headline
    # vs_baseline multiplier non-comparable across captures; recording both
    # keeps every round's ratio reproducible against either).  Primary: the
    # reference's ACTUAL stack (TF2 eager GradientTape, f64 CPU).
    baselines = {}
    if args.width == 32 and args.depth == 3:
        # CPU baselines are only meaningful against the reference's 3x32
        # architecture; width-envelope runs skip them (vs_baseline: null)
        # Max of 3 repeats per baseline (round-4 advisor finding: one-shot
        # captures swung 40-82% between rounds under host-CPU contention,
        # making the headline multiplier unreliable).  Contention can only
        # SLOW a baseline down, so the max across repeats is the fairest
        # (and most conservative-speedup) estimate of its real throughput.
        def _best_of(fn, n=3):
            best = None
            for _ in range(n):
                pts, _ = fn(args.baseline_points, args.baseline_iters)
                best = pts if best is None else max(best, pts)
            return best

        try:
            baselines["tf2_eager_f64_cpu"] = round(
                _best_of(bench_tf_reference_style), 1)
        except Exception as e:
            print(f"TF baseline failed: {e}", file=sys.stderr)
        try:
            baselines["torch_cpu_f64"] = round(
                _best_of(bench_torch_reference_style), 1)
        except Exception as e:
            print(f"torch baseline failed: {e}", file=sys.stderr)
    if "tf2_eager_f64_cpu" in baselines:
        base_pts_per_sec = baselines["tf2_eager_f64_cpu"]
        baseline_impl = "tf2-eager GradientTape, float64 CPU (the reference's actual stack)"
    elif "torch_cpu_f64" in baselines:
        base_pts_per_sec = baselines["torch_cpu_f64"]
        baseline_impl = "torch-cpu eager tape (TF2-eager stand-in)"
    else:
        base_pts_per_sec = None
        baseline_impl = None

    result = {
        "metric": "ns_residual_pts_per_sec",
        "value": round(fwd_pts_per_sec, 1),
        "unit": "pts/s",
        "vs_baseline": (
            round(fwd_pts_per_sec / base_pts_per_sec, 2)
            if base_pts_per_sec
            else None
        ),
        # the baseline's own measured throughput, so the vs_baseline ratio
        # is reproducible from the recorded JSON.  Primary: the reference's
        # ACTUAL stack (TF2 eager GradientTape, f64 CPU); torch stand-in
        # only when TF is unavailable.
        "baseline_pts_per_sec": (
            round(base_pts_per_sec, 1) if base_pts_per_sec else None
        ),
        "baseline_impl": baseline_impl,
        "baselines": baselines,  # every measured baseline, for comparability
        "train_step_pts_per_sec": round(train_pts, 1),
        "train_step_flops": train_flops,
        "train_mfu_bf16_peak": mfu,
        "train_mfu_xla": mfu_xla,
        # direct analytic counts (no XLA proxy): per-point matmul flops are
        # fixed by the Taylor propagation (analytic_kernel_work_per_point)
        "fwd_mfu_direct": fwd_mfu_direct,
        "train_mfu_direct": train_mfu_direct,
        "train_vpu_ops_per_sec": train_vpu_ops_per_sec,
        "work_per_point": work,
        "device_kind": dev_kind,
        "pallas_train_pts_per_sec": (
            round(pallas_train_pts, 1) if pallas_train_pts else None
        ),
        "hp_train_pts_per_sec": (
            round(hp_train_pts, 1) if hp_train_pts else None
        ),
        "hp_train_bf16_3x_pts_per_sec": (
            round(hp3_train_pts, 1) if hp3_train_pts else None
        ),
        "train_default": (
            "pallas"
            if (pallas_train_pts and pallas_train_pts > train_pts)
            else "xla"
        ),
    }
    if args.width != 32 or args.depth != 3:
        # width-scaling envelope run (docs/DESIGN.md §3b): annotate and do
        # NOT overwrite the reference-architecture capture or claim the
        # 3x32 baselines' vs_baseline ratio
        result["widths"] = [2] + [args.width] * args.depth + [3]
        result["vs_baseline"] = None
    if args.cpu_fallback:
        # Honest label: these are host-CPU numbers recorded because the
        # remote-TPU tunnel was unavailable at bench time, NOT TPU perf.
        result["backend_fallback"] = "cpu (TPU tunnel unavailable)"
        last = _last_tpu_capture()
        if last is not None:
            # the most recent real-TPU measurement (committed BENCH_TPU.json)
            result["last_tpu_capture"] = last
    elif on_tpu and not args.quick and args.width == 32 and args.depth == 3:
        _persist_tpu_capture(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
