"""Diagnose the pure-TPU coronary stall (Test_Case_#005, loss flat at 1.59e-2).

Loads the campaign checkpoint, rebuilds the exact objective (seed 0,
refine 1, noise_bnd 0.01) by intercepting the driver's first minimize()
call, and reports loss / ||grad|| / best f64 descent probe.  Run under both
the ambient TPU env (f32) and JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 (f64) to
distinguish an f32 precision floor from a genuine local minimum.
"""
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import tpinn as ns


class _Captured(Exception):
    pass


_pb = {}


def _capture(pb, *a, **k):
    _pb["pb"] = pb
    raise _Captured


def main():
    src = "/root/repo/examples/Coronary_Flow/Test_Case_#005"
    tmp = tempfile.mkdtemp(prefix="diag005_")
    dst = os.path.join(tmp, "Test_Case_#005")
    shutil.copytree(src, dst)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "coro_example",
        "/root/repo/examples/Coronary_Flow/coronary_flow_steady.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    mod.ns.minimize = _capture
    try:
        mod.main(epochs=1, second_round="scipy", seed=0,
                 resume_from=dst, refine=1, noise_bnd=0.01)
    except _Captured:
        pass
    pb = _pb["pb"]

    from jax.flatten_util import ravel_pytree

    theta0, unravel = ravel_pytree(pb.variables.get())
    print("backend:", jax.default_backend(), "dtype:", theta0.dtype,
          "P:", theta0.shape[0])

    with jax.default_matmul_precision("highest"):
        loss = jax.jit(lambda th: pb.loss_fn(unravel(th)))
        val, grad = jax.jit(
            jax.value_and_grad(lambda th: pb.loss_fn(unravel(th))))(theta0)
        gnorm = float(jnp.linalg.norm(grad))
        print(f"loss = {float(val):.8e}")
        print(f"||grad|| = {gnorm:.6e}  max|g| = {float(jnp.max(jnp.abs(grad))):.3e}")
        # descent probe along -grad at a few scales
        g = grad / (gnorm + 1e-30)
        for s in [1e-1, 1e-2, 1e-3, 1e-4, 1e-5, 1e-6]:
            f = float(loss(theta0 - s * g))
            print(f"  step {s:.0e} along -grad: loss {f:.8e}  "
                  f"delta {f - float(val):+.3e}")
        # per-loss breakdown
        ev = pb.eval_jit()
        tr, te = ev(pb.variables.get())
        print("train losses:", {l.name: f"{float(v):.3e}"
                                for l, v in zip(pb.losses, tr)})
        print("test losses:", {l.name: f"{float(v):.3e}"
                               for l, v in zip(pb.losses_test, te)})
    shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
