"""Scan the LM damping ladder at coronary #005's checkpointed state.

For each mu in the reject ladder, computes the damped step delta(mu) from
the f64 normal equations and reports:
  * df_split  — the split-channel paired accept test (what the optimizer sees)
  * df_pred   — the model-predicted decrease 2*c'(c/(w+lam)) - |J delta|^2 proxy
  * |delta|, |hi-change| — how much of the step survives f32 materialization

Run under the ambient TPU env.  This tells us WHERE in the ladder the
accept test fails on a cold (lo=0) restart, and whether the failure is
certification (df quantized to >=0) or genuine ascent.
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
    tmp = tempfile.mkdtemp(prefix="diagmu_")
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

    from tpinn.optimize import _flat_residual_fn

    theta0, unravel, residuals = _flat_residual_fn(pb)
    n_par = theta0.shape[0]
    dtype = theta0.dtype
    print("backend:", jax.default_backend(), "dtype:", dtype, "P:", n_par)

    def _hp(fn):
        def wrapped(*args):
            with jax.default_matmul_precision("highest"):
                return fn(*args)
        return jax.jit(wrapped)

    chunk = 256
    n_chunks = -(-n_par // chunk)
    pad = n_chunks * chunk - n_par
    eye = np.eye(n_par, dtype=np.result_type(dtype))
    if pad:
        eye = np.concatenate(
            [eye, np.zeros((pad, n_par), dtype=eye.dtype)], axis=0)
    basis_chunks = [
        jnp.asarray(eye[i * chunk:(i + 1) * chunk]) for i in range(n_chunks)]

    jac_chunk = _hp(
        lambda theta, vs: jax.vmap(
            lambda v: jax.jvp(residuals, (theta,), (v,))[1])(vs))
    res_lin = _hp(lambda hi, lo: jax.jvp(residuals, (hi,), (lo,)))
    gram_split = _hp(lambda Jt, r, dr: (Jt @ Jt.T, Jt @ r, Jt @ dr))
    pair_diff_split = _hp(
        lambda r1, d1, r0, d0: jnp.dot(
            (r1 - r0) + (d1 - d0), (r1 + r0) + (d1 + d0)))

    def _split64(t64):
        hi = t64.astype(np.float32)
        lo = (t64 - hi.astype(np.float64)).astype(np.float32)
        return jnp.asarray(hi), jnp.asarray(lo)

    theta64 = np.asarray(theta0, np.float64)
    r0, d0 = res_lin(*_split64(theta64))
    f0 = float(jnp.dot(r0, r0))
    print("loss at theta0 (f32 eval):", f0)

    theta_dev = jnp.asarray(theta64.astype(np.result_type(dtype)))
    rows = [jac_chunk(theta_dev, vs) for vs in basis_chunks]
    Jt = jnp.concatenate(rows, axis=0)[:n_par]
    JTJ, JTr_r, JTr_d = gram_split(Jt, r0, d0)
    JTr = np.asarray(JTr_r, np.float64) + np.asarray(JTr_d, np.float64)
    JTJ = np.asarray(JTJ, np.float64)
    w, V = np.linalg.eigh(JTJ)
    w = np.maximum(w, 0.0)
    w_max = float(w[-1])
    c = V.T @ JTr
    print(f"|JTr|={np.linalg.norm(JTr):.3e}  w_max={w_max:.3e}  "
          f"w_min={float(w[0]):.3e}  cond={w_max / max(float(w[0]), 1e-300):.1e}")

    hi0 = theta64.astype(np.float32)
    print(f"{'mu':>9} {'|delta|':>10} {'hi_chg':>7} {'df_split':>12} "
          f"{'df_pred':>12} {'ratio':>8}")
    for mu in [10.0 ** k for k in range(-3, 13)]:
        lam = mu * w_max + np.finfo(np.float64).tiny
        delta = -(V @ (c / (w + lam)))
        # model-predicted decrease: 2 c' s - s'(W)s with s = -c/(w+lam)
        s = -(c / (w + lam))
        df_pred = float(2.0 * c @ s + s @ (w * s))
        t1 = theta64 + delta
        hi1 = t1.astype(np.float32)
        n_chg = int(np.sum(hi1 != hi0))
        r1, d1 = res_lin(*_split64(t1))
        df = float(pair_diff_split(r1, d1, r0, d0))
        ratio = df / df_pred if df_pred != 0 else float("nan")
        print(f"{mu:9.0e} {np.linalg.norm(delta):10.3e} {n_chg:7d} "
              f"{df:12.4e} {df_pred:12.4e} {ratio:8.3f}")

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
