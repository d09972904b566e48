"""Point-axis data parallelism over a TPU device mesh.

The reference is single-process, single-device, full-batch TF eager — there is
no parallelism of any kind (SURVEY.md §2.4).  The workload's natural parallel
axis is the collocation/boundary/fitting **point batch**: every loss is a
mean of per-point residuals, so sharding points over a 1-D mesh turns each
``LossMeanSquares`` into a local mean plus one ``psum`` — which XLA inserts
automatically when the point arrays carry a ``NamedSharding`` and the
computation is jitted.  Parameters (a few k floats) are replicated.

Usage (works with the nisaba-style API unchanged):

    mesh = tpinn.sharding.point_mesh()
    dom_grid = tpinn.sharding.shard_points(dom_grid, mesh)
    ... build losses / minimize as usual ...

The jitted loss evaluation then partitions every pointwise computation across
devices with loss/gradient reductions riding the ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

POINT_AXIS = "points"


def point_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over all (or the first n) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (POINT_AXIS,))


def point_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(POINT_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arr, multiple: int, axis: int = 0, pad_value=0.0):
    """Pad the point axis so it divides evenly across the mesh.

    Returns (padded_array, original_length).  Means over padded residuals must
    be corrected by the caller or masked; for PINN batches we instead sample
    point counts that are multiples of the mesh size, so this is a fallback.
    """
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad_width = [(0, 0)] * arr.ndim
    pad_width[axis] = (0, rem)
    return jnp.pad(arr, pad_width, constant_values=pad_value), n


def shard_points(arr, mesh: Mesh, pad: bool = True):
    """Place an (N, ...) point batch with its leading axis sharded on the mesh.

    If N does not divide the mesh size and ``pad`` is True, the batch is
    padded by repeating the final point (repetition keeps residual means
    *nearly* exact; prefer divisible batch sizes for exactness).
    """
    arr = jnp.asarray(arr)
    n_dev = mesh.devices.size
    if arr.shape[0] % n_dev != 0:
        if not pad:
            raise ValueError(
                f"point count {arr.shape[0]} not divisible by mesh size {n_dev}"
            )
        rem = (-arr.shape[0]) % n_dev
        arr = jnp.concatenate([arr, jnp.repeat(arr[-1:], rem, axis=0)], axis=0)
    return jax.device_put(arr, point_sharding(mesh))


def shard_pair(x, rhs_list, mesh: Mesh):
    """Shard an **rhs-paired** point batch exactly, whatever its length.

    Pads ``x`` (repeating the last point) and every same-length rhs array in
    ``rhs_list`` (repeating its last entry) up to the next multiple of the
    mesh size, and returns a mask-scale vector ``m`` with
    ``m[:n] = sqrt(n_pad/n)`` and ``m[n:] = 0`` so that
    ``mean((m*r)**2)`` over the padded batch equals ``mean(r**2)`` over the
    original one — the sharded objective is **bit-for-bit the same
    mathematical mean**, not a nearly-equal one.  Scalar rhs entries pass
    through unchanged.

    Returns ``(x_sharded, rhs_sharded_list, scale)``; ``scale`` is None when
    no padding was needed.
    """
    x = jnp.asarray(x)
    n = int(x.shape[0])
    n_dev = int(mesh.devices.size)
    k = (-n) % n_dev
    sh = point_sharding(mesh)

    def _pad(a):
        return jnp.concatenate([a, jnp.repeat(a[-1:], k, axis=0)], axis=0)

    def _place_rhs(r):
        if jnp.ndim(r) == 0:
            return r
        r = jnp.asarray(r)
        return jax.device_put(r if k == 0 else _pad(r), sh)

    xs = jax.device_put(x if k == 0 else _pad(x), sh)
    rs = [_place_rhs(r) for r in rhs_list]
    if k == 0:
        return xs, rs, None
    scale = jnp.concatenate([
        jnp.full((n,), np.sqrt((n + k) / n), dtype=x.dtype),
        jnp.zeros((k,), dtype=x.dtype),
    ])
    return xs, rs, jax.device_put(scale, sh)


def replicate(tree, mesh: Mesh):
    """Replicate a parameter pytree across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)


def _local_valid_count(n_true: int, per_shard: int):
    """Valid-row count of THIS shard (inside shard_map): shard i holds rows
    [i·per, (i+1)·per); tail padding lives at the end, so the count is
    clip(n_true − i·per, 0, per).  f32 (the kernels' SMEM mask scalar)."""
    i = jax.lax.axis_index(POINT_AXIS)
    return jnp.clip(n_true - i * per_shard, 0, per_shard).astype(jnp.float32)


def sharded_ns_residual_mse(params, x, physics, norm, mesh: Mesh,
                            np_tile: int = 4096, interpret: bool = False,
                            n_true: Optional[int] = None):
    """Multi-chip fused NS-residual MSEs: each device runs the Pallas kernel
    (tpinn.pallas.ns_residual_mse) on its local point shard with its local
    valid-row count and the GLOBAL mean denominator, and a single ``psum``
    over the point axis combines the per-shard sums — the result is the
    EXACT global MSE for any batch length (tail padding rows are masked
    inside the kernel, round 4; earlier rounds repeat-padded, which
    perturbed the objective).  Gradients compose: shard_map transposes the
    psum into a cotangent split and psums the replicated-parameter
    gradients over ICI.

    ``x`` must divide the mesh ('points' axis) — pad with
    :func:`shard_points` and pass the TRUE row count as ``n_true``
    (default: all rows valid).
    """
    from tpinn.pallas.mlp_bundle import ns_residual_mse

    n = int(x.shape[0])
    n_dev = int(mesh.devices.size)
    if n % n_dev != 0:
        raise ValueError(
            f"point count {n} does not divide the {n_dev}-device mesh; "
            "pad with shard_points first"
        )
    n_true = n if n_true is None else int(n_true)
    per = n // n_dev

    def local(p, xl):
        m = ns_residual_mse(p, xl, physics, norm, np_tile=np_tile,
                            interpret=interpret,
                            n_valid=_local_valid_count(n_true, per),
                            n_mean=n_true)
        return jax.lax.psum(m, POINT_AXIS)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(jax.sharding.PartitionSpec(),
                  jax.sharding.PartitionSpec(POINT_AXIS)),
        out_specs=jax.sharding.PartitionSpec(),
        # pallas_call's out ShapeDtypeStruct carries no varying-mesh-axes
        # metadata; skip the vma check (correctness is pinned by
        # tests/test_sharding.py equality vs the single-instance kernel)
        check_vma=False,
    )(params, x)


def sharded_ns_weighted_obj(params, x, physics, norm, weights, mesh: Mesh,
                            np_tile: int = 4096, interpret: bool = False,
                            n_true: Optional[int] = None):
    """Multi-chip ONE-PASS training objective: each device runs the
    backward kernel with the loss weights as cotangents on its local point
    shard (tpinn.pallas.ns_residual_weighted_obj — weighted loss + log
    MSEs + parameter grads in one launch) with its local valid-row count
    and the GLOBAL mean denominator, and a ``psum`` over the point axis
    combines the per-shard contributions — exact for any batch length (see
    :func:`sharded_ns_residual_mse`).  Gradients compose: shard_map
    transposes the psum into a cotangent split, the custom VJP scales each
    shard's stashed gradients, and the replicated-parameter gradients psum
    over ICI.  The mses output is log-only (cotangent dropped by the VJP).
    """
    from tpinn.pallas.mlp_bundle import ns_residual_weighted_obj

    n = int(x.shape[0])
    n_dev = int(mesh.devices.size)
    if n % n_dev != 0:
        raise ValueError(
            f"point count {n} does not divide the {n_dev}-device mesh; "
            "pad with shard_points first"
        )
    n_true = n if n_true is None else int(n_true)
    per = n // n_dev

    def local(p, xl):
        L, mses = ns_residual_weighted_obj(
            p, xl, physics, norm, weights, np_tile=np_tile,
            interpret=interpret,
            n_valid=_local_valid_count(n_true, per), n_mean=n_true,
        )
        return (jax.lax.psum(L, POINT_AXIS),
                jax.lax.psum(mses, POINT_AXIS))

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(jax.sharding.PartitionSpec(),
                  jax.sharding.PartitionSpec(POINT_AXIS)),
        out_specs=(jax.sharding.PartitionSpec(),
                   jax.sharding.PartitionSpec()),
        check_vma=False,
    )(params, x)
