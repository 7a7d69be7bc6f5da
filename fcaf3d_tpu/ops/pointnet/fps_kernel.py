"""TPU Pallas farthest-point-sampling kernel.

The XLA formulation of FPS (`jax.lax.fori_loop` with one tiny
distance/argmax round per sample, `ops.furthest_point_sample`) pays
per-iteration dispatch and cross-kernel latency ~3800 times per VoteNet
forward (levels 2048+1024+512+256) — measured ~470 ms/step of the
SUN RGB-D train step, the #2 cost after ball-query sorts. This kernel runs
the ENTIRE serial selection loop on-core: the cloud lives in VMEM in
(sublane, lane) layout, every iteration is a handful of fused VPU passes
over [R, 128] tiles, and the chosen index lands in SMEM (dynamic scalar
stores are legal there, unlike lane-dim dynamic indexing in VMEM).

Exact same semantics as the reference CUDA op (`furthest_point_sample_ext`,
D-FPS, `/root/reference/mmdet3d/ops/furthest_point_sample/`): start at the
first valid index, iteratively take the point with max min-distance to the
selected set, first-occurrence tie-break.

The selected point's coordinates are extracted with a one-hot
multiply-reduce (lane-dynamic reads are not expressible otherwise); the
argmax is max-reduce + min-index-of-equality, which matches `jnp.argmax`'s
first-occurrence rule bit-exactly in f32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e10  # plain float: jnp scalars would be captured tracer constants


def _make_kernel(n_rows: int, num_samples: int):
    n_cap = n_rows * 128

    def _kernel(starts_ref, x_ref, y_ref, z_ref, v_ref, out_ref):
        from jax.experimental import pallas as pl

        b = pl.program_id(0)
        flat = (
            jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 1)
        )
        x = x_ref[0, 0]
        y = y_ref[0, 0]
        z = z_ref[0, 0]
        vmask = v_ref[0] > 0
        start = starts_ref[b]
        out_ref[b, 0] = start

        def body(i, carry):
            last, dcur = carry
            onehot = (flat == last).astype(jnp.float32)
            lx = jnp.sum(onehot * x)
            ly = jnp.sum(onehot * y)
            lz = jnp.sum(onehot * z)
            d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
            dcur = jnp.minimum(dcur, d)
            masked = jnp.where(vmask, dcur, -1.0)
            m = jnp.max(masked)
            nxt = jnp.min(jnp.where(masked == m, flat, n_cap)).astype(jnp.int32)
            out_ref[b, i] = nxt
            return nxt, dcur

        init = (start, jnp.full((n_rows, 128), _BIG, jnp.float32))
        jax.lax.fori_loop(1, num_samples, body, init)

    return _kernel


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def _fps_pallas(xyz_t, valid_f, starts, num_samples, interpret=False):
    """xyz_t: [B, 3, R, 128] f32 (padded, lane-major); valid_f: [B, R, 128]
    f32 (1.0 = selectable); starts: [B] int32 first valid index."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, _, n_rows, _ = xyz_t.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, n_rows, 128), lambda bb, *_: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_rows, 128), lambda bb, *_: (bb, 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_rows, 128), lambda bb, *_: (bb, 2, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_rows, 128), lambda bb, *_: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # whole-array SMEM output (Mosaic requires sublane-dim blocks of 8
        # or the full array); the kernel writes its own batch row via
        # dynamic scalar stores, which SMEM permits
        out_specs=pl.BlockSpec((b, num_samples), lambda bb, *_: (0, 0),
                               memory_space=pltpu.SMEM),
    )
    return pl.pallas_call(
        _make_kernel(n_rows, num_samples),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, num_samples), jnp.int32),
        interpret=interpret,
    )(starts, xyz_t, xyz_t, xyz_t, valid_f)


def fps_tpu(points, num_samples, valid, interpret=None):
    """Drop-in Pallas forward for `furthest_point_sample` ([B, N, 3] ->
    [B, num_samples] int32). Padding rows are marked invalid and their
    coordinates zeroed (they can shrink only their own min-distances, which
    the valid mask excludes from every argmax)."""
    b, n, _ = points.shape
    pad = (-n) % (128 * 8)  # full 8-sublane rows keep every pass aligned
    # index selection is non-differentiable (the reference CUDA op has no
    # grad either); without this the train step's JVP hits pallas_call's
    # missing jvp rule
    points = jax.lax.stop_gradient(points)
    xyz = points.astype(jnp.float32)
    vf = valid.astype(jnp.float32)
    if pad:
        xyz = jnp.pad(xyz, ((0, 0), (0, pad), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad)))
    npad = n + pad
    n_rows = npad // 128
    xyz_t = jnp.swapaxes(xyz, 1, 2).reshape(b, 3, n_rows, 128)
    valid_f = vf.reshape(b, n_rows, 128)
    starts = jnp.argmax(valid, axis=1).astype(jnp.int32)
    idx = _fps_pallas(xyz_t, valid_f, starts, num_samples,
                      interpret=bool(interpret))
    return jnp.minimum(idx, n - 1)
