"""Grid-bucketed ball query for large clouds (TPU Pallas extraction kernel).

The brute-force ball query scores all N points per center and runs an exact
top-k over N (`ops.ball_query`); at VoteNet SA1 scale ([16, 2048, 20000])
that single `approx_max_k` was ~395 ms/train-step — 70% of the whole step
(r5 trace, `tools/bench_train.py --trace`). This module replaces the O(M*N)
sweep with the classic spatial-hash formulation, built TPU-first:

1. Bucket points into cells of size `radius` and sort by packed cell key
   (one argsort). Points within `radius` of a center are within +-1 cell on
   every axis, so each center's candidates live in the 9 (dx, dy) neighbor
   columns x 3 z-cells — 9 CONTIGUOUS ranges of the sorted order, found
   with the repo's Pallas searchsorted (`ops/sparse/search.py`) after
   sorting the centers by their own cell key (monotone queries = tight
   chunk ranges).
2. A Pallas kernel holds the four sorted planes (x, y, z, original-index)
   VMEM-resident as [N/128, 128] tiles and, per (center, offset-column),
   extracts candidate lanes [lo, lo+128) with one dynamic-sublane slice +
   one dynamic lane `pltpu.roll` (funnel shift) per plane — no row gathers
   anywhere (XLA gathers measured ~9 ns/row = 334 ms for the same volume).
   It emits the same score encoding the brute path uses
   (-(original_index + 1) for hits, -(N + 1) for misses).
3. One exact `approx_max_k` over the 9*128 candidate scores (~1/17th of
   N) selects the first-`nsample` hits by original point index — the
   reference CUDA `ball_query_ext` semantics (first found in index order,
   padded by repeating the first).

Exactness: candidate ranges come from conservative cell bounds and the hit
test is the exact `d2 < r^2` on original coordinates, so results match the
brute path bit-for-bit UNLESS a (center, offset) range holds more than
`cap`(=128) points — possible only when >128 points occupy one 3-cell
column (~0.008 m^3 at r=0.2). `ball_query_grid` returns the worst overflow
count so callers can surface it (PointSAModule sows it into the "overflow"
collection like the sparse-conv budget counters).

Clamping note: cells are clamped to a static [GX, GY, GZ] grid; clamping is
monotone (|clamp(a)-clamp(b)| <= |a-b|), so true +-1-cell neighbors stay
within +-1 clamped cells and out-of-grid geometry only ever ADDS candidates
(filtered by the exact distance test). Out-of-range neighbor columns are
dropped (not clamped) to keep candidate ranges disjoint — a duplicated
candidate would break the first-K-by-index selection.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.search import searchsorted_segments

# static cell grid: keys are (cx * GY + cy) * GZ + cz; GX*GY*GZ < 2**31 and
# indoor scenes (<= ~25 m at r >= 0.1) fit comfortably
GX, GY, GZ = 255, 256, 64
_CAP = 128  # candidates per (center, offset-column) = one lane vreg


def _make_kernel(t_cent: int, n_rows: int, r2: float, n_real: int):
    miss = float(-(n_real + 1))  # plain float: jnp scalars would be captured
    # tracer constants (fps_kernel.py:30 note)

    def _kernel(px_ref, py_ref, pz_ref, pi_ref, lohi_ref, cent_ref, out_ref):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def funnel(ref, r0, sh):
            two = ref[0, 0, pl.ds(r0, 2), :]
            rot = pltpu.roll(two, -sh, 1)
            return jnp.where(lane < 128 - sh, rot[0:1], rot[1:2])

        def score_one(t, o):
            # per-center scalars are packed 8-centers-per-row (the SMEM
            # window's minor dim pads to 128 lanes, so a [T, 16] layout
            # would burn 8x the scalar memory)
            g = t // 8
            s = (t % 8) * 16
            cx = cent_ref[0, g, s + 9]
            cy = cent_ref[0, g, s + 10]
            cz = cent_ref[0, g, s + 11]
            v = lohi_ref[0, g, s + o]
            lo = v // 2048
            n_live = v - lo * 2048

            def live(_):
                r0 = lo // 128
                sh = lo - r0 * 128
                x = funnel(px_ref, r0, sh)
                y = funnel(py_ref, r0, sh)
                z = funnel(pz_ref, r0, sh)
                pi = funnel(pi_ref, r0, sh)
                d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
                ok = (lane < n_live) & (d2 < r2)
                return jnp.where(ok, -(pi + 1.0), miss)

            return jax.lax.cond(
                n_live > 0, live, lambda _: jnp.full((1, 128), miss), 0
            )

        def group_body(t8, _):
            # 8 centers per iteration: stores are full-sublane [8, 128]
            # blocks at 8-aligned offsets (dynamic single-sublane stores
            # crash the Mosaic lowering)
            base_t = t8 * 8
            for o in range(9):
                blk = jnp.concatenate(
                    [score_one(base_t + dt, o) for dt in range(8)], axis=0)
                out_ref[0, pl.ds(pl.multiple_of(base_t, 8), 8),
                        o * 128:(o + 1) * 128] = blk
            return 0

        jax.lax.fori_loop(0, t_cent // 8, group_body, 0)

    return _kernel


@functools.partial(jax.jit, static_argnames=("r2", "n_real", "interpret"))
def _scores_pallas(planes, lohi, centp, r2, n_real, interpret=False):
    """planes: [B, 4, R, 128] sorted (x, y, z, idx) planes; lohi: [B, M/8,
    128] int32 (center t's offset o at [t//8, (t%8)*16 + o], value
    lo * 2048 + n_live); centp: [B, M/8, 128] f32 (xyz at slots 9..11).
    -> scores [B, M, 1152]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, _, n_rows, _ = planes.shape
    m = lohi.shape[1] * 8
    t_cent = min(m, 512)
    assert m % t_cent == 0 and t_cent % 8 == 0, (m, t_cent)

    def plane_spec(p):
        return pl.BlockSpec((1, 1, n_rows, 128), lambda bb, tt, p=p: (bb, p, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, m // t_cent),
        in_specs=[
            plane_spec(0), plane_spec(1), plane_spec(2), plane_spec(3),
            pl.BlockSpec((1, t_cent // 8, 128), lambda bb, tt: (bb, tt, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t_cent // 8, 128), lambda bb, tt: (bb, tt, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, t_cent, 9 * 128), lambda bb, tt: (bb, tt, 0),
                               memory_space=pltpu.VMEM),
    )

    def dedup(x):
        # the four plane BlockSpecs index one shared input; Mosaic wants
        # distinct refs, so pass the same array four times
        return (x, x, x, x)

    kernel = _make_kernel(t_cent, n_rows, float(r2), int(n_real))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, m, 9 * 128), jnp.float32),
        interpret=interpret,
    )(*dedup(planes), lohi, centp)


def _scores_xla(planes, lo, hi, cent, r2, n_real):
    """Reference/CPU formulation of the extraction kernel (row gathers)."""
    b, _, n_rows, _ = planes.shape
    m = lo.shape[1]
    flat = planes.reshape(b, 4, n_rows * 128)
    j = jnp.arange(_CAP, dtype=jnp.int32)
    pos = lo[:, :, :9, None] + j  # [B, M, 9, CAP]
    valid = pos < hi[:, :, :9, None]
    pos = jnp.clip(pos, 0, n_rows * 128 - 1).reshape(b, 1, -1)
    cand = jnp.take_along_axis(flat, jnp.broadcast_to(pos, (b, 4, pos.shape[-1])),
                               axis=2)
    cand = cand.reshape(b, 4, m, 9 * _CAP)
    d2 = ((cand[:, 0] - cent[:, :, 0:1]) ** 2
          + (cand[:, 1] - cent[:, :, 1:2]) ** 2
          + (cand[:, 2] - cent[:, :, 2:3]) ** 2)
    ok = valid.reshape(b, m, 9 * _CAP) & (d2 < r2)
    return jnp.where(ok, -(cand[:, 3] + 1.0), jnp.float32(-(n_real + 1)))


def ball_query_grid(centers, points, radius, nsample, valid=None,
                    interpret=None):
    """Grid-accelerated exact ball query (see module docstring).

    Args:
        centers: [B, M, 3]; points: [B, N, 3]; valid: [B, N] bool.
        interpret: force (True) / forbid (False) Pallas interpret mode;
            None = Pallas on TPU, XLA-gather formulation elsewhere.

    Returns:
        (idx [B, M, nsample] int32, overflow scalar int32): `overflow` is
        the worst `range_len - cap` over all (center, offset) ranges; > 0
        means some candidates were dropped and results may deviate from the
        brute-force op for the affected centers.
    """
    b, n, _ = points.shape
    m = centers.shape[1]
    assert n < 2 ** 20, "lo*2048 SMEM packing overflows int32 beyond 1M points"
    # index selection is non-differentiable (the reference CUDA op has no
    # grad either); pallas_call has no JVP rule, so cut the tangent path
    points = jax.lax.stop_gradient(points)
    centers = jax.lax.stop_gradient(centers)
    if valid is None:
        valid = jnp.ones((b, n), bool)
    inv = 1.0 / radius
    origin = jnp.min(jnp.where(valid[..., None], points, 1e9), axis=1)
    hi_cell = jnp.array([GX - 1, GY - 1, GZ - 1], jnp.int32)

    def cellof(xyz):
        c = jnp.floor((xyz - origin[:, None, :]) * inv).astype(jnp.int32)
        return jnp.clip(c, 0, hi_cell)

    pc = cellof(points)
    key = ((pc[..., 0] * GY + pc[..., 1]) * GZ + pc[..., 2]).astype(jnp.uint32)
    key = jnp.where(valid, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key, axis=1)
    skey = jnp.take_along_axis(key, order, axis=1)

    # sorted planes, padded to full 128-lane rows (+1 spill row so the
    # kernel's [r0, r0+2) sublane slice never leaves the array). Pad coords
    # are huge -> the exact d2 test rejects them.
    pad = (-n) % 128 + 128
    pack = jnp.concatenate(
        [points, jnp.arange(n, dtype=jnp.float32)[None, :, None].repeat(b, 0)],
        axis=-1)
    spack = jnp.take_along_axis(pack, order[..., None], axis=1)
    spack = jnp.pad(spack, ((0, 0), (0, pad), (0, 0)), constant_values=1e9)
    n_rows = (n + pad) // 128
    planes = spack.reshape(b, n_rows, 128, 4).transpose(0, 3, 1, 2)

    # centers sorted by their own cell key: searchsorted queries become
    # monotone per segment (tight Pallas chunk ranges) and consecutive
    # kernel iterations touch nearby rows
    cc = cellof(centers)
    ckey = ((cc[..., 0] * GY + cc[..., 1]) * GZ + cc[..., 2]).astype(jnp.uint32)
    corder = jnp.argsort(ckey, axis=1)
    cc = jnp.take_along_axis(cc, corder[..., None], axis=1)
    cent_s = jnp.take_along_axis(centers, corder[..., None], axis=1)

    offs = np.array([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
                    np.int32)
    nx = cc[..., 0:1] + offs[None, None, :, 0]
    ny = cc[..., 1:2] + offs[None, None, :, 1]
    nz0 = jnp.maximum(cc[..., 2:3] - 1, 0)
    nz1 = jnp.minimum(cc[..., 2:3] + 2, GZ)
    inb = (nx >= 0) & (nx < GX) & (ny >= 0) & (ny < GY)
    base = ((nx * GY + ny) * GZ + nz0).astype(jnp.uint32)
    stop = ((nx * GY + ny) * GZ + nz1).astype(jnp.uint32)
    q = jnp.stack([base, stop], axis=-1).reshape(b, m, 18)
    q = jnp.where(jnp.repeat(inb, 2, axis=-1), q, jnp.uint32(0xFFFFFFFF))
    # each (base, stop) pair spans one 3-cell column -> shared key range
    pos = searchsorted_segments(skey, q, layout="ms", interpret=interpret,
                                group_size=2)
    lo = pos[..., 0::2]
    hi = jnp.where(inb, pos[..., 1::2], lo)  # [B, M, 9]
    overflow = jnp.max(hi - lo) - _CAP

    use_pallas = interpret is True or (
        interpret is None and jax.default_backend() == "tpu")
    if use_pallas:
        pad_m = (-m) % (512 if m >= 512 else 8)
        lo_p, hi_p, cent_p = lo, hi, cent_s
        if pad_m:
            lo_p = jnp.pad(lo, ((0, 0), (0, pad_m), (0, 0)))
            hi_p = jnp.pad(hi, ((0, 0), (0, pad_m), (0, 0)))
            cent_p = jnp.pad(cent_s, ((0, 0), (0, pad_m), (0, 0)))
        mp = m + pad_m
        # 8-centers-per-row SMEM packing (see _scores_pallas docstring):
        # value = lo * 2048 + n_live (n_live saturated; > cap behaves the
        # same as == cap+1 for the lane mask)
        n_live = jnp.clip(hi_p - lo_p, 0, 2047)
        lohi = (lo_p * 2048 + n_live).astype(jnp.int32)
        lohi = jnp.pad(lohi, ((0, 0), (0, 0), (0, 7))).reshape(b, mp // 8, 128)
        centp = jnp.pad(cent_p, ((0, 0), (0, 0), (0, 13)),
                        )[:, :, :16]
        centp = jnp.roll(centp, 9, axis=-1).reshape(b, mp // 8, 128)
        scores = _scores_pallas(planes, lohi, centp,
                                r2=float(radius) ** 2, n_real=n,
                                interpret=bool(interpret))[:, :m]
    else:
        lo16 = jnp.pad(lo, ((0, 0), (0, 0), (0, 7)))
        hi16 = jnp.pad(hi, ((0, 0), (0, 0), (0, 7)))
        cent4 = jnp.pad(cent_s, ((0, 0), (0, 0), (0, 1)))
        scores = _scores_xla(planes, lo16, hi16, cent4,
                             r2=float(radius) ** 2, n_real=n)

    k = min(nsample, scores.shape[-1])
    vals, _ = jax.lax.approx_max_k(scores, k, recall_target=1.0)
    picked = (-vals).astype(jnp.int32) - 1  # hits in [0, n); miss -> n
    picked = jnp.where(picked < 0, n, picked)
    if nsample > k:
        picked = jnp.pad(picked, ((0, 0), (0, 0), (0, nsample - k)),
                         constant_values=n)
    first = picked[..., :1]
    idx = jnp.where(picked >= n, first, picked)
    idx = jnp.where(first >= n, 0, idx)

    # undo the center sort
    inv_ord = jnp.argsort(corder, axis=1)
    idx = jnp.take_along_axis(idx, inv_ord[..., None], axis=1)
    return idx.astype(jnp.int32), overflow
