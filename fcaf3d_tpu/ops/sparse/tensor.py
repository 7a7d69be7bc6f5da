"""Batched static-shape sparse voxel tensor for TPU.

This is the TPU-native replacement for MinkowskiEngine's `SparseTensor` +
coordinate manager (reference usage: `/root/reference/mmdet3d/models/
detectors/single_stage_sparse.py:34-37`, `backbones/me_resnet.py`,
`dense_heads/fcaf3d_neck_with_head.py`). Design differences, driven by
XLA's static-shape compilation model:

- Every coordinate map has a *fixed row budget* `N`; real voxels occupy a
  prefix-dense subset marked valid, padding rows carry a sentinel key.
- Coordinates are per-sample (batch is a leading dim, not a batch column)
  and are kept *sorted by a packed uint32 key*, so neighbor lookup is a
  vectorized binary search (`jnp.searchsorted`) instead of a hash map.
- Quantized coords are shifted non-negative per sample and bounded to a
  (2047, 2048, 1024) grid — 20.5m x 20.5m x 10.2m at 1cm voxels, ample for
  the indoor datasets; the shift is carried so metric positions can be
  recovered exactly.

Coordinate/key invariants:
- `coords[b, i]` are multiples of `stride` (raw lattice units).
- `keys[b]` is ascending; padding rows have `keys == SENTINEL` and coords
  equal to the (out-of-range) extent so any derived query also misses.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

import numpy as np

# bit budget: x:11, y:11, z:10 -> exactly 32 bits
X_BITS, Y_BITS, Z_BITS = 11, 11, 10
# x is capped one short so the all-ones SENTINEL can never be a valid key
EXTENT = (2 ** X_BITS - 1, 2 ** Y_BITS, 2 ** Z_BITS)  # (2047, 2048, 1024)
# NOTE: numpy scalar, NOT a jnp array — a device-array constant captured in
# jitted code forces a device-to-host fetch at lowering time, and the first
# D2H in a process costs minutes through the axon TPU tunnel.
SENTINEL = np.uint32(0xFFFFFFFF)


@struct.dataclass
class SparseTensor:
    """Batched sparse voxel tensor (see module docstring for invariants)."""

    coords: jnp.ndarray  # [B, N, 3] int32
    feats: jnp.ndarray  # [B, N, C]
    keys: jnp.ndarray  # [B, N] uint32, ascending per sample (if sorted)
    shift: jnp.ndarray  # [B, 3] int32; original_voxel = coords - shift
    stride: int = struct.field(pytree_node=False, default=1)
    # generated child maps can stay in parent-major order (analytic kernel
    # maps don't need binary search); such tensors must not be used with
    # `lookup` until re-sorted (e.g. by sparse_union_add)
    is_sorted: bool = struct.field(pytree_node=False, default=True)
    # overflow telemetry: [B] int32 count of valid voxels dropped when THIS
    # coordinate map was built because the row budget was too small (the
    # reference's dynamic maps never drop, so any nonzero count flags a
    # mis-calibrated budget). None = exact map (no compaction happened).
    dropped: Optional[jnp.ndarray] = None

    @property
    def batch_size(self) -> int:
        return self.coords.shape[0]

    @property
    def capacity(self) -> int:
        return self.coords.shape[1]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]

    @property
    def valid(self) -> jnp.ndarray:  # [B, N] bool
        return self.keys != SENTINEL

    def num_valid(self) -> jnp.ndarray:  # [B]
        return jnp.sum(self.valid, axis=-1)

    def positions(self, voxel_size: float) -> jnp.ndarray:
        """Metric positions [B, N, 3] of each voxel (the reference's
        `decomposed_coordinates * voxel_size`, `fcaf3d_neck_with_head.py:275-277`)."""
        return (self.coords - self.shift[:, None, :]).astype(jnp.float32) * voxel_size

    def with_feats(self, feats: jnp.ndarray) -> "SparseTensor":
        return self.replace(feats=feats)


def encode_coords(coords: jnp.ndarray) -> jnp.ndarray:
    """Pack int32 coords [..., 3] into sortable uint32 keys; OOB -> SENTINEL."""
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    in_range = (
        (x >= 0)
        & (x < EXTENT[0])
        & (y >= 0)
        & (y < EXTENT[1])
        & (z >= 0)
        & (z < EXTENT[2])
    )
    key = (
        (x.astype(jnp.uint32) << (Y_BITS + Z_BITS))
        | (y.astype(jnp.uint32) << Z_BITS)
        | z.astype(jnp.uint32)
    )
    return jnp.where(in_range, key, SENTINEL)


def batched_scatter_set(target: jnp.ndarray, pos: jnp.ndarray, values: jnp.ndarray):
    """vmap of per-sample `target.at[pos].set(values)` over the leading batch
    dim. Using vmapped scatters (instead of explicit `arange(B)` index
    columns) keeps the batch dimension a true scatter batching dim, which
    the SPMD partitioner shards without inserting all-gathers."""
    return jax.vmap(lambda t, p, v: t.at[p].set(v))(target, pos, values)


def batched_scatter_add(target: jnp.ndarray, pos: jnp.ndarray, values: jnp.ndarray):
    return jax.vmap(lambda t, p, v: t.at[p].add(v))(target, pos, values)


def decode_coords(keys: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `encode_coords`: unpack keys to coords with pure bit ops.
    SENTINEL rows decode to EXTENT (the padding-coord convention), so for
    any (coords, keys) pair built by `encode_coords` + the EXTENT masking,
    `decode_coords(keys) == coords` exactly — which turns every post-sort
    coord reorder into elementwise unpacking of the already-sorted keys
    instead of a [B, N, 3] row gather (the three largest fusions of the r5
    batch-8 inference trace, ~60 ms/fwd, were exactly these gathers)."""
    x = (keys >> (Y_BITS + Z_BITS)).astype(jnp.int32)
    y = ((keys >> Z_BITS) & (2 ** Y_BITS - 1)).astype(jnp.int32)
    z = (keys & (2 ** Z_BITS - 1)).astype(jnp.int32)
    c = jnp.stack([x, y, z], axis=-1)
    return jnp.where((keys == SENTINEL)[..., None],
                     jnp.asarray(EXTENT, jnp.int32), c)


def sort_rows(coords: jnp.ndarray, feats: Optional[jnp.ndarray], keys: jnp.ndarray):
    """Sort rows of a batched (coords, feats, keys) triplet by key (stable).

    Keys and the permutation come out of ONE stable `lax.sort` (no argsort
    + key re-gather), and coords are recovered by `decode_coords` — callers
    maintain the coords == decode(keys) invariant (coords are always built
    via `encode_coords` with EXTENT padding)."""
    b, n = keys.shape
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    skeys, order = jax.lax.sort((keys, iota), num_keys=1, is_stable=True)
    coords = decode_coords(skeys)
    if feats is not None:
        feats = jnp.take_along_axis(feats, order[..., None], axis=1)
    return coords, feats, skeys


def compact_positions(mask: jnp.ndarray, budget: int):
    """Source row of the j-th set bit of `mask`, for j < budget.

    The gather-side inverse of cumsum-position compaction: instead of
    scattering N source rows to their compacted slots (row scatters
    serialize at ~10 ns/row on TPU — the largest fusion bucket of the r5
    inference trace), ONE searchsorted over the running count gives every
    output slot its source row, and callers GATHER `budget` rows (~4x
    cheaper than the scatter at typical N/budget, measured on v5e).

    Returns:
        (sel [B, budget] int32 monotone, N where the j-th set bit does not
        exist; total [B] int32 set-bit count).
    """
    from .search import searchsorted_segments

    b, n = mask.shape
    csum = jnp.cumsum(mask.astype(jnp.int32), axis=1)
    total = csum[:, -1]
    q = jnp.broadcast_to(
        jnp.arange(1, budget + 1, dtype=jnp.uint32)[None, :, None],
        (b, budget, 1),
    )
    # first i with csum[i] >= j+1  ==  searchsorted(csum, j+1, 'left')
    sel = searchsorted_segments(
        csum.astype(jnp.uint32), q, with_miss=False, layout="ms"
    ).reshape(b, budget)
    return jnp.minimum(sel, n).astype(jnp.int32), total


def take_rows(values: jnp.ndarray, sel: jnp.ndarray, fill=0):
    """values[b, sel[b, j]] with sel == N returning `fill`."""
    b, n = values.shape[:2]
    pad = jnp.full((b, 1) + values.shape[2:], fill, values.dtype)
    vpad = jnp.concatenate([values, pad], axis=1)
    idx = sel[(...,) + (None,) * (values.ndim - 2)]
    return jnp.take_along_axis(vpad, idx, axis=1)


def compact_unique(coords: jnp.ndarray, keys: jnp.ndarray, budget: int):
    """Deduplicate sorted (coords, keys) to the first occurrence per key and
    compact into a `budget`-row array (overflow rows are dropped).

    Args:
        coords: [B, N, 3] sorted by keys, satisfying the module invariant
            `coords == decode_coords(keys)` (all callers build coords via
            `encode_coords` + EXTENT padding); output coords are decoded
            from the compacted keys rather than gathered.
        keys: [B, N] ascending.
        budget: output rows per sample.

    Returns:
        (coords [B, budget, 3], keys [B, budget], src_idx [B, budget],
        dropped [B]) where src_idx maps each output row to its source row
        (budget-filled with N for padding rows) and dropped counts unique
        keys lost to the budget (overflow telemetry).
    """
    b, n = keys.shape
    prev = jnp.concatenate([jnp.full((b, 1), SENTINEL, keys.dtype), keys[:, :-1]], axis=1)
    first = (keys != prev) & (keys != SENTINEL)
    sel, total = compact_positions(first, budget)  # sel == src_idx
    dropped = jnp.maximum(total - budget, 0).astype(jnp.int32)
    out_keys = take_rows(keys, sel, fill=SENTINEL)
    return decode_coords(out_keys), out_keys, sel, dropped


def lookup(
    keys_sorted: jnp.ndarray, queries: jnp.ndarray, segments: bool = False,
    group_size: int = 1,
) -> jnp.ndarray:
    """Find rows of `queries` in per-sample sorted key arrays.

    Args:
        keys_sorted: [B, N] ascending uint32 (SENTINEL padding at the end).
        queries: [B, ...] uint32. With segments=True, shape [B, M, S]
            (segments minor — they land on TPU lanes) where each segment's
            [M] column is roughly ascending (drives the TPU kernel's
            windowing; correctness never depends on it).

    Returns:
        idx: [B, ...] int32 in [0, N]; N means miss (callers use row N as a
        zero-feature dump row).
    """
    from .search import searchsorted_segments

    b, n = keys_sorted.shape
    q_shape = queries.shape
    q3 = queries if segments and queries.ndim == 3 else queries.reshape(b, -1, 1)
    # hit verification happens inside the search kernel (with_miss): a
    # separate `take_along_axis(keys, idx) == q` gather ran at ~2GB/s on TPU
    # and dominated the round-1 forward pass
    idx = searchsorted_segments(
        keys_sorted, q3, with_miss=True, group_size=group_size, layout="ms")
    return idx.reshape(q_shape)


def voxelize(
    points: jnp.ndarray,
    features: jnp.ndarray,
    valid: jnp.ndarray,
    voxel_size: float,
    budget: int,
    margin: int = 64,
) -> SparseTensor:
    """Quantize a padded point batch into a stride-1 SparseTensor.

    TPU-native equivalent of `ME.utils.batch_sparse_collate`
    (`single_stage_sparse.py:34-37`): floor-quantize, per-sample shift to a
    non-negative bounded grid, deduplicate keeping the *first* point of each
    voxel (ME's insertion-order rule), compact to `budget` rows.

    Args:
        points: [B, P, 3] float metric coordinates.
        features: [B, P, C].
        valid: [B, P] bool.
        voxel_size: quantization in meters.
        budget: voxel capacity per sample.
        margin: headroom so negative conv offsets never wrap (also keeps all
            strided lattices aligned across samples).
    """
    q = jnp.floor(points / voxel_size).astype(jnp.int32)
    big = jnp.int32(1 << 20)
    q_masked = jnp.where(valid[..., None], q, big)
    qmin = jnp.min(q_masked, axis=1)  # [B, 3]
    shift = margin - qmin
    coords = q + shift[:, None, :]
    coords = jnp.where(valid[..., None], coords, jnp.asarray(EXTENT, jnp.int32))
    keys = encode_coords(coords)
    keys = jnp.where(valid, keys, SENTINEL)

    # sort keys+permutation in one stable lax.sort; sorted coords come from
    # bit-decoding the sorted keys (decode_coords) — no [B, P, 3] gather.
    # Features are gathered ONCE at the end by composing src through order.
    b_, p_ = keys.shape
    iota = jnp.broadcast_to(jnp.arange(p_, dtype=jnp.int32)[None], (b_, p_))
    keys, order = jax.lax.sort((keys, iota), num_keys=1, is_stable=True)
    coords = decode_coords(keys)
    out_coords, out_keys, src, dropped = compact_unique(coords, keys, budget)
    p = order.shape[1]
    order_pad = jnp.concatenate(
        [order, jnp.full((order.shape[0], 1), p, order.dtype)], axis=1
    )
    src_orig = jnp.take_along_axis(order_pad, src, axis=1)  # [B, budget] in [0, P]
    bpad = jnp.concatenate(
        [features, jnp.zeros_like(features[:, :1])], axis=1
    )  # row P = zeros for padding rows
    out_feats = jnp.take_along_axis(bpad, src_orig[..., None], axis=1)
    return SparseTensor(
        coords=out_coords, feats=out_feats, keys=out_keys, shift=shift, stride=1,
        dropped=dropped,
    )


def voxelize_reduce(
    points: jnp.ndarray,
    features: jnp.ndarray,
    valid: jnp.ndarray,
    voxel_size: float,
    budget: int,
    reduce: str = "mean",
    margin: int = 64,
) -> SparseTensor:
    """Voxelize with a mean/max reduction over each voxel's points.

    TPU-native `DynamicScatter` (reference `mmdet3d/ops/voxel/
    scatter_points.py:9-105`, `dynamic_scatter` CUDA op): every valid point
    contributes to its voxel's feature instead of `voxelize`'s
    first-point-wins ME rule. Implemented as a segment reduction over the
    key-sorted rows (each voxel's points are contiguous after the sort).

    Args:
        points: [B, P, 3] float metric coordinates.
        features: [B, P, C].
        valid: [B, P] bool.
        reduce: "mean" or "max".
    """
    if reduce not in ("mean", "max"):
        raise ValueError(f"reduce must be mean|max, got {reduce!r}")
    q = jnp.floor(points / voxel_size).astype(jnp.int32)
    big = jnp.int32(1 << 20)
    qmin = jnp.min(jnp.where(valid[..., None], q, big), axis=1)
    shift = margin - qmin
    coords = jnp.where(valid[..., None], q + shift[:, None, :],
                       jnp.asarray(EXTENT, jnp.int32))
    keys = jnp.where(valid, encode_coords(coords), SENTINEL)

    order = jnp.argsort(keys, axis=-1, stable=True)
    coords = jnp.take_along_axis(coords, order[..., None], axis=1)
    keys = jnp.take_along_axis(keys, order, axis=1)
    feats = jnp.take_along_axis(features, order[..., None], axis=1)

    out_coords, out_keys, _, dropped = compact_unique(coords, keys, budget)
    # segment id of EVERY row = its voxel's output slot (cumsum of firsts);
    # rows of overflow/padding voxels land in dump slot `budget`
    b, n = keys.shape
    prev = jnp.concatenate(
        [jnp.full((b, 1), SENTINEL, keys.dtype), keys[:, :-1]], axis=1)
    first = (keys != prev) & (keys != SENTINEL)
    seg = jnp.cumsum(first, axis=1) - 1
    seg = jnp.where((keys != SENTINEL) & (seg >= 0) & (seg < budget),
                    seg, budget)
    if reduce == "mean":
        acc = jnp.zeros((b, budget + 1, feats.shape[-1]), feats.dtype)
        acc = batched_scatter_add(acc, seg, feats)
        cnt = jnp.zeros((b, budget + 1), jnp.int32)
        cnt = batched_scatter_add(cnt, seg, jnp.ones((b, n), jnp.int32))
        out_feats = acc[:, :budget] / jnp.maximum(cnt[:, :budget, None], 1)
    else:
        neg = jnp.finfo(feats.dtype).min
        acc = jnp.full((b, budget + 1, feats.shape[-1]), neg, feats.dtype)
        acc = jax.vmap(lambda t, p, v: t.at[p].max(v))(acc, seg, feats)
        out_feats = jnp.where(out_keys[..., None] != SENTINEL,
                              acc[:, :budget], 0)
    return SparseTensor(
        coords=out_coords, feats=out_feats, keys=out_keys, shift=shift,
        stride=1, dropped=dropped,
    )


def downsample_coords(st: SparseTensor, factor: int, budget: int):
    """Output coordinate map of a strided (conv/pool) op.

    ME semantics: output coords = unique(floor(c / new_stride) * new_stride)
    on the coarser lattice.

    Returns:
        (coords [B, budget, 3], keys [B, budget], dropped [B]) sorted by key.
    """
    new_stride = st.stride * factor
    c = (st.coords // new_stride) * new_stride
    c = jnp.where(st.valid[..., None], c, jnp.asarray(EXTENT, jnp.int32))
    keys = encode_coords(c)
    keys = jnp.where(st.valid, keys, SENTINEL)
    c, _, keys = sort_rows(c, None, keys)
    out_coords, out_keys, _, dropped = compact_unique(c, keys, budget)
    return out_coords, out_keys, dropped
