"""Ops for the prune-early GSDN neck (TPU-native redesign).

The reference neck (`/root/reference/mmdet3d/models/dense_heads/
fcaf3d_neck_with_head.py:94-126`) runs, per level: generative transpose
(8 children per parent) -> BN/ELU -> conv3 -> BN/ELU on ALL 8P children,
adds the lateral, then prunes to `pts_threshold` by the COARSER level's
interpolated classification score. Two structural facts make a much
cheaper ordering possible on TPU:

1. The prune mask depends only on child *coordinates* and the coarse
   scores — not on the up-block's features — so pruning can happen BEFORE
   the expensive conv3 (`_prune` interpolates `scores.features_at_
   coordinates(x.C)`, reference `:110-126`).
2. A child at slot bits o sits at fractional parent position o/2, so the
   trilinear interpolation weights are STATIC per slot: corner parents are
   `p + j` for bit subsets j <= o with weight 2^-popcount(o). The whole
   interpolation collapses into one `gather_gemm` over the parent's 27-
   neighbor kernel map with a constant [27, 8] weight table.

The lateral addition also simplifies: if every level's prune force-keeps
lateral-backed children, then (by induction over levels) every backbone
voxel's parent is present in the neck map above it, so the reference's
union-add degenerates to a scatter-add — no sort-merge.

These ops implement that flow; `Fcaf3DNeckWithHead(neck_mode="reference")`
keeps the reference ordering for checkpoint-parity experiments.
"""
from __future__ import annotations

import itertools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .conv import gather_gemm, kernel_offsets
from .tensor import (
    EXTENT,
    SENTINEL,
    SparseTensor,
    batched_scatter_add,
    batched_scatter_set,
    encode_coords,
    lookup,
    sort_rows,
)


def trilinear_slot_weights() -> np.ndarray:
    """[27, 8] table W[k, o]: weight of parent-offset k (kernel_offsets(3)
    order) in the trilinear interpolation at child slot o (kernel_offsets(2)
    order, x-major bits). Child frac = bits(o)/2, so corner j contributes
    iff j <= bits(o) elementwise, with weight 2^-popcount(bits(o))."""
    w = np.zeros((27, 8), np.float32)
    for o, bits in enumerate(itertools.product((0, 1), repeat=3)):
        bits = np.asarray(bits)
        weight = 0.5 ** bits.sum()
        for j in itertools.product((0, 1), repeat=3):
            j = np.asarray(j)
            if np.all(j <= bits):
                k = (j[0] + 1) * 9 + (j[1] + 1) * 3 + (j[2] + 1)
                w[k, o] = weight
    return w


_TRI_W = trilinear_slot_weights()


def child_prune_scores(
    parent_scores: jnp.ndarray, parent_kmap: jnp.ndarray
) -> jnp.ndarray:
    """Interpolated prune score of every generated child, parent-major.

    Args:
        parent_scores: [B, P, 1] coarse-level prune scores (absent
            neighbors contribute zero, matching ME's
            `features_at_coordinates`).
        parent_kmap: [B, P, 27] parent self kernel map.

    Returns:
        [B, 8P] scores in parent-major child order (row = p*8 + o).
    """
    w = jnp.asarray(_TRI_W).reshape(27, 1, 8).astype(parent_scores.dtype)
    out = gather_gemm(parent_scores, parent_kmap, w)  # [B, P, 8]
    b, p, _ = out.shape
    return out.reshape(b, 8 * p)


def threshold_select(
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    budget: int,
    must_keep: Optional[jnp.ndarray] = None,
    iters: int = 24,
) -> jnp.ndarray:
    """Top-`budget` selection by score WITHOUT an argsort.

    A k-row argsort costs milliseconds at neck sizes; a fixed-iteration
    binary search on the score threshold costs `iters` cheap reductions.
    Ties at the final threshold are broken by row order (deterministic).

    Returns keep mask [B, N] with per-sample popcount <= budget.
    """
    b, n = scores.shape
    if must_keep is None:
        must_keep = jnp.zeros_like(valid)
    must_keep = must_keep & valid
    if budget >= n:
        return valid

    cand = valid & ~must_keep
    s = scores.astype(jnp.float32)
    big = jnp.float32(3e38)
    n_must = jnp.sum(must_keep, axis=1)
    quota = jnp.maximum(budget - n_must, 0)  # [B] slots left for candidates

    lo = jnp.min(jnp.where(cand, s, big), axis=1) - 1.0
    hi = jnp.max(jnp.where(cand, s, -big), axis=1) + 1.0
    hi = jnp.maximum(hi, lo)  # no candidates -> empty range

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)  # count candidates strictly above mid
        cnt = jnp.sum(cand & (s > mid[:, None]), axis=1)
        gt = cnt > quota  # too many -> raise threshold
        return jnp.where(gt, mid, lo), jnp.where(gt, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    keep_hi = cand & (s > hi[:, None])  # <= quota rows
    n_hi = jnp.sum(keep_hi, axis=1)
    # fill remaining slots with boundary rows (s in (lo, hi]) in row order
    boundary = cand & (s > lo[:, None]) & ~keep_hi
    fill = jnp.cumsum(boundary, axis=1) <= (quota - n_hi)[:, None]
    return must_keep | keep_hi | (boundary & fill)


def compact_select(
    coords: jnp.ndarray,
    keys: jnp.ndarray,
    feats: Optional[jnp.ndarray],
    keep: jnp.ndarray,
    budget: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Compact kept rows (order-preserving) into `budget` rows.

    Gather-side formulation (see `tensor.compact_positions`): one
    searchsorted finds each output slot's source row; only `budget` rows
    are gathered (the old N-row scatters were the dominant fusion cost of
    the inference trace).

    Returns (coords, keys, feats, old2new) where old2new [B, N] maps source
    rows to compacted rows (budget = dropped/not-kept)."""
    from .tensor import compact_positions, take_rows

    b, n = keys.shape
    from .tensor import decode_coords

    sel, _ = compact_positions(keep, budget)
    out_keys = take_rows(jnp.where(keep, keys, SENTINEL), sel, fill=SENTINEL)
    # callers (gen_children) maintain coords == decode(keys): kept rows have
    # in-range keys, padding decodes to EXTENT — no coords gather needed
    out_coords = decode_coords(out_keys)
    del coords
    out_feats = None
    if feats is not None:
        out_feats = take_rows(feats, sel)
    pos = jnp.cumsum(keep, axis=1) - 1
    pos = jnp.where(keep & (pos < budget), pos, budget)
    return out_coords, out_keys, out_feats, pos


def sort_tensor(st: SparseTensor) -> SparseTensor:
    """Key-sort a SparseTensor's rows (padding sentinels sink to the end)."""
    coords, feats, keys = sort_rows(st.coords, st.feats, st.keys)
    return st.replace(coords=coords, feats=feats, keys=keys, is_sorted=True)


def gen_children(parent: SparseTensor, weight: jnp.ndarray):
    """Generative-transpose children, parent-major, WITHOUT materializing a
    SparseTensor: returns (coords [B, 8P, 3], keys [B, 8P], feats [B, 8P, E]).

    Same math as `generative_transpose_conv2x2(sort_output=False)`
    (ME `MinkowskiGenerativeConvolutionTranspose` k2 s2)."""
    child_stride = parent.stride // 2
    offs = kernel_offsets(2, child_stride)
    b, p = parent.coords.shape[:2]
    coords = parent.coords[:, :, None, :] + jnp.asarray(offs)[None, None, :, :]
    feats = jnp.einsum(
        "bnc,kcd->bnkd", parent.feats, weight,
        preferred_element_type=parent.feats.dtype,
    )
    coords = coords.reshape(b, p * 8, 3)
    feats = feats.reshape(b, p * 8, -1)
    pvalid = jnp.repeat(parent.valid, 8, axis=1)
    keys = jnp.where(pvalid, encode_coords(coords), SENTINEL)
    coords = jnp.where(pvalid[..., None], coords, jnp.asarray(EXTENT, jnp.int32))
    feats = jnp.where(pvalid[..., None], feats, 0.0)
    return coords, keys, feats


def lateral_child_rows(parent: SparseTensor, lateral: SparseTensor) -> jnp.ndarray:
    """Parent-major child row of every lateral voxel (8P = not found).

    A lateral voxel at stride S has parent floor(c / 2S) on the parent map;
    its generated child row is parent_row * 8 + slot(bits)."""
    two_s = parent.stride
    pc = (lateral.coords // two_s) * two_s
    pkeys = jnp.where(lateral.valid, encode_coords(pc), SENTINEL)
    prow = lookup(parent.keys, pkeys)  # [B, L] in [0, P]
    p = parent.capacity
    bits = (lateral.coords // (two_s // 2)) % 2  # {0,1} per dim
    slot = bits[..., 0] * 4 + bits[..., 1] * 2 + bits[..., 2]
    rows = prow * 8 + slot
    return jnp.where((prow < p) & lateral.valid, rows, 8 * p)
