"""TPU Pallas searchsorted for kernel-map construction.

XLA's `searchsorted` costs ~150ns/query on TPU (17 serial gather rounds);
kernel-map building (millions of queries per conv) dominated the FCAF3D
forward. This kernel exploits that kmap queries arrive in *nearly-sorted
segments* (each kernel offset shifts the sorted output keys by a constant):

1. XLA precomputes, per query chunk of T, the key range [start, end) that
   can contain its answers (two cheap searchsorteds over chunk min/max —
   correct for ANY query order; tight when segments are sorted). Bounds
   are clamped to the valid-key prefix so SENTINEL padding queries (up to
   half of a budgeted map's rows) cost nothing instead of walking the
   sentinel tail.
2. The whole key array lives in VMEM (sparse maps have <=64k keys =
   256KB, far under the ~16MB VMEM): the Pallas kernel walks the chunk's
   key range in L-key rows and counts `key < query` with [T, L] vector
   compares — no DMA windows, no gathers. `idx = start + count`, exactly
   `searchsorted(..., side='left')`. Per-row stream counts are reduced by
   ONE MXU dot against a static block-diagonal ones matrix (VPU cross-lane
   reductions were the dominant cost).
3. Queries are segments-minor ([B, M, S], segments on lanes): hot callers
   generate and consume that layout directly (XLA fuses it into the
   producers), each segment's column is a static (T, 1) lane slice in the
   kernel, and no transpose exists anywhere on the path.

Falls back to `jnp.searchsorted` off-TPU (and under interpret-mode tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import os

T_QUERIES = int(os.environ.get("FCAF3D_SEARCH_T", "512"))  # queries per chunk
L_KEYS = int(os.environ.get("FCAF3D_SEARCH_L", "128"))  # keys per compare row


def _make_kernel(miss_val: int, gsz: int, n_groups: int, t_q: int):
    """miss_val < 0 -> plain searchsorted positions; miss_val >= 0 -> hit-
    verified lookup: rows whose query has no exact key match (or is the
    SENTINEL) return `miss_val` instead of the insertion position. The
    equality count rides the same compare rows, replacing the separate
    hit-check gather (`take_along_axis(keys, idx) == q`, ~2GB/s on TPU)
    that was the single largest cost of the round-1 forward pass.

    `gsz` consecutive segments share one key range (their chunk bounds are
    unioned by the caller): kmap z-stream ladders and interpolation corner
    pairs have near-identical ranges, so one range walk serves the group."""

    def _kernel(starts_ref, ends_ref, keys_ref, q_ref, out_ref):
        from jax.experimental import pallas as pl

        b = pl.program_id(0)
        c = pl.program_id(1)
        n_chunks = pl.num_programs(1)
        sent = jnp.uint32(0xFFFFFFFF)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, L_KEYS), 1)
        # static block-diagonal ones [gsz*L, gsz]: the per-stream lane
        # reduction of the compare matrices becomes ONE MXU dot (VPU
        # cross-lane reductions per row were the kernel's dominant cost)
        blk = (
            jax.lax.broadcasted_iota(jnp.int32, (gsz * L_KEYS, gsz), 0)
            // L_KEYS
            == jax.lax.broadcasted_iota(jnp.int32, (gsz * L_KEYS, gsz), 1)
        ).astype(jnp.bfloat16)

        for g in range(n_groups):
            flat0 = (b * n_groups + g) * n_chunks + c
            start = starts_ref[flat0]
            end = ends_ref[flat0]
            s0 = g * gsz
            # (T, 1) lane slices of the pre-transposed query block
            qTs = [q_ref[0, 0, :, s0 + k: s0 + k + 1] for k in range(gsz)]

            r0 = start // L_KEYS
            n_rows = pl.cdiv(end - r0 * L_KEYS, L_KEYS)

            def row_body(i, carry):
                cnt_lt, cnt_eq = carry
                kw = keys_ref[0, pl.ds(r0 + i, 1), :]  # (1, L)
                # mask keys below `start` in the first (unaligned) row;
                # keys at/after `end` are > every query in the group by
                # construction, so no upper mask is needed
                pos = (r0 + i) * L_KEYS + col
                kw = jnp.where(pos >= start, kw, sent)
                lt = jnp.concatenate(
                    [(kw < q).astype(jnp.bfloat16) for q in qTs], axis=1
                )  # (T, gsz*L)
                cnt_lt = cnt_lt + jax.lax.dot_general(
                    lt, blk, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if miss_val >= 0:
                    eq = jnp.concatenate(
                        [(kw == q).astype(jnp.bfloat16) for q in qTs], axis=1
                    )
                    cnt_eq = cnt_eq + jax.lax.dot_general(
                        eq, blk, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                return cnt_lt, cnt_eq

            zeros = (jnp.zeros((t_q, gsz), jnp.float32),) * 2
            cnt_lt, cnt_eq = jax.lax.fori_loop(0, n_rows, row_body, zeros)
            cnt_lt = cnt_lt.astype(jnp.int32)
            for k in range(gsz):
                idx = start + cnt_lt[:, k: k + 1]
                if miss_val >= 0:
                    # any exact match in range <=> the query is present
                    hit = (cnt_eq[:, k: k + 1] > 0.5) & (qTs[k] != sent)
                    idx = jnp.where(hit, idx, miss_val)
                out_ref[0, 0, :, s0 + k: s0 + k + 1] = idx

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "miss_val", "group_size", "n_segs"))
def _searchsorted_pallas(keys, queries_t, starts, ends, interpret=False,
                         miss_val=-1, group_size=1, n_segs=None):
    """keys: [B, NR, L]; queries_t: [B, C, T, Sp] (chunked, segments minor,
    lane-padded); n_segs = real segment count (<= Sp)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, n_chunks, t_q, sp = queries_t.shape
    segs = n_segs if n_segs is not None else sp
    nr = keys.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, n_chunks),
        in_specs=[
            # whole key array VMEM-resident, reloaded per batch row only
            pl.BlockSpec((1, nr, L_KEYS), lambda b, c, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_q, sp), lambda b, c, *_: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, t_q, sp), lambda b, c, *_: (b, c, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _make_kernel(miss_val, group_size, segs // group_size, t_q),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(queries_t.shape, jnp.int32),
        interpret=interpret,
    )(starts.reshape(-1), ends.reshape(-1), keys, queries_t)


def searchsorted_segments(keys, queries, interpret=None, with_miss=False,
                          group_size=1, layout="sm"):
    """Per-sample searchsorted(side='left') of segmented query arrays.

    Args:
        keys: [B, N] ascending uint32 per sample (SENTINEL padding at end).
        queries: [B, S, M] uint32 (layout="sm") or [B, M, S] (layout="ms");
            each segment's M values should be roughly ascending for
            performance (correct regardless). Prefer "ms" on hot paths:
            segments land on TPU lanes, so neither the queries nor the
            results are transposed (callers generate/consume [B, M, S]
            directly and XLA fuses the layout into producers).
        with_miss: if True, return hit-verified indices — rows whose query is
            not present in `keys` (or equals the SENTINEL) come back as N.
            The equality test rides the same compare rows, so it is free
            compared to a separate `take_along_axis` hit check.
        group_size: segments per shared key range (must divide S); use
            when consecutive segments have near-identical key ranges (z-
            stream ladders, interpolation corner pairs) to amortize the
            per-chunk range walk.

    Returns:
        idx: int32 in [0, N], same shape/layout as `queries` (with_miss: N
        means miss; else the plain insertion position).
    """
    bsz, n = keys.shape
    if layout == "sm":
        _, segs, m = queries.shape
    else:
        _, m, segs = queries.shape

    use_pallas = interpret is True or (
        interpret is None and jax.default_backend() == "tpu"
    )
    if not use_pallas:
        flat = queries.reshape(bsz, -1)
        idx = jax.vmap(lambda k, q: jnp.searchsorted(k, q, side="left"))(keys, flat)
        idx = idx.astype(jnp.int32)
        if with_miss:
            sent = np.uint32(0xFFFFFFFF)
            safe = jnp.minimum(idx, n - 1)
            hit = (jnp.take_along_axis(keys, safe, axis=1) == flat) & (
                flat != sent
            )
            idx = jnp.where(hit, safe, n)
        return idx.reshape(queries.shape)

    q = queries if layout == "ms" else jnp.swapaxes(queries, 1, 2)
    pad = (-m) % T_QUERIES
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)),
                    constant_values=np.uint32(0xFFFFFFFF))
    key_pad = (-n) % L_KEYS
    if key_pad:
        # sentinel-pad keys to full rows; sentinels never compare below any
        # query so counts are unchanged
        keys = jnp.pad(
            keys, ((0, 0), (0, key_pad)), constant_values=np.uint32(0xFFFFFFFF)
        )
    assert segs % group_size == 0, (segs, group_size)
    mp = q.shape[1]
    n_chunks = mp // T_QUERIES
    chunks = q.reshape(bsz, n_chunks, T_QUERIES, segs)
    cmin = jnp.min(chunks, axis=2)  # [B, C, S]
    cmax = jnp.max(chunks, axis=2)
    if group_size > 1:
        # the kernel unions bounds across each group anyway; narrowing at
        # group granularity cuts the searchsorted count group_size-fold
        gshape = (bsz, n_chunks, segs // group_size, group_size)
        cmin = jnp.min(cmin.reshape(gshape), axis=3)
        cmax = jnp.max(cmax.reshape(gshape), axis=3)
    # key range per chunk via the (cheap) generic searchsorted; the kernel
    # indexes bounds as [(b, g, c)] so transpose the (tiny) bound arrays
    lo = jax.vmap(lambda k, v: jnp.searchsorted(k, v, side="left"))(
        keys, cmin.reshape(bsz, -1)
    ).astype(jnp.int32)
    hi = jax.vmap(lambda k, v: jnp.searchsorted(k, v, side="right"))(
        keys, cmax.reshape(bsz, -1)
    ).astype(jnp.int32)
    # clamp to the valid-key prefix: SENTINEL queries (padding rows — up to
    # half of a budgeted map) otherwise drag their chunk's range over the
    # whole sentinel tail. Sentinel keys never compare below any query, and
    # sentinel queries' results are don't-care (consumers mask them), so
    # clamping changes no used output.
    n_valid = jnp.sum(keys != np.uint32(0xFFFFFFFF), axis=1).astype(jnp.int32)
    lo = jnp.minimum(lo, n_valid[:, None])
    hi = jnp.minimum(hi, n_valid[:, None])
    n_groups = segs // group_size
    lo = jnp.swapaxes(lo.reshape(bsz, n_chunks, n_groups), 1, 2)
    hi = jnp.swapaxes(hi.reshape(bsz, n_chunks, n_groups), 1, 2)
    # pad the segment (lane) dim to a full 128-lane register: un-padded
    # minor dims make every block copy a strided per-row transfer
    s_pad = (-segs) % 128 if os.environ.get("FCAF3D_SEARCH_SPAD", "1") != "0" else 0
    if s_pad:
        chunks = jnp.pad(chunks, ((0, 0), (0, 0), (0, 0), (0, s_pad)),
                         constant_values=np.uint32(0xFFFFFFFF))
    idx = _searchsorted_pallas(
        keys.reshape(bsz, -1, L_KEYS), chunks, lo, hi,
        interpret=bool(interpret),
        miss_val=n if with_miss else -1, group_size=group_size,
        n_segs=segs,
    )[..., :segs].reshape(bsz, mp, segs)
    if pad:
        idx = idx[:, :m]
    return idx if layout == "ms" else jnp.swapaxes(idx, 1, 2)
