"""TPU Pallas searchsorted for kernel-map construction.

XLA's `searchsorted` costs ~150ns/query on TPU (17 serial gather rounds);
kernel-map building (millions of queries per conv) dominated the FCAF3D
forward. This kernel exploits that kmap queries arrive in *nearly-sorted
segments* (each kernel offset shifts the sorted output keys by a constant):

1. XLA precomputes, per query chunk of T, the key range [start, end) that
   can contain its answers (two cheap searchsorteds over chunk min/max —
   correct for ANY query order; tight when segments are sorted).
2. The Pallas kernel DMA-streams W-wide key windows from HBM and counts
   `key < query` with an all-pairs [T, W] vector compare — no gathers.
   `idx = start + count`, exactly `searchsorted(..., side='left')`.

Falls back to `jnp.searchsorted` off-TPU (and under interpret mode tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

T_QUERIES = 512  # queries per chunk (span ~ T x density, so compare work ~ T^2)
W_KEYS = 1024  # key window per DMA (start 128-aligned for Mosaic slicing)
W_STEP = W_KEYS - 128  # effective advance per window (alignment slack)


def _make_kernel(miss_val: int, gsz: int):
    """miss_val < 0 -> plain searchsorted positions; miss_val >= 0 -> hit-
    verified lookup: rows whose query has no exact key match (or is the
    SENTINEL) return `miss_val` instead of the insertion position. Doing the
    equality test inside the window scan makes the separate hit-check gather
    (`take_along_axis(keys, idx) == q`, ~2GB/s on TPU) unnecessary — it was
    the single largest cost of the round-1 forward pass.

    `gsz` consecutive segments are processed per window (their chunk ranges
    are unioned): kmap z-stream ladders and interpolation corner pairs have
    near-identical ranges, so one DMA + bounds computation serves the whole
    group — the per-chunk fixed cost is the dominant term once windows are
    span-sized (chunk spans are ~T * density ratio ~ 140, far below even
    this 512-key window)."""

    def _kernel(starts_ref, ends_ref, keys_hbm, q_ref, out_ref, scratch, sem):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        b = pl.program_id(0)
        c = pl.program_id(1)
        n_chunks = pl.num_programs(1)
        segs = q_ref.shape[1]
        n_keys = keys_hbm.shape[2]  # padded to >= W_KEYS
        n_groups = segs // gsz

        def grp_body(g, _):
            s0 = g * gsz
            # bounds are precomputed at GROUP granularity
            flat0 = (b * n_groups + g) * n_chunks + c
            start = starts_ref[flat0]
            end = ends_ref[flat0]
            qs = [q_ref[0, s0 + k, :] for k in range(gsz)]  # each [T]
            qTs = [qq.reshape(T_QUERIES, 1) for qq in qs]

            n_pieces = pl.cdiv(end - start, W_STEP)

            def body(i, carry):
                lo = start + i * W_STEP
                hi = jnp.minimum(end, lo + W_STEP)
                # 128-aligned, in-bounds DMA window; masking recovers [lo, hi)
                piece = jnp.maximum(0, jnp.minimum(lo, n_keys - W_KEYS))
                piece = pl.multiple_of((piece // 128) * 128, 128)
                dma = pltpu.make_async_copy(
                    keys_hbm.at[b, pl.ds(0, 1), pl.ds(piece, W_KEYS)], scratch,
                    sem,
                )
                dma.start()
                dma.wait()
                kw = scratch[0, :]  # [W]
                pos = piece + jax.lax.broadcasted_iota(
                    jnp.int32, (1, W_KEYS), 1)[0]
                in_range = (pos >= lo) & (pos < hi)
                kw = jnp.where(in_range, kw, jnp.uint32(0xFFFFFFFF))
                kwr = kw.reshape(1, W_KEYS)
                new = []
                for k in range(gsz):
                    new.append(carry[len(new)] + jnp.sum(
                        (kwr < qTs[k]).astype(jnp.int32), axis=1))
                    if miss_val >= 0:
                        # count_le - count_lt > 0 <=> an exact match exists;
                        # masked-out positions are SENTINEL, and SENTINEL
                        # queries are rejected after the loop
                        new.append(carry[len(new)] + jnp.sum(
                            (kwr <= qTs[k]).astype(jnp.int32), axis=1))
                return tuple(new)

            stride = 2 if miss_val >= 0 else 1
            zeros = tuple(
                jnp.zeros((T_QUERIES,), jnp.int32)
                for _ in range(gsz * stride)
            )
            counts = jax.lax.fori_loop(0, n_pieces, body, zeros)
            for k in range(gsz):
                idx = start + counts[k * stride]
                if miss_val >= 0:
                    hit = (counts[k * stride + 1] > counts[k * stride]) & (
                        qs[k] != jnp.uint32(0xFFFFFFFF))
                    idx = jnp.where(hit, idx, miss_val)
                out_ref[0, s0 + k, :] = idx
            return 0

        jax.lax.fori_loop(0, n_groups, grp_body, 0)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "miss_val", "group_size"))
def _searchsorted_pallas(keys, queries, starts, ends, interpret=False,
                         miss_val=-1, group_size=1):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz = keys.shape[0]
    _, segs, m = queries.shape
    n_chunks = m // T_QUERIES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # keys stay in HBM
            pl.BlockSpec(
                (1, segs, T_QUERIES),
                lambda b, c, *_: (b, 0, c),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, segs, T_QUERIES),
            lambda b, c, *_: (b, 0, c),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((1, W_KEYS), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_kernel(miss_val, group_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(queries.shape, jnp.int32),
        interpret=interpret,
    )(starts.reshape(-1), ends.reshape(-1), keys, queries)


def searchsorted_segments(keys, queries, interpret=None, with_miss=False,
                          group_size=1):
    """Per-sample searchsorted(side='left') of segmented query arrays.

    Args:
        keys: [B, N] ascending uint32 per sample (SENTINEL padding at end).
        queries: [B, S, M] uint32; each [M] segment should be roughly
            ascending for performance (correct regardless).
        with_miss: if True, return hit-verified indices — rows whose query is
            not present in `keys` (or equals the SENTINEL) come back as N.
            The equality test rides the same window compares, so it is free
            compared to a separate `take_along_axis` hit check.
        group_size: segments per shared search window (must divide S); use
            when consecutive segments have near-identical key ranges (z-
            stream ladders, interpolation corner pairs) to amortize the
            per-chunk DMA + bounds cost.

    Returns:
        idx: [B, S, M] int32 in [0, N] (with_miss: N means miss; else the
        plain insertion position).
    """
    bsz, n = keys.shape
    _, segs, m = queries.shape

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

    pad = (-m) % T_QUERIES
    q = queries
    if pad:
        q = jnp.pad(queries, ((0, 0), (0, 0), (0, pad)), constant_values=np.uint32(0xFFFFFFFF))
    key_pad = max(W_KEYS - n, (-n) % 128)
    if key_pad:
        # sentinel-pad keys so full 128-aligned DMA windows always exist;
        # sentinels never compare below any query so counts are unchanged
        keys = jnp.pad(
            keys, ((0, 0), (0, key_pad)), constant_values=np.uint32(0xFFFFFFFF)
        )
    assert segs % group_size == 0, (segs, group_size)
    mp = q.shape[-1]
    chunks = q.reshape(bsz, segs, mp // T_QUERIES, T_QUERIES)
    cmin = jnp.min(chunks, axis=-1)  # [B, S, chunks]
    cmax = jnp.max(chunks, axis=-1)
    if group_size > 1:
        # the kernel unions bounds across each group anyway; narrowing at
        # group granularity cuts the searchsorted count group_size-fold
        gshape = (bsz, segs // group_size, group_size, -1)
        cmin = jnp.min(cmin.reshape(gshape), axis=2)
        cmax = jnp.max(cmax.reshape(gshape), axis=2)
    # key range per chunk via the (cheap) generic searchsorted
    lo = jax.vmap(lambda k, v: jnp.searchsorted(k, v, side="left"))(
        keys, cmin.reshape(bsz, -1)
    ).astype(jnp.int32)
    hi = jax.vmap(lambda k, v: jnp.searchsorted(k, v, side="right"))(
        keys, cmax.reshape(bsz, -1)
    ).astype(jnp.int32)
    idx = _searchsorted_pallas(
        keys.reshape(bsz, 1, -1), q, lo, hi, interpret=bool(interpret),
        miss_val=n if with_miss else -1, group_size=group_size,
    )
    if pad:
        idx = idx[..., :m]
    return idx
