"""Fused gather-GEMM Pallas kernel: sparse conv without row gathers.

TPU row-gathers cost ~8 cycles each and DMA issues cost ~2us, so sparse
convs are transaction-bound. This kernel exploits kernel-map monotonicity
(columns of kernel maps over sorted coordinate maps are near-sorted): all
27 offsets' input rows for one output tile live in ONE contiguous window.

Per output tile of T rows:
1. DMA the tile's union input window (double-buffered across tiles).
2. Per offset: slice the offset's sub-span from VMEM and *select* rows with
   a one-hot matmul on the MXU (one-hot rows have at most a single 1, so
   the reduction is an exact row copy), then accumulate acc @ W[k].
   Offsets whose span exceeds the window (rare) stream extra windows
   serially.

Used as the forward path of `gather_gemm`/`gen_gather_gemm` on TPU (the
custom-VJP backwards keep the XLA scatter formulation); correctness is
enforced by in-range masks, never by the span heuristics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

T_ROWS = 256  # output rows per tile
W_SUB = 512  # per-offset sub-span (VMEM slice + one-hot width)
W_BIG = 4096  # per-tile union window (one DMA per tile)
W_STEP = W_SUB - 8  # fallback window advance (8-row alignment slack)


def _kernel(wlo_ref, lo_ref, hi_ref, feats_hbm, idx_ref, w_ref, out_ref,
            big, small, sem):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    k = idx_ref.shape[1]
    c = small.shape[1]
    n_rows = feats_hbm.shape[1]

    col_sub = jax.lax.broadcasted_iota(jnp.int32, (T_ROWS, W_SUB), 1)

    def big_start(tt):
        s = jnp.maximum(0, jnp.minimum(wlo_ref[b * n_tiles + tt],
                                       n_rows - W_BIG))
        return pl.multiple_of((s // 8) * 8, 8)

    def big_dma(slot, tt):
        return pltpu.make_async_copy(
            feats_hbm.at[b, pl.ds(big_start(tt), W_BIG), :],
            big.at[slot], sem.at[slot],
        )

    @pl.when(t == 0)
    def _():
        big_dma(0, 0).start()

    slot = t % 2

    @pl.when(t + 1 < n_tiles)
    def _():
        big_dma((t + 1) % 2, t + 1).start()

    big_dma(slot, t).wait()
    win_lo = big_start(t)

    def select(buf, rows, buf_start, plo, phi):
        """Rows of `buf` [W_SUB, C] selected into [T, C] via one-hot MXU."""
        rel = rows.reshape(T_ROWS, 1) - buf_start
        onehot = (
            (col_sub == rel) & (rel >= plo - buf_start) & (rel < phi - buf_start)
        ).astype(buf.dtype)
        return jax.lax.dot_general(
            onehot, buf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def offset_body(kk, out_acc):
        flat = (b * n_tiles + t) * k + kk
        lo = lo_ref[flat]
        hi = hi_ref[flat]
        rows = idx_ref[0, kk, :]  # [T]
        fits = (lo >= win_lo) & (hi <= win_lo + W_BIG) & (hi - lo <= W_SUB - 8)

        def fast(_):
            off = jnp.clip(((lo - win_lo) // 8) * 8, 0, W_BIG - W_SUB)
            sub = big[slot, pl.ds(pl.multiple_of(off, 8), W_SUB), :]
            return select(sub, rows, win_lo + off, lo, hi)

        def slow(_):
            def piece(i, acc):
                plo = lo + i * W_STEP
                phi = jnp.minimum(hi, plo + W_STEP)
                start = jnp.maximum(0, jnp.minimum(plo, n_rows - W_SUB))
                start = pl.multiple_of((start // 8) * 8, 8)
                dma = pltpu.make_async_copy(
                    feats_hbm.at[b, pl.ds(start, W_SUB), :], small, sem.at[2]
                )
                dma.start()
                dma.wait()
                return acc + select(small[:], rows, start, plo, phi)

            n_pieces = pl.cdiv(jnp.maximum(hi - lo, 0), W_STEP)
            return jax.lax.fori_loop(
                0, n_pieces, piece, jnp.zeros((T_ROWS, c), jnp.float32)
            )

        acc = jax.lax.cond(fits, fast, slow, 0)
        return out_acc + jax.lax.dot_general(
            acc.astype(w_ref.dtype), w_ref[kk],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    e = w_ref.shape[2]
    out_acc = jax.lax.fori_loop(
        0, k, offset_body, jnp.zeros((T_ROWS, e), jnp.float32)
    )
    out_ref[0, :, :] = out_acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_pallas(feats_pad, idx, weight, wlo, lo, hi, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k, m = idx.shape
    c = feats_pad.shape[-1]
    e = weight.shape[-1]
    n_tiles = m // T_ROWS

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # feats stay in HBM
            pl.BlockSpec(
                (1, k, T_ROWS), lambda bb, tt, *_: (bb, 0, tt),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, c, e), lambda bb, tt, *_: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, T_ROWS, e), lambda bb, tt, *_: (bb, tt, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, W_BIG, c), feats_pad.dtype),
            pltpu.VMEM((W_SUB, c), feats_pad.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, m, e), feats_pad.dtype),
        interpret=interpret,
    )(wlo.reshape(-1), lo.reshape(-1), hi.reshape(-1), feats_pad, idx, weight)


def fused_gather_gemm(feats, idx, weight, interpret=None):
    """out[b, m] = sum_k feats[b, idx[b, m, k]] @ weight[k]; miss rows
    (idx == N) contribute zero. Drop-in forward for `gather_gemm`.

    Args:
        feats: [B, N, C]; idx: [B, M, K] int32 in [0, N]; weight: [K, C, E].
    """
    b, n, c = feats.shape
    _, m, k = idx.shape
    e = weight.shape[-1]
    use_pallas = interpret is True or (
        interpret is None and jax.default_backend() == "tpu"
    )
    if not use_pallas:
        from .conv import _gather_gemm_fwd_impl

        return _gather_gemm_fwd_impl(feats, idx, weight, 3)

    # channel-pad to 128 lanes: HBM window DMAs require 128-aligned slices
    c_pad = (-c) % 128
    if c_pad:
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, c_pad)))
        weight = jnp.pad(weight, ((0, 0), (0, c_pad), (0, 0)))
        c = c + c_pad
    feats_pad = jnp.concatenate([feats, jnp.zeros_like(feats[:, :1])], axis=1)
    rows = feats_pad.shape[1]
    if rows < W_BIG or rows % 8:
        extra = max(W_BIG - rows, (-rows) % 8)
        feats_pad = jnp.concatenate(
            [feats_pad, jnp.zeros((b, extra, c), feats.dtype)], axis=1
        )

    pad_m = (-m) % T_ROWS
    idx_p = idx
    if pad_m:
        idx_p = jnp.pad(idx, ((0, 0), (0, pad_m), (0, 0)), constant_values=n)
    mp = idx_p.shape[1]

    tiles = idx_p.reshape(b, mp // T_ROWS, T_ROWS, k)
    valid = tiles < n
    big = jnp.int32(2 ** 30)
    lo = jnp.min(jnp.where(valid, tiles, big), axis=2)  # [B, nt, K]
    lo = jnp.where(lo == big, 0, lo)
    hi = jnp.max(jnp.where(valid, tiles + 1, 0), axis=2)
    wlo = jnp.min(lo, axis=2)  # [B, nt] union window start

    # offset-major [B, K, M]: the kernel's per-offset read is a leading-dim
    # dynamic index (lane-dim dynamic indexing is not allowed)
    idx_t = jnp.swapaxes(idx_p, 1, 2)
    out = _fused_pallas(
        feats_pad, idx_t, weight, wlo, lo, hi, interpret=bool(interpret)
    )
    return out[:, :m]
