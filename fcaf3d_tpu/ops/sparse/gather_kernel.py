"""Fused gather-GEMM Pallas kernel: sparse conv without row gathers.

TPU row-gathers cost ~8 cycles each, so XLA's gather+GEMM formulation of a
sparse conv is transaction-bound (~5ms for a 27x24k kernel map that moves
only ~180MB). This kernel exploits kernel-map monotonicity (columns of
kernel maps over sorted coordinate maps are non-decreasing): all 27
offsets' input rows for one output tile live in ONE contiguous window.

Per output tile of T rows:
1. DMA the tile's union input window (double-buffered across tiles).
2. Per offset: slice the offset's sub-span from the big window and *select*
   rows with a one-hot matmul on the MXU (one-hot rows have at most a
   single 1, so the reduction is an exact row copy), then accumulate
   `acc @ W[k]` in f32. The select cost per output row is W_SUB MACs per
   channel, and spans shrink with tile size, so (T_ROWS, W_SUB) are tuned
   together (span p95 at 256-row tiles is ~310-370 on surface scans,
   `tools/calibrate_budgets.py --spans`).
3. Fallbacks, in decreasing frequency: spans wider than W_SUB chain
   VMEM-only pieces from the big window; spans escaping the big window
   entirely (<0.1% of (tile, offset) pairs) stream DMA windows serially.

Used as the forward path of `gather_gemm`/`gen_gather_gemm` on TPU (the
custom-VJP backwards keep the XLA scatter formulation); correctness is
enforced by in-range masks, never by the span heuristics.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

T_ROWS = int(os.environ.get("FCAF3D_GATHER_T", "256"))  # output rows per tile
# per-piece sub-span (VMEM slice + one-hot width); the one-hot select costs
# T*W_SUB MACs per output tile per offset, and spans scale ~linearly with
# T, so (T_ROWS, W_SUB) shrink together. (256, 384, 2048) beat (512, 640,
# 4096) by ~4ms/fwd once the grouped z-triple path cut per-tile overhead.
W_SUB = int(os.environ.get("FCAF3D_GATHER_W", "384"))
W_BIG = int(os.environ.get("FCAF3D_GATHER_WBIG", "2048"))  # per-tile union window


@functools.lru_cache(maxsize=1)
def _tuning_table():
    """Per-signature (C, E, K, M-bucket) tile geometry measured by
    `tools/autotune_tiles.py` on real kernel maps. Env vars FCAF3D_GATHER_*
    override everything; absent table entries fall back to module defaults."""
    import json

    path = os.environ.get(
        "FCAF3D_GATHER_TUNE",
        os.path.join(os.path.dirname(__file__), "gather_tuning.json"),
    )
    try:
        with open(path) as f:
            raw = json.load(f)
    except (OSError, ValueError):
        return {}
    return {tuple(int(x) for x in k.split(",")): tuple(v)
            for k, v in raw.items()}


def _tuned_params(c, e, k, m):
    """(t_rows, w_sub, w_big) for a call signature; the M key is bucketed
    to the next power of two so budget tweaks don't invalidate the table."""
    if os.environ.get("FCAF3D_GATHER_T") or os.environ.get("FCAF3D_GATHER_W"):
        return T_ROWS, W_SUB, W_BIG  # explicit env experiment wins
    mb = 1 << max(0, (int(m) - 1)).bit_length()
    hit = _tuning_table().get((int(c), int(e), int(k), mb))
    return tuple(hit) if hit else (T_ROWS, W_SUB, W_BIG)


def _apply_act(x, act):
    """Static activation for the kernel epilogue (f32 in/out). ELU uses
    exp(x)-1 instead of expm1 (unlowerable in Mosaic); the argument is
    clamped <= 0 on the taken branch so there is no overflow and the
    worst-case ULP error vs expm1 is ~1e-7 absolute."""
    if act == "relu":
        return jnp.maximum(x, 0.0)
    if act == "elu":
        return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)
    assert act is None, act
    return x


def _make_kernel(t_rows: int, w_sub: int, w_big: int, g_size: int = 1,
                 act=None, has_affine: bool = False, has_add: bool = False):
    w_step = w_sub - 8  # piece advance (8-row alignment slack)

    def _kernel(wlo_ref, lo_ref, hi_ref, feats_hbm, idx_ref, w_ref, *rest):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        # rest = [affine?, vmask?, add?] + [out_ref, big, small, sem]
        ri = 0
        affine_ref = vmask_ref = add_ref = None
        if has_affine:
            affine_ref = rest[ri]
            vmask_ref = rest[ri + 1]
            ri += 2
        if has_add:
            add_ref = rest[ri]
            ri += 1
        out_ref, big, small, sem = rest[ri:ri + 4]

        b = pl.program_id(0)
        t = pl.program_id(1)
        n_tiles = pl.num_programs(1)
        k = idx_ref.shape[1]
        c = small.shape[1]
        e = w_ref.shape[2]
        n_rows = feats_hbm.shape[1]

        def finish(acc):
            """Inference epilogue: folded-BN affine (+residual) + activation,
            masked to valid rows — replaces the separate XLA elementwise
            pass (one full HBM read+write of the conv output per layer)."""
            if has_affine:
                acc = acc * affine_ref[0][None, :] + affine_ref[1][None, :]
            if has_add:
                acc = acc + add_ref[0].astype(jnp.float32)
            acc = _apply_act(acc, act)
            if has_affine:
                acc = acc * vmask_ref[0].reshape(t_rows, 1)
            return acc

        col_sub = jax.lax.broadcasted_iota(jnp.int32, (t_rows, w_sub), 1)

        def live(tt):
            # wlo == -1 marks a tile with zero kernel-map hits (valid rows
            # are a prefix, so these are the padding tail past the scene's
            # occupancy); skip its window DMA and all compute
            return wlo_ref[b * n_tiles + tt] >= 0

        def big_start(tt):
            s = jnp.maximum(0, jnp.minimum(wlo_ref[b * n_tiles + tt],
                                           n_rows - w_big))
            return pl.multiple_of((s // 8) * 8, 8)

        def big_dma(slot, tt):
            return pltpu.make_async_copy(
                feats_hbm.at[b, pl.ds(big_start(tt), w_big), :],
                big.at[slot], sem.at[slot],
            )

        @pl.when((t == 0) & live(0))
        def _():
            big_dma(0, 0).start()

        slot = t % 2

        @pl.when((t + 1 < n_tiles) & live(t + 1))
        def _():
            big_dma((t + 1) % 2, t + 1).start()

        @pl.when(jnp.logical_not(live(t)))
        def _():
            # dead tiles (no kernel-map hits) still run the epilogue: a
            # valid all-miss row's folded-BN output is `shift`, not zero
            out_ref[0, :, :] = finish(
                jnp.zeros((t_rows, e), jnp.float32)
            ).astype(out_ref.dtype)

        win_lo = big_start(t)

        def select(buf, rel, plo, phi):
            """One-hot select rows of `buf` [w_sub, C] into [T, C].

            rel: [T, 1] row index relative to buf start; [plo, phi): row
            bounds of this piece relative to buf start. The MXU accumulator
            is f32; the copy itself is exact in any dtype.

            The bounds are folded into rel on the cheap [T, 1] axis (out-of-
            piece rows become -1, which no col_sub lane matches), so the
            [T, w_sub] work is ONE compare — the onehot BUILD, not the MXU
            matmul, dominated the select cost (r5 measurement: ~96 vreg ops
            to build vs ~60 MXU cycles to multiply at C=64).
            """
            rel_c = jnp.where((rel >= plo) & (rel < phi), rel, -1)
            onehot = (col_sub == rel_c).astype(buf.dtype)
            return jax.lax.dot_general(
                onehot, buf,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def offset_select(kk):
            flat = (b * n_tiles + t) * k + kk
            lo = lo_ref[flat]
            hi = hi_ref[flat]
            rows = idx_ref[0, kk, :].reshape(t_rows, 1)
            fits_big = (lo >= win_lo) & (hi <= win_lo + w_big)
            one_piece = hi - lo <= w_step

            def fast1(_):
                # common case: whole span inside one aligned sub-window
                off = jnp.clip(((lo - win_lo) // 8) * 8, 0, w_big - w_sub)
                sub = big[slot, pl.ds(pl.multiple_of(off, 8), w_sub), :]
                base = win_lo + off
                return select(sub, rows - base, lo - base, hi - base)

            def fastN(_):
                # span crosses sub-windows but stays in the big window:
                # VMEM-only chained pieces (disjoint -> exact accumulation)
                def piece(i, acc):
                    astart = lo + i * w_step
                    rstart = jnp.clip(((astart - win_lo) // 8) * 8, 0,
                                      w_big - w_sub)
                    sub = big[slot, pl.ds(pl.multiple_of(rstart, 8), w_sub), :]
                    base = win_lo + rstart
                    phi = jnp.minimum(hi, astart + w_step) - base
                    return acc + select(sub, rows - base, astart - base, phi)

                n_pieces = pl.cdiv(jnp.maximum(hi - lo, 0), w_step)
                return jax.lax.fori_loop(
                    0, n_pieces, piece, jnp.zeros((t_rows, c), jnp.float32)
                )

            def slow(_):
                # span escapes the big window: stream DMA pieces (rare)
                def piece(i, acc):
                    astart = lo + i * w_step
                    start = jnp.maximum(0, jnp.minimum(astart, n_rows - w_sub))
                    start = pl.multiple_of((start // 8) * 8, 8)
                    dma = pltpu.make_async_copy(
                        feats_hbm.at[b, pl.ds(start, w_sub), :], small,
                        sem.at[2],
                    )
                    dma.start()
                    dma.wait()
                    phi = jnp.minimum(hi, astart + w_step) - start
                    return acc + select(small[:], rows - start,
                                        astart - start, phi)

                n_pieces = pl.cdiv(jnp.maximum(hi - lo, 0), w_step)
                return jax.lax.fori_loop(
                    0, n_pieces, piece, jnp.zeros((t_rows, c), jnp.float32)
                )

            return jax.lax.cond(
                hi <= lo,  # offset has no hits in this tile (map edges)
                lambda u: jnp.zeros((t_rows, c), jnp.float32),
                lambda u: jax.lax.cond(
                    fits_big & one_piece, fast1,
                    lambda v: jax.lax.cond(fits_big, fastN, slow, v), u,
                ),
                0,
            )

        def offset_body(kk, out_acc):
            acc = offset_select(kk)
            return out_acc + jax.lax.dot_general(
                acc.astype(w_ref.dtype), w_ref[kk],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if g_size == 1:
            @pl.when(live(t))
            def _():
                big_dma(slot, t).wait()
                out_acc = jax.lax.fori_loop(
                    0, k, offset_body, jnp.zeros((t_rows, e), jnp.float32)
                )
                out_ref[0, :, :] = finish(out_acc).astype(out_ref.dtype)
            return

        # grouped path: cubic-kernel offsets come in (dx, dy) groups of
        # g_size consecutive z's whose index columns live in ONE shared
        # span, so the group's selects stack into a single [G*T, W] one-hot
        # MXU op and its GEMMs merge into one [T, G*C] x [G*C, E] — cutting
        # the per-offset iteration overhead (the measured bottleneck at
        # small tiles) g_size-fold at identical MAC volume.
        col_g = jax.lax.broadcasted_iota(jnp.int32, (g_size * t_rows, w_sub), 1)

        def group_body(g, out_acc):
            k0 = g * g_size
            base_flat = (b * n_tiles + t) * k + k0
            los = [lo_ref[base_flat + z] for z in range(g_size)]
            his = [hi_ref[base_flat + z] for z in range(g_size)]
            glo = los[0]
            ghi = his[0]
            for z in range(1, g_size):
                glo = jnp.minimum(glo, los[z])
                ghi = jnp.maximum(ghi, his[z])
            fits = (
                (glo >= win_lo)
                & (ghi <= win_lo + w_big)
                & (ghi - glo <= w_step)
            )

            def fused_group(_):
                off = jnp.clip(((glo - win_lo) // 8) * 8, 0, w_big - w_sub)
                sub = big[slot, pl.ds(pl.multiple_of(off, 8), w_sub), :]
                base = win_lo + off
                rel = jnp.concatenate(
                    [idx_ref[0, k0 + z, :].reshape(t_rows, 1) - base
                     for z in range(g_size)], axis=0)  # [G*T, 1]
                plo = jnp.concatenate(
                    [jnp.full((t_rows, 1), los[z] - base, jnp.int32)
                     for z in range(g_size)], axis=0)
                phi = jnp.concatenate(
                    [jnp.full((t_rows, 1), his[z] - base, jnp.int32)
                     for z in range(g_size)], axis=0)
                # bounds folded into rel on the [G*T, 1] axis (see select())
                rel_c = jnp.where((rel >= plo) & (rel < phi), rel, -1)
                onehot = (col_g == rel_c).astype(sub.dtype)
                sel = jax.lax.dot_general(  # [G*T, C]
                    onehot, sub,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                stacked = jnp.concatenate(
                    [sel[z * t_rows:(z + 1) * t_rows] for z in range(g_size)],
                    axis=1,
                )  # [T, G*C]
                wg = jnp.concatenate(
                    [w_ref[k0 + z] for z in range(g_size)], axis=0
                )  # [G*C, E]
                return jax.lax.dot_general(
                    stacked.astype(w_ref.dtype), wg,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            def per_offset(_):
                acc = jnp.zeros((t_rows, e), jnp.float32)
                for z in range(g_size):
                    sel = offset_select(k0 + z)
                    acc = acc + jax.lax.dot_general(
                        sel.astype(w_ref.dtype), w_ref[k0 + z],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                return acc

            return out_acc + jax.lax.cond(
                ghi <= glo,  # whole group has no hits in this tile
                lambda u: jnp.zeros((t_rows, e), jnp.float32),
                lambda u: jax.lax.cond(fits, fused_group, per_offset, u),
                0,
            )

        @pl.when(live(t))
        def _():
            big_dma(slot, t).wait()
            out_acc = jax.lax.fori_loop(
                0, k // g_size, group_body, jnp.zeros((t_rows, e), jnp.float32)
            )
            out_ref[0, :, :] = finish(out_acc).astype(out_ref.dtype)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "t_rows", "w_sub", "w_big",
                              "g_size", "act"))
def _fused_pallas(feats_pad, idx, weight, wlo, lo, hi, interpret=False,
                  t_rows=T_ROWS, w_sub=W_SUB, w_big=W_BIG, g_size=1,
                  act=None, affine=None, vmask=None, add=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k, m = idx.shape
    c = feats_pad.shape[-1]
    e = weight.shape[-1]
    n_tiles = m // t_rows
    has_affine = affine is not None
    has_add = add is not None

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),  # feats stay in HBM
        pl.BlockSpec(
            (1, k, t_rows), lambda bb, tt, *_: (bb, 0, tt),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (k, c, e), lambda bb, tt, *_: (0, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    extra = []
    if has_affine:
        in_specs.append(pl.BlockSpec(
            (2, e), lambda bb, tt, *_: (0, 0), memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(
            (1, t_rows, 1), lambda bb, tt, *_: (bb, tt, 0),
            memory_space=pltpu.VMEM))
        extra += [affine, vmask]
    if has_add:
        in_specs.append(pl.BlockSpec(
            (1, t_rows, e), lambda bb, tt, *_: (bb, tt, 0),
            memory_space=pltpu.VMEM))
        extra.append(add)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, t_rows, e), lambda bb, tt, *_: (bb, tt, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, w_big, c), feats_pad.dtype),
            pltpu.VMEM((w_sub, c), feats_pad.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(t_rows, w_sub, w_big, g_size,
                     act=act, has_affine=has_affine, has_add=has_add),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, m, e), feats_pad.dtype),
        interpret=interpret,
    )(wlo.reshape(-1), lo.reshape(-1), hi.reshape(-1), feats_pad, idx, weight,
      *extra)


def apply_epilogue(out, scale, shift, act, vmask=None, add=None):
    """XLA-side epilogue (fallbacks + paths the kernel can't fuse):
    `act(out * scale + shift [+ add]) [* vmask]` in f32, cast back."""
    y = out.astype(jnp.float32) * scale + shift
    if add is not None:
        y = y + add.astype(jnp.float32)
    y = _apply_act(y, act)
    if vmask is not None:
        y = y * vmask[..., None].astype(jnp.float32)
    return y.astype(out.dtype)


def fused_gather_gemm(feats, idx, weight, interpret=None,
                      t_rows=None, w_sub=None, w_big=None,
                      scale=None, shift=None, act=None, vmask=None, add=None):
    """out[b, m] = sum_k feats[b, idx[b, m, k]] @ weight[k]; miss rows
    (idx == N) contribute zero. Drop-in forward for `gather_gemm`.

    Args:
        feats: [B, N, C]; idx: [B, M, K] int32 in [0, N]; weight: [K, C, E].
        t_rows/w_sub/w_big: tile/window overrides (see module docstring).
        scale/shift: optional folded-BN affine [E] (f32) applied in the
            kernel's output write (inference only — no VJP covers them).
        act: None | 'relu' | 'elu' epilogue activation.
        vmask: [B, M] row-validity multiplier (required with scale): padding
            rows get zero, mirroring the masked-BN semantics.
        add: optional [B, M, E] residual added after the affine, before act.
    """
    b, n, c = feats.shape
    _, m, k = idx.shape
    e = weight.shape[-1]
    has_epi = scale is not None
    if t_rows is None and w_sub is None and w_big is None:
        t_rows, w_sub, w_big = _tuned_params(c, e, k, m)
    t_rows = t_rows or T_ROWS
    w_sub = w_sub or W_SUB
    w_big = w_big or W_BIG
    use_pallas = interpret is True or (
        interpret is None and jax.default_backend() == "tpu"
    )
    if not use_pallas:
        from .conv import _gather_gemm_fwd_impl

        out = _gather_gemm_fwd_impl(feats, idx, weight, 3)
        if has_epi:
            out = apply_epilogue(out, scale, shift, act, vmask, add)
        return out

    # scoped-VMEM budget (16MB): the [K, C, E] weight block and the double-
    # buffered window must both fit. Wide channels shrink the window; huge
    # weights split the offsets and sum (each half re-streams its windows,
    # which is cheap on the small deep-level maps where C is large). The
    # epilogue is NOT distributive over the halves, so it runs in XLA here
    # (the split only triggers on the small deep-level maps).
    if c >= 384:
        w_big = min(w_big, 2048)
    wbytes = k * max(c, 128) * e * weight.dtype.itemsize
    if wbytes > 6 * 2**20 and k > 1:
        half = k // 2
        if k % 3 == 0:  # keep z-triples intact for the grouped select path
            half = max(3, (half // 3) * 3)
        out = fused_gather_gemm(
            feats, idx[..., :half], weight[:half], interpret=interpret,
            t_rows=t_rows, w_sub=w_sub, w_big=w_big,
        ) + fused_gather_gemm(
            feats, idx[..., half:], weight[half:], interpret=interpret,
            t_rows=t_rows, w_sub=w_sub, w_big=w_big,
        )
        if has_epi:
            out = apply_epilogue(out, scale, shift, act, vmask, add)
        return out

    # trace-time FLOP accounting (utils/flops.py): XLA sees this op as a
    # 0-flop custom call, so record the dense-equivalent GEMM work (model)
    # and the work actually issued to the MXU (GEMM on padded rows + the
    # one-hot select matmuls that replace row gathers).
    from ...utils.flops import record_flops

    c0 = c
    mp_est = m + ((-m) % t_rows)
    record_flops(
        model=2.0 * b * m * k * c0 * e,
        mxu=2.0 * b * mp_est * k * (c0 + ((-c0) % 128)) * (e + w_sub),
    )

    # channel-pad to 128 lanes: HBM window DMAs require 128-aligned slices
    c_pad = (-c) % 128
    if c_pad:
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, c_pad)))
        weight = jnp.pad(weight, ((0, 0), (0, c_pad), (0, 0)))
        c = c + c_pad
    feats_pad = jnp.concatenate([feats, jnp.zeros_like(feats[:, :1])], axis=1)
    rows = feats_pad.shape[1]
    if rows < w_big or rows % 8:
        extra = max(w_big - rows, (-rows) % 8)
        feats_pad = jnp.concatenate(
            [feats_pad, jnp.zeros((b, extra, c), feats.dtype)], axis=1
        )

    pad_m = (-m) % t_rows
    idx_p = idx
    if pad_m:
        idx_p = jnp.pad(idx, ((0, 0), (0, pad_m), (0, 0)), constant_values=n)
    mp = idx_p.shape[1]

    tiles = idx_p.reshape(b, mp // t_rows, t_rows, k)
    valid = tiles < n
    big = jnp.int32(2 ** 30)
    lo = jnp.min(jnp.where(valid, tiles, big), axis=2)  # [B, nt, K]
    lo = jnp.where(lo == big, 0, lo)
    hi = jnp.max(jnp.where(valid, tiles + 1, 0), axis=2)
    wlo = jnp.min(lo, axis=2)  # [B, nt] union window start
    # tiles with zero hits anywhere (the all-padding tail past each scene's
    # occupancy — budgets are p95-calibrated, so real scenes leave 10-25%
    # of rows empty) are marked wlo = -1: the kernel skips their window DMA
    # and offset loop entirely and just zeroes the output tile.
    # FCAF3D_SKIP_DEAD_TILES=0 disables the marking (A/B + kill switch).
    if os.environ.get("FCAF3D_SKIP_DEAD_TILES", "1") != "0":
        wlo = jnp.where(jnp.any(hi > lo, axis=2), wlo, -1)

    affine = vmask_p = add_p = None
    if has_epi:
        affine = jnp.stack(
            [scale.astype(jnp.float32), shift.astype(jnp.float32)], axis=0)
        vmask_p = vmask.astype(jnp.float32)
        if pad_m:
            vmask_p = jnp.pad(vmask_p, ((0, 0), (0, pad_m)))
        # [B, M, 1]: a trailing unit dim keeps the block shape legal for any
        # batch (a 2-D (1, t_rows) block violates Mosaic's 8x128 rule at B>1)
        vmask_p = vmask_p[..., None]
        if add is not None:
            add_p = add.astype(feats.dtype)
            if pad_m:
                add_p = jnp.pad(add_p, ((0, 0), (0, pad_m), (0, 0)))

    # offset-major [B, K, M]: the kernel's per-offset read is a leading-dim
    # dynamic index (lane-dim dynamic indexing is not allowed)
    idx_t = jnp.swapaxes(idx_p, 1, 2)
    out = _fused_pallas(
        feats_pad, idx_t, weight, wlo, lo, hi, interpret=bool(interpret),
        t_rows=t_rows, w_sub=w_sub, w_big=w_big,
        g_size=3 if k % 3 == 0 else 1,
        act=act if has_epi else None, affine=affine, vmask=vmask_p, add=add_p,
    )
    return out[:, :m]


def _make_dw_kernel(t_rows: int, w_sub: int, w_big: int, k_chunk: int,
                    k_total: int):
    """Weight-gradient kernel: dW[k] += sel_k^T @ dout_tile per output tile,
    where sel_k is the SAME windowed one-hot row select the forward kernel
    uses (gather_kernel.py:125). Replaces the XLA row-gathers of the
    unfused dW path (`_gather_rows` in conv.py `_gather_gemm_bwd`) — at
    batch 8 those gathers were ~31% of the whole FCAF3D train step.

    Grid (K/k_chunk, B, n_tiles) — offset chunk MAJOR: for a fixed chunk
    the [k_chunk, C, E] f32 output block index is constant across the whole
    (b, tile) sweep, so it accumulates in VMEM and flushes exactly once
    (Pallas requires consecutive revisits). The price is re-streaming each
    tile's feature window once per chunk; chunks only split when the
    resident block would blow VMEM (wide C*E), where maps are small.
    """
    w_step = w_sub - 8

    def _kernel(wlo_ref, lo_ref, hi_ref, feats_hbm, idx_ref, dout_ref,
                out_ref, big, small, sem):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        kc = pl.program_id(0)
        b = pl.program_id(1)
        t = pl.program_id(2)
        n_tiles = pl.num_programs(2)
        c = small.shape[1]
        n_rows = feats_hbm.shape[1]

        col_sub = jax.lax.broadcasted_iota(jnp.int32, (t_rows, w_sub), 1)

        def live(tt):
            return wlo_ref[b * n_tiles + tt] >= 0

        def big_start(tt):
            s = jnp.maximum(0, jnp.minimum(wlo_ref[b * n_tiles + tt],
                                           n_rows - w_big))
            return pl.multiple_of((s // 8) * 8, 8)

        def big_dma(slot, tt):
            return pltpu.make_async_copy(
                feats_hbm.at[b, pl.ds(big_start(tt), w_big), :],
                big.at[slot], sem.at[slot],
            )

        @pl.when((t == 0) & live(0))
        def _():
            big_dma(0, 0).start()

        slot = t % 2

        @pl.when((t + 1 < n_tiles) & live(t + 1))
        def _():
            big_dma((t + 1) % 2, t + 1).start()

        @pl.when((b == 0) & (t == 0))
        def _():
            # first visit of this chunk's block (resident for the whole
            # (b, tile) sweep)
            out_ref[...] = jnp.zeros_like(out_ref)

        win_lo = big_start(t)

        def select(buf, rel, plo, phi):
            # bounds folded into rel on the cheap [T, 1] axis (see the
            # forward kernel's select)
            rel_c = jnp.where((rel >= plo) & (rel < phi), rel, -1)
            onehot = (col_sub == rel_c).astype(buf.dtype)
            return jax.lax.dot_general(
                onehot, buf,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def offset_select(kk):
            flat = (b * n_tiles + t) * k_total + kc * k_chunk + kk
            lo = lo_ref[flat]
            hi = hi_ref[flat]
            rows = idx_ref[0, kc * k_chunk + kk, :].reshape(t_rows, 1)
            fits_big = (lo >= win_lo) & (hi <= win_lo + w_big)
            one_piece = hi - lo <= w_step

            def fast1(_):
                off = jnp.clip(((lo - win_lo) // 8) * 8, 0, w_big - w_sub)
                sub = big[slot, pl.ds(pl.multiple_of(off, 8), w_sub), :]
                base = win_lo + off
                return select(sub, rows - base, lo - base, hi - base)

            def fastN(_):
                def piece(i, acc):
                    astart = lo + i * w_step
                    rstart = jnp.clip(((astart - win_lo) // 8) * 8, 0,
                                      w_big - w_sub)
                    sub = big[slot, pl.ds(pl.multiple_of(rstart, 8), w_sub), :]
                    base = win_lo + rstart
                    phi = jnp.minimum(hi, astart + w_step) - base
                    return acc + select(sub, rows - base, astart - base, phi)

                n_pieces = pl.cdiv(jnp.maximum(hi - lo, 0), w_step)
                return jax.lax.fori_loop(
                    0, n_pieces, piece, jnp.zeros((t_rows, c), jnp.float32)
                )

            def slow(_):
                def piece(i, acc):
                    astart = lo + i * w_step
                    start = jnp.maximum(0, jnp.minimum(astart, n_rows - w_sub))
                    start = pl.multiple_of((start // 8) * 8, 8)
                    dma = pltpu.make_async_copy(
                        feats_hbm.at[b, pl.ds(start, w_sub), :], small,
                        sem.at[2],
                    )
                    dma.start()
                    dma.wait()
                    phi = jnp.minimum(hi, astart + w_step) - start
                    return acc + select(small[:], rows - start,
                                        astart - start, phi)

                n_pieces = pl.cdiv(jnp.maximum(hi - lo, 0), w_step)
                return jax.lax.fori_loop(
                    0, n_pieces, piece, jnp.zeros((t_rows, c), jnp.float32)
                )

            return jax.lax.cond(
                hi <= lo,
                lambda u: jnp.zeros((t_rows, c), jnp.float32),
                lambda u: jax.lax.cond(
                    fits_big & one_piece, fast1,
                    lambda v: jax.lax.cond(fits_big, fastN, slow, v), u,
                ),
                0,
            )

        @pl.when(live(t))
        def _():
            big_dma(slot, t).wait()
            dout = dout_ref[0]  # [T, E]
            for kk in range(k_chunk):  # static unroll
                sel = offset_select(kk)  # [T, C] f32
                # dW[k] += sel^T @ dout — contraction over the tile rows
                out_ref[kk, :, :] += jax.lax.dot_general(
                    sel.astype(dout.dtype), dout,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    return _kernel


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "t_rows", "w_sub", "w_big", "k_chunk"))
def _fused_dw_pallas(feats_pad, idx, dout, wlo, lo, hi, interpret=False,
                     t_rows=T_ROWS, w_sub=W_SUB, w_big=W_BIG, k_chunk=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k, m = idx.shape
    c = feats_pad.shape[-1]
    e = dout.shape[-1]
    n_tiles = m // t_rows

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(k // k_chunk, b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # feats stay in HBM
            # full-K idx block (27KB): a k_chunk-sublane block would violate
            # the 8-sublane divisibility rule; the kernel offsets into it
            pl.BlockSpec(
                (1, k, t_rows), lambda kcc, bb, tt, *_: (bb, 0, tt),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, t_rows, e), lambda kcc, bb, tt, *_: (bb, tt, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (k_chunk, c, e), lambda kcc, bb, tt, *_: (kcc, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, w_big, c), feats_pad.dtype),
            pltpu.VMEM((w_sub, c), feats_pad.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        _make_dw_kernel(t_rows, w_sub, w_big, k_chunk, k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, c, e), jnp.float32),
        interpret=interpret,
    )(wlo.reshape(-1), lo.reshape(-1), hi.reshape(-1), feats_pad, idx, dout)


def fused_gather_dw(feats, idx, dout, interpret=None,
                    t_rows=None, w_sub=None, w_big=None):
    """dW[k] = sum_{b,m} feats[b, idx[b,m,k]]^T (outer) dout[b,m]; miss rows
    (idx == N) contribute zero. The weight-gradient of `gather_gemm`,
    computed with the forward kernel map through the windowed one-hot
    machinery (no XLA row gathers / scatter-adds anywhere).

    Args:
        feats: [B, N, C]; idx: [B, M, K] int32 in [0, N]; dout: [B, M, E].
    Returns:
        dW: [K, C, E] float32.
    """
    b, n, c = feats.shape
    _, m, k = idx.shape
    e = dout.shape[-1]
    if t_rows is None and w_sub is None and w_big is None:
        t_rows, w_sub, w_big = _tuned_params(c, e, k, m)
    t_rows = t_rows or T_ROWS
    w_sub = w_sub or W_SUB
    w_big = w_big or W_BIG
    use_pallas = interpret is True or (
        interpret is None and jax.default_backend() == "tpu"
    )
    if not use_pallas:
        fpad = jnp.concatenate([feats, jnp.zeros_like(feats[:, :1])], axis=1)
        g = jnp.take_along_axis(
            fpad, idx.reshape(b, -1)[..., None], axis=1
        ).reshape(b, m, k, c)
        return jnp.einsum("bmkc,bme->kce", g, dout,
                          preferred_element_type=jnp.float32)

    from ...utils.flops import record_flops

    record_flops(model=2.0 * b * m * k * c * e)

    if c >= 384:
        w_big = min(w_big, 2048)

    c_pad = (-c) % 128
    if c_pad:
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, c_pad)))
        c = c + c_pad
    e_pad = (-e) % 128
    if e_pad:
        dout = jnp.pad(dout, ((0, 0), (0, 0), (0, e_pad)))
        e = e + e_pad
    feats_pad = jnp.concatenate([feats, jnp.zeros_like(feats[:, :1])], axis=1)
    rows = feats_pad.shape[1]
    if rows < w_big or rows % 8:
        extra = max(w_big - rows, (-rows) % 8)
        feats_pad = jnp.concatenate(
            [feats_pad, jnp.zeros((b, extra, c), feats.dtype)], axis=1
        )

    pad_m = (-m) % t_rows
    idx_p = idx
    if pad_m:
        idx_p = jnp.pad(idx, ((0, 0), (0, pad_m), (0, 0)), constant_values=n)
        dout = jnp.pad(dout, ((0, 0), (0, pad_m), (0, 0)))
    mp = idx_p.shape[1]

    tiles = idx_p.reshape(b, mp // t_rows, t_rows, k)
    valid = tiles < n
    big = jnp.int32(2 ** 30)
    lo = jnp.min(jnp.where(valid, tiles, big), axis=2)
    lo = jnp.where(lo == big, 0, lo)
    hi = jnp.max(jnp.where(valid, tiles + 1, 0), axis=2)
    wlo = jnp.min(lo, axis=2)
    if os.environ.get("FCAF3D_SKIP_DEAD_TILES", "1") != "0":
        wlo = jnp.where(jnp.any(hi > lo, axis=2), wlo, -1)

    # offset chunks bound the resident [k_chunk, C, E] f32 output block to
    # what VMEM can hold next to the window scratch
    win_bytes = (2 * w_big + w_sub) * c * feats.dtype.itemsize
    budget_bytes = max(2 ** 20, 11 * 2 ** 20 - win_bytes)
    k_chunk = max(1, min(k, budget_bytes // max(1, c * e * 4)))
    while k % k_chunk:
        k_chunk -= 1

    idx_t = jnp.swapaxes(idx_p, 1, 2)
    dw = _fused_dw_pallas(
        feats_pad, idx_t, dout, wlo, lo, hi, interpret=bool(interpret),
        t_rows=t_rows, w_sub=w_sub, w_big=w_big, k_chunk=k_chunk,
    )
    return dw[:, : c - c_pad if c_pad else c, : e - e_pad if e_pad else e]


def _make_max_kernel(t_rows: int, w_sub: int, w_big: int):
    """Max-pool variant of the windowed kernel: per offset, one-hot-select
    the offset's rows (exact row copies) and take an elementwise MAX over
    offsets instead of a GEMM accumulate. Replaces `sparse_max_pool`'s
    XLA row gather (k2s2 stem pool: 19 ms fwd + 38 ms scatter-add bwd per
    batch-8 train step — the two largest non-kernel ops of the r5 trace).
    Missing neighbors contribute -inf; all-miss rows return -inf (callers
    mask SENTINEL rows to zero, conv.py `sparse_max_pool`)."""
    w_step = w_sub - 8
    neg = float(np.finfo(np.float32).min)

    def _kernel(wlo_ref, lo_ref, hi_ref, feats_hbm, idx_ref, out_ref,
                big, small, sem):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        b = pl.program_id(0)
        t = pl.program_id(1)
        n_tiles = pl.num_programs(1)
        k = idx_ref.shape[1]
        c = small.shape[1]
        n_rows = feats_hbm.shape[1]

        col_sub = jax.lax.broadcasted_iota(jnp.int32, (t_rows, w_sub), 1)

        def live(tt):
            return wlo_ref[b * n_tiles + tt] >= 0

        def big_start(tt):
            s = jnp.maximum(0, jnp.minimum(wlo_ref[b * n_tiles + tt],
                                           n_rows - w_big))
            return pl.multiple_of((s // 8) * 8, 8)

        def big_dma(slot, tt):
            return pltpu.make_async_copy(
                feats_hbm.at[b, pl.ds(big_start(tt), w_big), :],
                big.at[slot], sem.at[slot],
            )

        @pl.when((t == 0) & live(0))
        def _():
            big_dma(0, 0).start()

        slot = t % 2

        @pl.when((t + 1 < n_tiles) & live(t + 1))
        def _():
            big_dma((t + 1) % 2, t + 1).start()

        @pl.when(jnp.logical_not(live(t)))
        def _():
            out_ref[0, :, :] = jnp.full((t_rows, c), neg, out_ref.dtype)

        win_lo = big_start(t)

        def select_max(buf, rel, plo, phi, acc):
            rel_c = jnp.where((rel >= plo) & (rel < phi), rel, -1)
            onehot = (col_sub == rel_c).astype(buf.dtype)
            sel = jax.lax.dot_general(
                onehot, buf,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jnp.maximum(acc, jnp.where(rel_c >= 0, sel, neg))

        def offset_body(kk, acc):
            flat = (b * n_tiles + t) * k + kk
            lo = lo_ref[flat]
            hi = hi_ref[flat]
            rows = idx_ref[0, kk, :].reshape(t_rows, 1)
            fits_big = (lo >= win_lo) & (hi <= win_lo + w_big)
            one_piece = hi - lo <= w_step

            def fast1(acc):
                off = jnp.clip(((lo - win_lo) // 8) * 8, 0, w_big - w_sub)
                sub = big[slot, pl.ds(pl.multiple_of(off, 8), w_sub), :]
                base = win_lo + off
                return select_max(sub, rows - base, lo - base, hi - base, acc)

            def slow(acc):
                def piece(i, acc):
                    astart = lo + i * w_step
                    start = jnp.maximum(0, jnp.minimum(astart, n_rows - w_sub))
                    start = pl.multiple_of((start // 8) * 8, 8)
                    dma = pltpu.make_async_copy(
                        feats_hbm.at[b, pl.ds(start, w_sub), :], small,
                        sem.at[2],
                    )
                    dma.start()
                    dma.wait()
                    phi = jnp.minimum(hi, astart + w_step) - start
                    return select_max(small[:], rows - start,
                                      astart - start, phi, acc)

                n_pieces = pl.cdiv(jnp.maximum(hi - lo, 0), w_step)
                return jax.lax.fori_loop(0, n_pieces, piece, acc)

            return jax.lax.cond(
                hi <= lo, lambda a: a,
                lambda a: jax.lax.cond(fits_big & one_piece, fast1, slow, a),
                acc,
            )

        @pl.when(live(t))
        def _():
            big_dma(slot, t).wait()
            acc = jax.lax.fori_loop(
                0, k, offset_body, jnp.full((t_rows, c), neg, jnp.float32)
            )
            out_ref[0, :, :] = acc.astype(out_ref.dtype)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "t_rows", "w_sub", "w_big"))
def _fused_max_pallas(feats_pad, idx, wlo, lo, hi, interpret=False,
                      t_rows=T_ROWS, w_sub=W_SUB, w_big=W_BIG):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k, m = idx.shape
    c = feats_pad.shape[-1]
    n_tiles = m // t_rows

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, k, t_rows), lambda bb, tt, *_: (bb, 0, tt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_rows, c), lambda bb, tt, *_: (bb, tt, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, w_big, c), feats_pad.dtype),
            pltpu.VMEM((w_sub, c), feats_pad.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        _make_max_kernel(t_rows, w_sub, w_big),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, m, c), feats_pad.dtype),
        interpret=interpret,
    )(wlo.reshape(-1), lo.reshape(-1), hi.reshape(-1), feats_pad, idx)


def fused_gather_max(feats, idx, interpret=None):
    """out[b, m] = max_k feats[b, idx[b, m, k]] elementwise per channel;
    missing neighbors (idx == N) contribute -inf (all-miss rows return
    finfo.min — callers mask). Windowed Pallas forward for
    `sparse_max_pool`; off-TPU falls back to the XLA gather formulation.

    Args:
        feats: [B, N, C]; idx: [B, M, K] int32 in [0, N].
    """
    b, n, c = feats.shape
    _, m, k = idx.shape
    t_rows, w_sub, w_big = _tuned_params(c, c, k, m)
    use_pallas = interpret is True or (
        interpret is None and jax.default_backend() == "tpu"
    )
    if not use_pallas:
        neg = jnp.asarray(jnp.finfo(feats.dtype).min, feats.dtype)
        fpad = jnp.concatenate(
            [feats, jnp.full((b, 1, c), neg, feats.dtype)], axis=1)
        g = jnp.take_along_axis(
            fpad, idx.reshape(b, -1)[..., None], axis=1
        ).reshape(b, m, k, c)
        return jnp.max(g, axis=2)

    c0 = c
    c_pad = (-c) % 128
    if c_pad:
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, c_pad)))
        c = c + c_pad
    feats_pad = jnp.concatenate([feats, jnp.zeros_like(feats[:, :1])], axis=1)
    rows = feats_pad.shape[1]
    if rows < w_big or rows % 8:
        extra = max(w_big - rows, (-rows) % 8)
        feats_pad = jnp.concatenate(
            [feats_pad, jnp.zeros((b, extra, c), feats.dtype)], axis=1
        )

    pad_m = (-m) % t_rows
    idx_p = idx
    if pad_m:
        idx_p = jnp.pad(idx, ((0, 0), (0, pad_m), (0, 0)), constant_values=n)
    mp = idx_p.shape[1]

    tiles = idx_p.reshape(b, mp // t_rows, t_rows, k)
    valid = tiles < n
    big = jnp.int32(2 ** 30)
    lo = jnp.min(jnp.where(valid, tiles, big), axis=2)
    lo = jnp.where(lo == big, 0, lo)
    hi = jnp.max(jnp.where(valid, tiles + 1, 0), axis=2)
    wlo = jnp.min(lo, axis=2)
    if os.environ.get("FCAF3D_SKIP_DEAD_TILES", "1") != "0":
        wlo = jnp.where(jnp.any(hi > lo, axis=2), wlo, -1)

    idx_t = jnp.swapaxes(idx_p, 1, 2)
    out = _fused_max_pallas(feats_pad, idx_t, wlo, lo, hi,
                            interpret=bool(interpret),
                            t_rows=t_rows, w_sub=w_sub, w_big=w_big)
    return out[:, :m, :c0]
