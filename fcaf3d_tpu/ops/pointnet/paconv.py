"""PAConv `assign_score_withk` — TPU-native (pure jnp) equivalent of the
reference CUDA op (`/root/reference/mmdet3d/ops/paconv/src/
assign_score_withk_cuda.cu:48-79`, python wrapper
`mmdet3d/ops/paconv/assign_score.py:26-68`).

Semantics (from the CUDA forward kernel):
    out[b, o, n, k] = sum_m scores[b, n, k, m] *
        (points[b, knn_idx[b, n, k], m, o] - centers[b, knn_idx[b, n, 0], m, o])
with out-of-range neighbor indices (idx < 0 or idx >= N) contributing
zero. The reference kernel writes one slot per (n, k) regardless of the
`aggregate` flag (only 'sum' is ever dispatched by PAConv); gradients come
from JAX autodiff instead of the three hand-written backward kernels.

The m-contraction is a batched GEMM, so XLA maps it onto the MXU; the
gathers are two `take_along_axis` rows per query.
"""
from __future__ import annotations

import jax.numpy as jnp


def assign_score_withk(scores, points, centers, knn_idx, aggregate="sum"):
    """Aggregate weight-bank point features by predicted scores.

    Args:
        scores: [B, npoint, K, M] weight-bank mixing scores.
        points: [B, N, M, O] per-point features, one per weight matrix.
        centers: [B, N, M, O] per-point center features.
        knn_idx: [B, npoint, K] int32 neighbor indices; row k=0 is the
            center point. Out-of-range entries contribute zero.
        aggregate: only 'sum' (the reference kernel's sole behavior).

    Returns:
        [B, O, npoint, K] aggregated features (reference layout).
    """
    if aggregate != "sum":
        raise NotImplementedError(
            "reference kernel implements only 'sum'"
        )
    b, n, m, o = points.shape
    npoint, k = knn_idx.shape[1:]

    valid = (knn_idx >= 0) & (knn_idx < n)
    safe = jnp.clip(knn_idx, 0, n - 1)

    flat = points.reshape(b, n, m * o)
    p = jnp.take_along_axis(
        flat, safe.reshape(b, npoint * k, 1), axis=1
    ).reshape(b, npoint, k, m, o)
    cflat = centers.reshape(b, n, m * o)
    c = jnp.take_along_axis(
        cflat, safe[:, :, 0].reshape(b, npoint, 1), axis=1
    ).reshape(b, npoint, 1, m, o)

    # sum_m s[..., m] * (p - c)[..., m, o]  — a batched [1, M] x [M, O] GEMM
    out = jnp.einsum(
        "bnkm,bnkmo->bnko", scores, (p - c),
        preferred_element_type=points.dtype,
    )
    out = jnp.where(valid[..., None], out, 0)
    return jnp.transpose(out, (0, 3, 1, 2))
