"""PointNet++ primitive ops in pure jnp (TPU-friendly, static shapes).

Replaces the reference's CUDA extensions `furthest_point_sample_ext`,
`ball_query_ext`, `gather_points_ext`, `group_points_ext`,
`interpolate_ext` (three_nn/three_interpolate), `knn_ext`
(`/root/reference/mmdet3d/ops/*/src/`). All take padded [B, N, ...] arrays
with validity masks; neighbor searches are brute-force pairwise distances
(N <= ~50k, centers <= ~2k indoors — a few MFLOP, ideal for the VPU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e10


def _sqdist(a, b):
    """Pairwise squared distances [..., N, 3] x [..., M, 3] -> [..., N, M]."""
    return (
        jnp.sum(a * a, -1)[..., :, None]
        - 2.0 * jnp.einsum("...nc,...mc->...nm", a, b)
        + jnp.sum(b * b, -1)[..., None, :]
    )


def furthest_point_sample(points, num_samples, valid=None):
    """Iterative FPS (reference `furthest_point_sample_ext`, D-FPS variant).

    Args:
        points: [B, N, 3].
        num_samples: static int.
        valid: [B, N] bool; invalid rows are never selected.

    Returns:
        idx: [B, num_samples] int32 (starts at index 0, like the CUDA op).
    """
    b, n, _ = points.shape
    if valid is None:
        valid = jnp.ones((b, n), bool)

    # TPU: the whole serial loop runs inside ONE Pallas kernel (identical
    # selection semantics, ~no per-iteration dispatch cost; fps_kernel.py).
    # FCAF3D_FPS_KERNEL=0 reverts to the XLA fori_loop formulation.
    import os

    if os.environ.get("FCAF3D_FPS_KERNEL", "1") != "0" and (
        jax.default_backend() == "tpu"
    ):
        from .fps_kernel import fps_tpu

        return fps_tpu(points, num_samples, valid)

    def per_sample(pts, val):
        start = jnp.argmax(val)  # first valid index (CUDA op starts at 0)

        def body(i, state):
            dists, idxs = state
            last = pts[idxs[i - 1]]
            d = jnp.sum((pts - last) ** 2, -1)
            dists = jnp.minimum(dists, d)
            masked = jnp.where(val, dists, -1.0)
            nxt = jnp.argmax(masked)
            return dists, idxs.at[i].set(nxt)

        dists0 = jnp.full((n,), _BIG)
        idxs0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(start.astype(jnp.int32))
        _, idxs = jax.lax.fori_loop(1, num_samples, body, (dists0, idxs0))
        return idxs

    return jax.vmap(per_sample)(points, valid)


def ball_query(centers, points, radius, nsample, valid=None):
    """Fixed-radius neighbor query (reference `ball_query_ext`): up to
    `nsample` neighbor indices per center, in ascending point-index order,
    padded by repeating the first found neighbor (CUDA op convention).

    Large clouds (N >= FCAF3D_BALLQ_GRID_MIN, default 8192) dispatch to the
    grid-bucketed Pallas path on TPU (`ballq_kernel.ball_query_grid`) — the
    brute top-k over N was 70% of the VoteNet train step. Disable with
    FCAF3D_BALLQ_GRID=0. Callers needing the overflow counter (dropped
    candidates on pathologically dense cells) call `ball_query_grid`
    directly; this wrapper discards it.

    Args:
        centers: [B, M, 3]; points: [B, N, 3]; valid: [B, N] bool.

    Returns:
        idx: [B, M, nsample] int32.
    """
    import os

    b, n, _ = points.shape
    grid_min = int(os.environ.get("FCAF3D_BALLQ_GRID_MIN", "8192"))
    if (n >= grid_min and jax.default_backend() == "tpu"
            and os.environ.get("FCAF3D_BALLQ_GRID", "1") != "0"):
        from .ballq_kernel import ball_query_grid

        idx, _ = ball_query_grid(centers, points, radius, nsample, valid)
        return idx
    if valid is None:
        valid = jnp.ones((b, n), bool)
    d2 = _sqdist(centers, points)  # [B, M, N]
    ok = (d2 < radius * radius) & valid[:, None, :]
    # lowest-index hits = top-k of the negated index over hits. approx_max_k
    # at recall_target=1.0 is EXACT (all scores are distinct) and lowers to
    # the TPU partial-reduce top-k — a full jnp.sort over N here was the
    # single largest cost of the VoteNet train step (~700 ms/step of sorts).
    # f32 holds indices exactly for n < 2**24.
    n_iota = jnp.arange(n, dtype=jnp.float32)[None, None, :]
    score = jnp.where(ok, -n_iota, jnp.float32(-n))
    vals, _ = jax.lax.approx_max_k(
        score, min(nsample, n), recall_target=1.0)
    picked = (-vals).astype(jnp.int32)  # ascending index; miss -> n
    if nsample > n:
        picked = jnp.pad(picked, ((0, 0), (0, 0), (0, nsample - n)),
                         constant_values=n)
    first = picked[..., :1]
    idx = jnp.where(picked >= n, first, picked)
    # centers with zero neighbors: fall back to index 0 (matches CUDA output
    # of an untouched buffer; callers mask such centers out by distance)
    idx = jnp.where(first >= n, 0, idx)
    return idx.astype(jnp.int32)


def gather_points(points, idx):
    """[B, N, C] gathered at [B, M] -> [B, M, C]."""
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def group_points(points, idx):
    """[B, N, C] grouped by [B, M, K] -> [B, M, K, C]."""
    b, m, k = idx.shape
    flat = idx.reshape(b, m * k).astype(jnp.int32)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(b, m, k, -1)


def knn(query, points, k, valid=None):
    """k nearest neighbors: [B, M, 3] in [B, N, 3] -> idx [B, M, k].

    Uses the TPU partial-reduce top-k (exact at recall 1.0) instead of a
    full argsort over N; ties pick an arbitrary duplicate (the distances,
    which downstream weights consume, are identical either way).
    """
    d2 = _sqdist(query, points)
    if valid is not None:
        d2 = jnp.where(valid[:, None, :], d2, _BIG)
    _, idx = jax.lax.approx_min_k(d2, k, recall_target=1.0)
    return idx.astype(jnp.int32)


def three_nn(query, points, valid=None):
    """3 nearest neighbors with distances (reference `three_nn`).

    Returns:
        (dist [B, M, 3], idx [B, M, 3]).
    """
    d2 = _sqdist(query, points)
    if valid is not None:
        d2 = jnp.where(valid[:, None, :], d2, _BIG)
    d, idx = jax.lax.approx_min_k(d2, 3, recall_target=1.0)
    return jnp.sqrt(jnp.maximum(d, 1e-12)), idx.astype(jnp.int32)


def three_interpolate(features, idx, dist):
    """Inverse-distance-weighted 3-NN interpolation (reference
    `three_interpolate`): features [B, N, C], idx/dist [B, M, 3] -> [B, M, C].
    """
    w = 1.0 / jnp.maximum(dist * dist, 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    g = group_points(features, idx)  # [B, M, 3, C]
    return jnp.sum(g * w[..., None], axis=2)
