"""FCAF3D training target assignment, fully vectorized jnp.

Clean-room port of `Fcaf3DAssigner.assign`
(`/root/reference/mmdet3d/models/dense_heads/fcaf3d_neck_with_head.py:387-466`)
to padded static shapes: all point/box slots participate, with validity
masks routing padding to the background label (-1).

Rule chain (per point):
1. inside a gt box (strictly positive distance to all 6 faces after yaw
   un-rotation);
2. the box picks one scale: the coarsest whose positive-point count is
   >= `limit` (else the last scale below the limit chain, see reference's
   argmax trick);
3. within the chosen scale, only the `topk` highest-centerness points per
   box stay positive;
4. a point claimed by several boxes goes to the smallest-volume one.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.geometry import gravity_center, rotate_points_z

_FLOAT_MAX = 1e8


class AssignResult(NamedTuple):
    centerness: jnp.ndarray  # [P] targets (garbage where label < 0)
    bbox_targets: jnp.ndarray  # [P, 7] gravity-centered gt box per point
    labels: jnp.ndarray  # [P] int32, -1 = background


def compute_centerness(face_dists: jnp.ndarray) -> jnp.ndarray:
    """sqrt of the product of per-axis min/max face-distance ratios
    (`compute_centerness`, reference `:377-384`)."""
    x = face_dists[..., 0:2]
    y = face_dists[..., 2:4]
    z = face_dists[..., 4:6]
    r = (
        jnp.min(x, -1) / jnp.maximum(jnp.max(x, -1), 1e-12)
        * jnp.min(y, -1) / jnp.maximum(jnp.max(y, -1), 1e-12)
        * jnp.min(z, -1) / jnp.maximum(jnp.max(z, -1), 1e-12)
    )
    return jnp.sqrt(jnp.clip(r, 0.0))


def fcaf3d_assign(
    points: jnp.ndarray,
    scales: jnp.ndarray,
    points_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    n_scales: int,
    limit: int,
    topk: int,
) -> AssignResult:
    """Single-sample assignment.

    Args:
        points: [P, 3] metric head locations (all levels concatenated).
        scales: [P] int32 level index of each location.
        points_valid: [P] bool.
        gt_boxes: [G, 7] bottom-centered box7.
        gt_labels: [G] int32.
        gt_valid: [G] bool.
    """
    p = points.shape[0]
    g = gt_boxes.shape[0]
    centers = gravity_center(gt_boxes)  # [G, 3]
    dims = gt_boxes[:, 3:6]
    yaw = gt_boxes[:, 6]

    # face distances in the box frame: [P, G, 6]
    shift = points[:, None, :] - centers[None, :, :]  # [P, G, 3]
    local = rotate_points_z(jnp.swapaxes(shift, 0, 1), -yaw)  # [G, P, 3]
    local = jnp.swapaxes(local, 0, 1)
    half = dims[None, :, :] * 0.5
    dist_min = half + local  # distance to the min-face per axis
    dist_max = half - local
    face = jnp.stack(
        [
            dist_min[..., 0], dist_max[..., 0],
            dist_min[..., 1], dist_max[..., 1],
            dist_min[..., 2], dist_max[..., 2],
        ],
        axis=-1,
    )  # [P, G, 6]

    inside = jnp.min(face, axis=-1) > 0  # [P, G]
    inside = inside & points_valid[:, None] & gt_valid[None, :]

    # condition 2: per-box best scale
    scale_onehot = scales[:, None] == jnp.arange(n_scales)[None, :]  # [P, S]
    counts = jnp.einsum(
        "pg,ps->sg", inside.astype(jnp.float32), scale_onehot.astype(jnp.float32)
    )  # [S, G]
    lower = counts < limit
    lower_index = jnp.argmax(lower.astype(jnp.int32), axis=0) - 1
    lower_index = jnp.maximum(lower_index, 0)
    all_upper = jnp.all(~lower, axis=0)
    best_scale = jnp.where(all_upper, n_scales - 1, lower_index)  # [G]
    scale_ok = scales[:, None] == best_scale[None, :]  # [P, G]

    # condition 3: topk by centerness within the chosen scale
    centerness = compute_centerness(face)  # [P, G]
    cness = jnp.where(inside & scale_ok, centerness, -1.0)
    k = min(topk + 1, p)
    # (topk+1)-th largest per box via sort (top_k would all-gather under SPMD)
    thr = -jnp.sort(-cness, axis=0)[k - 1, :]  # [G]
    top_ok = cness > thr[None, :]

    # condition 4: min volume wins
    volumes = jnp.where(gt_valid, dims[:, 0] * dims[:, 1] * dims[:, 2], _FLOAT_MAX)
    vol = jnp.broadcast_to(volumes[None, :], (p, g))
    vol = jnp.where(inside & scale_ok & top_ok, vol, _FLOAT_MAX)
    min_vol = jnp.min(vol, axis=1)
    argmin = jnp.argmin(vol, axis=1)  # [P]

    labels = jnp.where(min_vol >= _FLOAT_MAX, -1, gt_labels[argmin]).astype(jnp.int32)
    chosen_face = jnp.take_along_axis(face, argmin[:, None, None], axis=1)[:, 0, :]
    centerness_t = compute_centerness(chosen_face)
    target_boxes = jnp.concatenate(
        [centers, dims, yaw[:, None]], axis=-1
    )[argmin]  # [P, 7] gravity-centered
    return AssignResult(centerness=centerness_t, bbox_targets=target_boxes, labels=labels)
