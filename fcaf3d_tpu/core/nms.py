"""Fixed-shape 3D NMS (TPU-friendly) replacing the reference's CUDA NMS ops.

Replaces `pcdet_nms_gpu` / `pcdet_nms_normal_gpu`
(`/root/reference/mmdet3d/ops/pcdet_nms/`) used by FCAF3D inference
(`fcaf3d_neck_with_head.py:332-374`) and `aligned_3d_nms`
(`core/post_processing/box3d_nms.py:129`) used by VoteNet.

Design: instead of a dynamic-shape greedy loop with a 64-bit mask bitmap, we
precompute a static [K, K] IoU matrix and run the greedy suppression as a
`lax.fori_loop` over score-sorted candidates — all shapes static, jit-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotated_iou import pairwise_iou_bev


def _greedy_suppress(iou, order_valid, iou_thr):
    """Greedy NMS given a [K, K] IoU matrix in score-descending order.

    Args:
        iou: [K, K] IoU between score-sorted candidates.
        order_valid: [K] bool, False rows are padding (never kept).
        iou_thr: suppression threshold.

    Returns:
        keep: [K] bool mask over the *sorted* candidates.
    """
    k = iou.shape[0]
    suppr = iou > iou_thr

    def body(i, alive):
        keep_i = alive[i]
        kill = suppr[i] & keep_i
        kill = kill.at[i].set(False)
        return alive & ~kill

    alive = jnp.asarray(order_valid)
    alive = jax.lax.fori_loop(0, k, body, alive)
    return alive


def nms_bev(boxes7, scores, iou_thr, valid=None, rotated=True):
    """BEV NMS on 7-DoF boxes (x, y, z, dx, dy, dz, yaw), pcdet semantics.

    Args:
        boxes7: [K, 7] candidates (any z convention — only BEV is used).
        scores: [K] scores; padding rows should carry -inf or use `valid`.
        iou_thr: float.
        valid: optional [K] bool candidate mask.
        rotated: True -> rotated BEV IoU (`pcdet_nms_gpu`); False -> yaw
            forced to 0 (`pcdet_nms_normal_gpu` path, reference `_nms`
            zero-pads the yaw column, `fcaf3d_neck_with_head.py:346-348`).

    Returns:
        keep: [K] bool mask in the *original* candidate order.
    """
    k = boxes7.shape[0]
    if valid is None:
        valid = jnp.ones((k,), dtype=bool)
    masked_scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-masked_scores)
    sboxes = boxes7[order]
    svalid = valid[order]

    bev = sboxes[:, jnp.array([0, 1, 3, 4, 6])]
    if rotated:
        iou = pairwise_iou_bev(bev, bev)
    else:
        # pcdet nms_normal: axis-aligned BEV overlap, heading ignored — far
        # cheaper than polygon clipping
        lo = bev[:, :2] - bev[:, 2:4] * 0.5
        hi = bev[:, :2] + bev[:, 2:4] * 0.5
        inter = jnp.clip(
            jnp.minimum(hi[:, None, :], hi[None, :, :])
            - jnp.maximum(lo[:, None, :], lo[None, :, :]),
            0.0,
        )
        inter_a = inter[..., 0] * inter[..., 1]
        area = bev[:, 2] * bev[:, 3]
        union = area[:, None] + area[None, :] - inter_a
        iou = inter_a / jnp.maximum(union, 1e-8)

    keep_sorted = _greedy_suppress(iou, svalid, iou_thr)
    keep = jnp.zeros((k,), dtype=bool).at[order].set(keep_sorted)
    return keep


def aligned_3d_nms(boxes6, scores, classes, iou_thr, valid=None):
    """Axis-aligned 3D NMS on corner-form boxes [K, 6] = (x1,y1,z1,x2,y2,z2).

    Mirrors `aligned_3d_nms` (`core/post_processing/box3d_nms.py:129`):
    full-3D IoU, suppression only within the same class.
    """
    k = boxes6.shape[0]
    if valid is None:
        valid = jnp.ones((k,), dtype=bool)
    masked_scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-masked_scores)
    b = boxes6[order]
    svalid = valid[order]
    scls = classes[order]

    lo1, hi1 = b[:, None, :3], b[:, None, 3:6]
    lo2, hi2 = b[None, :, :3], b[None, :, 3:6]
    inter = jnp.clip(jnp.minimum(hi1, hi2) - jnp.maximum(lo1, lo2), 0.0)
    vol_i = jnp.prod(inter, axis=-1)
    vol1 = jnp.prod(b[:, 3:6] - b[:, :3], axis=-1)
    union = vol1[:, None] + vol1[None, :] - vol_i
    iou = vol_i / jnp.maximum(union, 1e-8)
    same_cls = scls[:, None] == scls[None, :]
    iou = jnp.where(same_cls, iou, 0.0)

    keep_sorted = _greedy_suppress(iou, svalid, iou_thr)
    keep = jnp.zeros((k,), dtype=bool).at[order].set(keep_sorted)
    return keep
