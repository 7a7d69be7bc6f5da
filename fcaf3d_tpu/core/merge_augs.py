"""Test-time-augmentation merging (`merge_aug_bboxes_3d` equivalent,
`/root/reference/mmdet3d/core/post_processing/merge_augs.py:7-60`):
invert each augmentation's flips/scale on its detections, concatenate, and
run one multi-class NMS."""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from .geometry import flip_box7
from .nms import nms_bev


def invert_aug_boxes(boxes7, scale_factor=1.0, flip_horizontal=False,
                     flip_vertical=False):
    """Undo GlobalRotScaleTrans scaling and RandomFlip3D flips on box7."""
    b = boxes7
    if flip_vertical:
        b = flip_box7(b, "vertical")
    if flip_horizontal:
        b = flip_box7(b, "horizontal")
    if scale_factor != 1.0:
        b = jnp.concatenate([b[..., :6] / scale_factor, b[..., 6:7]], axis=-1)
    return b


def merge_aug_detections(
    boxes_list: Sequence[jnp.ndarray],
    scores_list: Sequence[jnp.ndarray],
    labels_list: Sequence[jnp.ndarray],
    valid_list: Sequence[jnp.ndarray],
    aug_metas: Sequence[dict],
    iou_thr: float = 0.5,
    rotated: bool = False,
):
    """Merge per-aug detections of ONE sample. Returns concatenated
    (boxes, scores, labels, keep) with NMS applied per class label."""
    inv = [
        invert_aug_boxes(
            b,
            meta.get("pcd_scale_factor", 1.0),
            meta.get("flip_horizontal", False),
            meta.get("flip_vertical", False),
        )
        for b, meta in zip(boxes_list, aug_metas)
    ]
    boxes = jnp.concatenate(inv, axis=0)
    scores = jnp.concatenate(scores_list, axis=0)
    labels = jnp.concatenate(labels_list, axis=0)
    valid = jnp.concatenate(valid_list, axis=0)

    # class-wise NMS: suppress only within the same label by offsetting boxes
    # per class (standard trick keeps one static NMS call)
    offset = labels.astype(boxes.dtype) * 100.0
    shifted = boxes.at[:, 0].add(offset)
    keep = nms_bev(shifted, scores, iou_thr, valid=valid, rotated=rotated)
    return boxes, scores, labels, keep & valid
