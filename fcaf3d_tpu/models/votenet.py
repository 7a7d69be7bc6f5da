"""VoteNet-v2 ("Mobius" VoteNet): vote module, head, detector, loss, NMS.

Clean-room equivalent of the reference's `VoteModule`
(`/root/reference/mmdet3d/models/model_utils/vote_module.py`), `VoteHeadV2`
(`models/dense_heads/vote_head_v2.py`) and the `VoteNet` detector
(`models/detectors/votenet.py`), with the direct (bin-free) box regression
and the same three yaw parametrizations as FCAF3D. Static shapes: padded
gt boxes, masked targets, fixed 256 proposals.

Config values follow `configs/votenet/votenet-v2_16x8_sunrgbd-3d-10class.py`.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.geometry import box7_corners, gravity_center, points_in_boxes
from ..core.nms import aligned_3d_nms
from .losses import iou3d_loss_sum
from .pointnet2 import DenseBNReLU, PointNet2SASSG, PointSAModule


class VoteModule(nn.Module):
    """Per-seed vote offsets + residual features (reference `vote_module.py`).

    vote_per_seed is fixed at 1 (the only value the shipped configs use)."""

    conv_channels: Sequence[int] = (256, 256)
    norm_feats: bool = True

    @nn.compact
    def __call__(self, seed_xyz, seed_feats, train: bool = False):
        """seed_xyz [B, N, 3], seed_feats [B, N, C] ->
        (vote_xyz [B, N, 3], vote_feats [B, N, C], offset [B, N, 3])."""
        c = seed_feats.shape[-1]
        x = seed_feats
        for i, ch in enumerate(self.conv_channels):
            x = DenseBNReLU(ch, name=f"vote_conv{i}")(x, train)
        votes = nn.Dense(3 + c, use_bias=True, name="conv_out")(x)
        offset = votes[..., :3]
        res_feats = votes[..., 3:]
        vote_xyz = seed_xyz + offset
        vote_feats = seed_feats + res_feats
        if self.norm_feats:
            # sqrt(sum^2 + eps), not linalg.norm: norm's backward is NaN at
            # exactly-zero features (maximum() can't fix the inner 0/0)
            norm = jnp.sqrt(
                jnp.sum(vote_feats ** 2, axis=-1, keepdims=True) + 1e-12)
            vote_feats = vote_feats / jnp.maximum(norm, 1e-8)
        return vote_xyz, vote_feats, offset


def _atan2_safe_x(y, x):
    """x operand for an atan2 whose GRADIENT stays finite at (0, 0):
    d atan2 = (-y, x)/(x^2+y^2) is NaN there, and the zero cotangent of an
    unused yaw column still propagates it (0 * nan). atan2(0, 1) == 0 ==
    atan2(0, 0), so the forward value is unchanged."""
    both_zero = (y == 0) & (x == 0)
    return jnp.where(both_zero, 1.0, x)


def decode_vote_bbox(aggregated_points, bbox_pred, yaw_parametrization="fcaf3d"):
    """Decode VoteHeadV2 regressions to gravity-centered box7
    (reference `vote_head_v2.py:196-237`)."""
    center = aggregated_points + bbox_pred[..., :3]
    if yaw_parametrization == "naive":
        dims = jnp.exp(bbox_pred[..., 3:6])
        yaw = bbox_pred[..., 6]
    elif yaw_parametrization == "sin-cos":
        norm = jnp.sqrt(bbox_pred[..., 6] ** 2 + bbox_pred[..., 7] ** 2 + 1e-12)
        yaw = jnp.arctan2(
            bbox_pred[..., 6] / norm, _atan2_safe_x(
                bbox_pred[..., 6], bbox_pred[..., 7]) / norm)
        dims = jnp.exp(bbox_pred[..., 3:6])
    else:  # fcaf3d / Mobius: (dx,dy,dz, ln scale, ln h, sin2a ln q, cos2a ln q)
        scale = jnp.exp(bbox_pred[..., 3])
        # epsilon: d/dx sqrt(x^2+y^2) is NaN at exactly (0, 0) — reachable
        # when an upstream tower's features are all zero (e.g. ImVoteNet's
        # img tower with an empty 2D detector)
        q = jnp.exp(jnp.sqrt(
            bbox_pred[..., 5] ** 2 + bbox_pred[..., 6] ** 2 + 1e-12))
        yaw = 0.5 * jnp.arctan2(
            bbox_pred[..., 5],
            _atan2_safe_x(bbox_pred[..., 5], bbox_pred[..., 6]))
        w = scale / (1 + q)
        dims = jnp.stack([w, w * q, jnp.exp(bbox_pred[..., 4])], axis=-1)
    return jnp.concatenate([center, dims, yaw[..., None]], axis=-1)


class VoteNet(nn.Module):
    """VoteNet-v2 detector: PointNet2SASSG -> VoteModule -> vote aggregation
    SA -> shared conv head -> (obj, sem, box) predictions."""

    n_classes: int = 10
    n_reg_outs: int = 7
    yaw_parametrization: str = "fcaf3d"
    num_proposal: int = 256
    sample_mod: str = "vote"  # train: 'vote'; test cfg uses 'seed'
    backbone_num_points: Sequence[int] = (2048, 1024, 512, 256)
    agg_radius: float = 0.3
    agg_num_sample: int = 16

    @nn.compact
    def __call__(self, points, valid=None, train: bool = False, sample_mod=None):
        sample_mod = sample_mod or self.sample_mod
        feat = PointNet2SASSG(
            num_points=self.backbone_num_points, name="backbone"
        )(points, valid=valid, train=train)
        seed_xyz = feat["fp_xyz"][-1]
        seed_feats = feat["fp_features"][-1]
        seed_indices = feat["fp_indices"][-1]

        vote_xyz, vote_feats, vote_offset = VoteModule(name="vote_module")(
            seed_xyz, seed_feats, train
        )

        agg = PointSAModule(
            num_point=self.num_proposal,
            radius=self.agg_radius,
            num_sample=self.agg_num_sample,
            mlp_channels=(128, 128, 128),
            name="vote_aggregation",
        )
        if sample_mod == "vote":
            aggregated_xyz, agg_feats, _ = agg(vote_xyz, vote_feats, train=train)
        elif sample_mod == "seed":
            from ..ops.pointnet import furthest_point_sample

            sample_indices = furthest_point_sample(seed_xyz, self.num_proposal)
            aggregated_xyz, agg_feats, _ = agg(
                vote_xyz, vote_feats, indices=sample_indices, train=train
            )
        else:
            raise ValueError(sample_mod)

        # BaseConvBboxHead: shared (128, 128) convs then 1x1 cls/reg heads
        x = agg_feats
        for i, ch in enumerate((128, 128)):
            x = DenseBNReLU(ch, name=f"shared_conv{i}")(x, train)
        cls_out = nn.Dense(self.n_classes + 2, use_bias=True, name="conv_cls")(x)
        reg_out = nn.Dense(self.n_reg_outs, use_bias=True, name="conv_reg")(x)

        bbox_preds = decode_vote_bbox(
            aggregated_xyz, reg_out, self.yaw_parametrization
        )
        return dict(
            seed_points=seed_xyz,
            seed_indices=seed_indices,
            vote_points=vote_xyz,
            vote_offset=vote_offset,
            aggregated_points=aggregated_xyz,
            obj_scores=cls_out[..., :2],
            sem_scores=cls_out[..., 2:],
            bbox_preds=bbox_preds,
        )


class VoteTargets(NamedTuple):
    vote_targets: jnp.ndarray  # [B, N, 3*gt_per_seed]
    vote_mask: jnp.ndarray  # [B, N]
    objectness: jnp.ndarray  # [B, P] {0,1}
    objectness_mask: jnp.ndarray  # [B, P] (pos or definite-neg)
    assigned_boxes: jnp.ndarray  # [B, P, 7] gravity-centered
    assigned_labels: jnp.ndarray  # [B, P]


def votenet_targets(
    points, gt_boxes, gt_labels, gt_valid, aggregated_points,
    gt_per_seed: int = 3, pos_thr: float = 0.3, neg_thr: float = 0.6,
):
    """Vectorized `get_targets_single` (reference `vote_head_v2.py:405-508`).

    points [B, N, 3]; gt bottom-centered box7 [B, G, 7]; aggregated [B, P, 3].
    """

    def single(pts, boxes, labels, bvalid, agg):
        centers = gravity_center(boxes)  # [G, 3]
        inside = points_in_boxes(pts, boxes) & bvalid[None, :]  # [N, G]
        vote_mask = jnp.any(inside, axis=1)
        # j-th (by box order) containing box per point, j < gt_per_seed
        rank = jnp.cumsum(inside, axis=1)  # [N, G]
        votes = []
        first_idx = jnp.argmax(inside, axis=1)  # first containing box
        first_vote = centers[first_idx] - pts
        for j in range(gt_per_seed):
            sel = inside & (rank == j + 1)
            has = jnp.any(sel, axis=1)
            bidx = jnp.argmax(sel, axis=1)
            v = centers[bidx] - pts
            votes.append(jnp.where(has[:, None], v, first_vote))
        vote_targets = jnp.concatenate(votes, axis=-1)  # [N, 3*gt_per_seed]
        vote_targets = jnp.where(vote_mask[:, None], vote_targets, 0.0)

        # proposal assignment: nearest valid gt center
        d2 = jnp.sum((agg[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(bvalid[None, :], d2, 1e10)
        assignment = jnp.argmin(d2, axis=1)  # [P]
        dist = jnp.sqrt(jnp.min(d2, axis=1) + 1e-6)
        objectness = (dist < pos_thr).astype(jnp.float32)
        obj_mask = ((dist < pos_thr) | (dist > neg_thr)).astype(jnp.float32)
        assigned_boxes = jnp.concatenate(
            [centers, boxes[:, 3:7]], axis=-1
        )[assignment]
        assigned_labels = labels[assignment]
        return (vote_targets, vote_mask, objectness, obj_mask,
                assigned_boxes, assigned_labels)

    out = jax.vmap(single)(points, gt_boxes, gt_labels, gt_valid, aggregated_points)
    return VoteTargets(*out)


def votenet_loss(
    preds: dict,
    points,
    gt_boxes,
    gt_labels,
    gt_valid,
    n_classes: int,
    with_yaw: bool = True,
    gt_per_seed: int = 3,
):
    """VoteNet-v2 loss assembly (reference `vote_head_v2.py:244-321` and the
    config loss weights: vote Chamfer-l1 dst x10, objectness CE [.2,.8] x5,
    center Chamfer-l2 src+dst x10, semantic CE x1, IoU3D x3)."""
    t = votenet_targets(
        points[..., :3], gt_boxes, gt_labels, gt_valid,
        preds["aggregated_points"], gt_per_seed,
    )

    # ------- vote loss (min over gt votes of L1 to the single vote) -------
    seed_idx = preds["seed_indices"]  # [B, S]
    seed_mask = jnp.take_along_axis(t.vote_mask, seed_idx, axis=1)
    seed_votes_t = jnp.take_along_axis(
        t.vote_targets, seed_idx[..., None], axis=1
    )  # [B, S, 3*gps]
    b, s = seed_idx.shape
    gt_votes = seed_votes_t.reshape(b, s, gt_per_seed, 3) + preds[
        "seed_points"
    ][:, :, None, :]
    diff = jnp.abs(preds["vote_points"][:, :, None, :] - gt_votes).sum(-1)
    min_d = jnp.min(diff, axis=-1)  # [B, S]
    w = seed_mask.astype(jnp.float32)
    w = w / (jnp.sum(w) + 1e-6)
    vote_loss = 10.0 * jnp.sum(min_d * w)

    # ------- objectness CE (class weights [0.2, 0.8], x5) -------
    logp = jax.nn.log_softmax(preds["obj_scores"], axis=-1)  # [B, P, 2]
    obj_t = t.objectness
    cls_w = 0.8 * obj_t + 0.2 * (1.0 - obj_t)
    ce = -(obj_t * logp[..., 1] + (1.0 - obj_t) * logp[..., 0]) * cls_w
    ow = t.objectness_mask / (jnp.sum(t.objectness_mask) + 1e-6)
    objectness_loss = 5.0 * jnp.sum(ce * ow)

    box_w = obj_t / (jnp.sum(obj_t) + 1e-6)  # [B, P]
    gt_w = gt_valid.astype(jnp.float32) / (jnp.sum(gt_valid) + 1e-6)

    # ------- center Chamfer (both directions, x10) -------
    centers = gravity_center(gt_boxes)  # [B, G, 3]
    pred_c = preds["bbox_preds"][..., :3]
    d2 = jnp.sum((pred_c[:, :, None, :] - centers[:, None, :, :]) ** 2, -1)
    d2 = jnp.where(gt_valid[:, None, :], d2, 1e10)
    src_min = jnp.min(d2, axis=2)  # [B, P]
    dst_min = jnp.min(d2, axis=1)  # [B, G] (min over all proposals)
    center_loss = 10.0 * (
        jnp.sum(src_min * box_w) + jnp.sum(jnp.where(gt_valid, dst_min, 0.0) * gt_w)
    )

    # ------- semantic CE (x1) -------
    sem_logp = jax.nn.log_softmax(preds["sem_scores"], axis=-1)
    sem_t = jax.nn.one_hot(t.assigned_labels, n_classes)
    sem_ce = -jnp.sum(sem_t * sem_logp, axis=-1)
    semantic_loss = jnp.sum(sem_ce * box_w)

    # ------- IoU3D loss (x3) -------
    iou_loss = 3.0 * iou3d_loss_sum(
        preds["bbox_preds"], t.assigned_boxes, box_w, with_yaw=with_yaw
    )

    return dict(
        vote_loss=vote_loss,
        objectness_loss=objectness_loss,
        center_loss=center_loss,
        semantic_loss=semantic_loss,
        iou_loss=iou_loss,
    )


class VoteDetections(NamedTuple):
    boxes: jnp.ndarray  # [B, D, 7] bottom-centered
    scores: jnp.ndarray  # [B, D]
    labels: jnp.ndarray  # [B, D]
    valid: jnp.ndarray  # [B, D]


def votenet_get_bboxes(
    preds: dict,
    points,
    n_classes: int,
    nms_thr: float = 0.25,
    score_thr: float = 0.05,
    per_class_proposal: bool = True,
):
    """Aligned-3D-NMS inference (reference `multiclass_nms_single`,
    `vote_head_v2.py:551-608`), static shapes."""

    def single(obj_logits, sem_logits, boxes7, pts):
        obj = jax.nn.softmax(obj_logits, axis=-1)[..., 1]  # [P]
        sem = jax.nn.softmax(sem_logits, axis=-1)  # [P, C]
        # gravity-centered -> bottom-centered for corners / point tests
        bc = boxes7.at[:, 2].add(-boxes7[:, 5] / 2)
        corners = box7_corners(bc)  # [P, 8, 3]
        minmax = jnp.concatenate(
            [jnp.min(corners, axis=1), jnp.max(corners, axis=1)], axis=-1
        )  # [P, 6]
        n_inside = jnp.sum(points_in_boxes(pts, bc), axis=0)  # [P]
        nonempty = n_inside > 5
        classes = jnp.argmax(sem, axis=-1)
        keep = aligned_3d_nms(minmax, obj, classes, nms_thr, valid=nonempty)
        selected = keep & (obj > score_thr)
        if per_class_proposal:
            p = boxes7.shape[0]
            scores = (obj[None, :] * sem.T).reshape(-1)  # [C*P]
            out_boxes = jnp.tile(bc, (n_classes, 1))
            labels = jnp.repeat(jnp.arange(n_classes), p)
            valid = jnp.tile(selected, (n_classes,)) & (scores > score_thr)
            return out_boxes, scores, labels.astype(jnp.int32), valid
        return bc, obj, classes.astype(jnp.int32), selected

    return VoteDetections(*jax.vmap(single)(
        preds["obj_scores"], preds["sem_scores"], preds["bbox_preds"],
        points[..., :3],
    ))
