"""Upstream VoteNet (v1): bin-based VoteHead + PartialBinBasedBBoxCoder.

Clean-room equivalent of the reference's original `VoteHead`
(`/root/reference/mmdet3d/models/dense_heads/vote_head.py`) and
`PartialBinBasedBBoxCoder`
(`core/bbox/coders/partial_bin_based_bbox_coder.py`), the config-parity
companion of the direct-regression VoteNet-v2 in `votenet.py`. Shares the
backbone, vote module, aggregation SA and NMS path with v2; differs in the
prediction head channels, the bin-based encode/decode, and the loss
assembly (CE over direction/size bins + smooth-L1 residuals,
`configs/_base_/models/votenet.py` loss weights).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.geometry import gravity_center
from .pointnet2 import DenseBNReLU, PointNet2SASSG, PointSAModule
from .votenet import VoteModule, votenet_targets, votenet_get_bboxes


@dataclasses.dataclass(frozen=True)
class PartialBinBasedBBoxCoder:
    """Bin-based box coder (reference
    `partial_bin_based_bbox_coder.py:9-245`): size decoded as
    `mean_sizes[argmax size_class] + size_res`, direction as
    `bin_center(argmax dir_class) + dir_res`."""

    num_dir_bins: int
    num_sizes: int
    mean_sizes: Tuple[Tuple[float, float, float], ...]
    with_rot: bool = True

    @property
    def angle_per_class(self) -> float:
        return 2 * np.pi / self.num_dir_bins

    def angle2class(self, angle):
        """Continuous angle -> (bin index, residual from bin center)
        (reference `:203-222`)."""
        angle = angle % (2 * np.pi)
        shifted = (angle + self.angle_per_class / 2) % (2 * np.pi)
        cls = jnp.floor(shifted / self.angle_per_class).astype(jnp.int32)
        res = shifted - (cls * self.angle_per_class + self.angle_per_class / 2)
        return cls, res

    def class2angle(self, cls, res):
        """Inverse of angle2class, wrapped to (-pi, pi] (reference
        `:224-245`)."""
        angle = cls.astype(jnp.float32) * self.angle_per_class + res
        return jnp.where(angle > np.pi, angle - 2 * np.pi, angle)

    def encode(self, boxes7_gravity, labels):
        """Gravity-centered box7 [..., 7] + labels -> targets (reference
        `encode`, `:27-56`): (center, size_class, size_res, dir_class,
        dir_res)."""
        center = boxes7_gravity[..., :3]
        size_class = labels
        means = jnp.asarray(self.mean_sizes, jnp.float32)
        size_res = boxes7_gravity[..., 3:6] - means[labels]
        if self.with_rot:
            dir_class, dir_res = self.angle2class(boxes7_gravity[..., 6])
        else:
            dir_class = jnp.zeros_like(labels)
            dir_res = jnp.zeros(boxes7_gravity.shape[:-1], jnp.float32)
        return center, size_class, size_res, dir_class, dir_res

    def split_pred(self, cls_out, reg_out, base_xyz):
        """Split raw head outputs into named parts (reference `split_pred`,
        `:139-199`). cls_out [..., 2+C]; reg_out [..., 3+2B+4S]."""
        results = {
            "obj_scores": cls_out[..., :2],
            "sem_scores": cls_out[..., 2:],
            "center": base_xyz + reg_out[..., :3],
        }
        s = 3
        b = self.num_dir_bins
        results["dir_class"] = reg_out[..., s:s + b]
        s += b
        results["dir_res_norm"] = reg_out[..., s:s + b]
        results["dir_res"] = results["dir_res_norm"] * (np.pi / b)
        s += b
        results["size_class"] = reg_out[..., s:s + self.num_sizes]
        s += self.num_sizes
        ns = self.num_sizes
        size_res_norm = reg_out[..., s:s + 3 * ns]
        size_res_norm = size_res_norm.reshape(
            size_res_norm.shape[:-1] + (ns, 3))
        results["size_res_norm"] = size_res_norm
        means = jnp.asarray(self.mean_sizes, jnp.float32)
        results["size_res"] = size_res_norm * means[None, None]
        return results

    def decode(self, preds: dict):
        """Predicted parts -> gravity-centered box7 (reference `decode`,
        `:58-101`)."""
        center = preds["center"]
        if self.with_rot:
            dir_class = jnp.argmax(preds["dir_class"], axis=-1)
            dir_res = jnp.take_along_axis(
                preds["dir_res"], dir_class[..., None], axis=-1
            )[..., 0]
            yaw = self.class2angle(dir_class, dir_res)
        else:
            yaw = jnp.zeros(center.shape[:-1], jnp.float32)
        size_class = jnp.argmax(preds["size_class"], axis=-1)  # [..., ]
        size_res = jnp.take_along_axis(
            preds["size_res"],
            size_class[..., None, None].repeat(3, -1), axis=-2
        )[..., 0, :]
        means = jnp.asarray(self.mean_sizes, jnp.float32)
        dims = means[size_class] + size_res
        return jnp.concatenate([center, dims, yaw[..., None]], axis=-1)


class VoteNetV1(nn.Module):
    """Upstream VoteNet detector with the bin-based head (reference
    `models/detectors/votenet.py` + `dense_heads/vote_head.py`)."""

    coder: PartialBinBasedBBoxCoder
    n_classes: int = 10
    num_proposal: int = 256
    sample_mod: str = "vote"
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

        x = agg_feats
        for i, ch in enumerate((128, 128)):
            x = DenseBNReLU(ch, name=f"shared_conv{i}")(x, train)
        c = self.coder
        cls_out = nn.Dense(self.n_classes + 2, use_bias=True, name="conv_cls")(x)
        n_reg = 3 + 2 * c.num_dir_bins + 4 * c.num_sizes
        reg_out = nn.Dense(n_reg, use_bias=True, name="conv_reg")(x)

        preds = c.split_pred(cls_out, reg_out, aggregated_xyz)
        preds.update(
            seed_points=seed_xyz,
            seed_indices=seed_indices,
            vote_points=vote_xyz,
            vote_offset=vote_offset,
            aggregated_points=aggregated_xyz,
            bbox_preds=c.decode(preds),
        )
        return preds


def _smooth_l1(x, beta: float = 1.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def votenet_v1_loss(
    preds: dict,
    points,
    gt_boxes,
    gt_labels,
    gt_valid,
    coder: PartialBinBasedBBoxCoder,
    n_classes: int,
    gt_per_seed: int = 3,
):
    """Bin-based VoteHead loss (reference `vote_head.py:220-346` with the
    `configs/_base_/models/votenet.py` weights: vote Chamfer-l1 dst x10,
    objectness CE [.2,.8] x5, center Chamfer-l2 src+dst x10, dir-class CE
    x1, dir-res smooth-L1 x10, size-class CE x1, size-res smooth-L1 x10/3,
    semantic CE x1)."""
    t = votenet_targets(
        points[..., :3], gt_boxes, gt_labels, gt_valid,
        preds["aggregated_points"], gt_per_seed,
    )

    # vote loss: identical to v2 (same VoteModule loss definition)
    seed_idx = preds["seed_indices"]
    seed_mask = jnp.take_along_axis(t.vote_mask, seed_idx, axis=1)
    seed_votes_t = jnp.take_along_axis(t.vote_targets, seed_idx[..., None], axis=1)
    b, s = seed_idx.shape
    gt_votes = seed_votes_t.reshape(b, s, gt_per_seed, 3) + preds[
        "seed_points"][:, :, None, :]
    diff = jnp.abs(preds["vote_points"][:, :, None, :] - gt_votes).sum(-1)
    w = seed_mask.astype(jnp.float32)
    w = w / (jnp.sum(w) + 1e-6)
    vote_loss = 10.0 * jnp.sum(jnp.min(diff, axis=-1) * w)

    # objectness CE ([0.2, 0.8] class weights, x5)
    logp = jax.nn.log_softmax(preds["obj_scores"], axis=-1)
    obj_t = t.objectness
    cls_w = 0.8 * obj_t + 0.2 * (1.0 - obj_t)
    ce = -(obj_t * logp[..., 1] + (1.0 - obj_t) * logp[..., 0]) * cls_w
    ow = t.objectness_mask / (jnp.sum(t.objectness_mask) + 1e-6)
    objectness_loss = 5.0 * jnp.sum(ce * ow)

    box_w = obj_t / (jnp.sum(obj_t) + 1e-6)  # [B, P]
    gt_w = gt_valid.astype(jnp.float32) / (jnp.sum(gt_valid) + 1e-6)

    # center Chamfer-l2 both directions (x10 each)
    centers = gravity_center(gt_boxes)
    pred_c = preds["center"]
    d2 = jnp.sum((pred_c[:, :, None, :] - centers[:, None, :, :]) ** 2, -1)
    d2 = jnp.where(gt_valid[:, None, :], d2, 1e10)
    center_loss = 10.0 * (
        jnp.sum(jnp.min(d2, axis=2) * box_w)
        + jnp.sum(jnp.where(gt_valid, jnp.min(d2, axis=1), 0.0) * gt_w)
    )

    # bin targets from the assigned (nearest-center) gt box
    _, size_cls_t, size_res_t, dir_cls_t, dir_res_t = coder.encode(
        t.assigned_boxes, t.assigned_labels
    )
    dir_res_t = dir_res_t / (np.pi / coder.num_dir_bins)
    means = jnp.asarray(coder.mean_sizes, jnp.float32)
    size_res_t = size_res_t / means[t.assigned_labels]  # normalized residual

    # direction bin CE (x1) + residual smooth-L1 at the target bin (x10)
    dir_logp = jax.nn.log_softmax(preds["dir_class"], axis=-1)
    dir_class_loss = jnp.sum(
        -jnp.take_along_axis(dir_logp, dir_cls_t[..., None], -1)[..., 0] * box_w
    )
    dir_res_pred = jnp.take_along_axis(
        preds["dir_res_norm"], dir_cls_t[..., None], -1
    )[..., 0]
    dir_res_loss = 10.0 * jnp.sum(_smooth_l1(dir_res_pred - dir_res_t) * box_w)

    # size bin CE (x1) + residual smooth-L1 at the target bin (x10/3)
    size_logp = jax.nn.log_softmax(preds["size_class"], axis=-1)
    size_class_loss = jnp.sum(
        -jnp.take_along_axis(size_logp, size_cls_t[..., None], -1)[..., 0] * box_w
    )
    size_res_pred = jnp.take_along_axis(
        preds["size_res_norm"],
        size_cls_t[..., None, None].repeat(3, -1), axis=-2
    )[..., 0, :]
    size_res_loss = (10.0 / 3.0) * jnp.sum(
        jnp.sum(_smooth_l1(size_res_pred - size_res_t), -1) * box_w
    )

    # semantic CE (x1)
    sem_logp = jax.nn.log_softmax(preds["sem_scores"], axis=-1)
    sem_t = jax.nn.one_hot(t.assigned_labels, n_classes)
    semantic_loss = jnp.sum(-jnp.sum(sem_t * sem_logp, -1) * box_w)

    return dict(
        vote_loss=vote_loss,
        objectness_loss=objectness_loss,
        center_loss=center_loss,
        dir_class_loss=dir_class_loss,
        dir_res_loss=dir_res_loss,
        size_class_loss=size_class_loss,
        size_res_loss=size_res_loss,
        semantic_loss=semantic_loss,
    )


def votenet_v1_get_bboxes(preds: dict, points, n_classes: int, **kw):
    """Inference: identical aligned-NMS path as v2 (`votenet_get_bboxes`) on
    the coder-decoded boxes already present in `preds['bbox_preds']`."""
    return votenet_get_bboxes(preds, points, n_classes, **kw)


SUNRGBD_MEAN_SIZES = (
    (2.114256, 1.620300, 0.927272), (0.791118, 1.279516, 0.718182),
    (0.923508, 1.867419, 0.845495), (0.591958, 0.552978, 0.827272),
    (0.699104, 0.454178, 0.75625), (0.69519, 1.346299, 0.736364),
    (0.528526, 1.002642, 1.172878), (0.500618, 0.632163, 0.683424),
    (0.404671, 1.071108, 1.688889), (0.76584, 1.398258, 0.472728),
)

SCANNET_MEAN_SIZES = (
    (0.76966727, 0.8116021, 0.92573744), (1.876858, 1.8425595, 1.1931566),
    (0.61328, 0.6148609, 0.7182701), (1.3955007, 1.5121545, 0.83443564),
    (0.97949594, 1.0675149, 0.6329687), (0.531663, 0.5955577, 1.7500148),
    (0.9624706, 0.72462326, 1.1481868), (0.83221924, 1.0490936, 1.6875663),
    (0.21132214, 0.4206159, 0.5372846), (1.4440073, 1.8970833, 0.26985747),
    (1.0294262, 1.4040797, 0.87554324), (1.3766412, 0.65521795, 1.6813129),
    (0.6650819, 0.71111923, 1.298853), (0.41999173, 0.37906948, 1.7513971),
    (0.59359556, 0.5912492, 0.73919016), (0.50867593, 0.50656086, 0.30136237),
    (1.1511526, 1.0546296, 0.49706793), (0.47535285, 0.49249494, 0.5802117),
)


def sunrgbd_coder() -> PartialBinBasedBBoxCoder:
    """`votenet_16x8_sunrgbd-3d-10class.py`: 12 direction bins, 10 sizes."""
    return PartialBinBasedBBoxCoder(
        num_dir_bins=12, num_sizes=10, mean_sizes=SUNRGBD_MEAN_SIZES,
        with_rot=True,
    )


def scannet_coder() -> PartialBinBasedBBoxCoder:
    """`votenet_8x8_scannet-3d-18class.py`: axis-aligned, 18 sizes."""
    return PartialBinBasedBBoxCoder(
        num_dir_bins=1, num_sizes=18, mean_sizes=SCANNET_MEAN_SIZES,
        with_rot=False,
    )
