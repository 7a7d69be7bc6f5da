"""ImVoteNet-v2: 2D-detection-guided VoteNet (stage 2), TPU-native.

Clean-room equivalent of the reference's `ImVoteNet` detector + `VoteFusion`
(`/root/reference/mmdet3d/models/detectors/imvotenet.py`,
`models/fusion_layers/vote_fusion.py`). The reference trains stage 2 with a
*frozen* pretrained 2D Faster R-CNN (`imvotenet.py:169-215`); here the 2D
branch takes precomputed 2D detections [x1, y1, x2, y2, conf, cls] per
image — produced in-framework by `detector2d.extract_bboxes_2d` (the
stage-1 FCOS-style branch trained by `tools/train_detector2d.py`), by an
external detector, or by GT boxes.

Fusion cues per (seed, imvote), exactly as `vote_fusion.py:12-199`:
geometric (2D-vote lifted to 3D ray: xz displacement + unit ray, 5 dims),
semantic (per-class confidence scatter, n_classes dims), texture (seed's
RGB pixel, 3 dims). Top `max_imvote_per_pixel` votes per seed by
(inside-box + confidence), then `num_sampled_seed` valid (seed, vote) pairs
are resampled, image cues pass an MLP, and the fused features feed three
weight-shared VoteNet towers (joint / points-only / image-only) with loss
weights [0.8, 0.1, 0.1].
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .pointnet2 import DenseBNReLU, PointNet2SASSG, PointSAModule
from .votenet import VoteModule, decode_vote_bbox

EPS = 1e-6


def project_to_image(xyz, depth2img):
    """Project depth-frame points [S, 3] with [3, 3] calib -> (uv [S, 2], z)."""
    proj = xyz @ depth2img.T
    z = proj[:, 2]
    uv = proj[:, :2] / jnp.maximum(z[:, None], EPS)
    return uv, z


def vote_fusion(
    image,  # [H, W, 3] raw 0-255
    boxes2d,  # [D, 6] (x1, y1, x2, y2, conf, cls)
    boxes2d_valid,  # [D]
    seeds_depth,  # [S, 3] seeds in the ORIGINAL depth frame
    depth2img,  # [3, 3]
    n_classes: int,
    max_imvote: int = 3,
):
    """Single-sample fusion cues. Returns (cues [S*max_imvote, 5+C+3],
    mask [S*max_imvote])."""
    s = seeds_depth.shape[0]
    d = boxes2d.shape[0]
    uv, z_cam = project_to_image(seeds_depth, depth2img)
    uv = jnp.round(uv - 1.0)

    l, t, r, b = boxes2d[:, 0], boxes2d[:, 1], boxes2d[:, 2], boxes2d[:, 3]
    conf = jnp.where(boxes2d_valid, boxes2d[:, 4], 0.0)
    cls = boxes2d[:, 5].astype(jnp.int32)

    inside = (
        (uv[:, None, 0] > l[None]) & (uv[:, None, 0] < r[None])
        & (uv[:, None, 1] > t[None]) & (uv[:, None, 1] < b[None])
        & boxes2d_valid[None, :]
    )  # [S, D]

    # semantic cue: class-scattered confidence [S, D, C]
    sem = (cls[None, :, None] == jnp.arange(n_classes)[None, None, :]) * conf[
        None, :, None
    ]
    sem = jnp.broadcast_to(sem, (s, d, n_classes))

    # geometric cue: lift the 2D center offset to a 3D ray (vote_fusion.py:104-135)
    mid_u = (l + r) / 2.0
    mid_v = (t + b) / 2.0
    delta_u = mid_u[None, :] - uv[:, None, 0]
    delta_v = mid_v[None, :] - uv[:, None, 1]
    imvote_uvz = jnp.stack(
        [delta_u, delta_v, jnp.zeros_like(delta_u)], axis=-1
    ) * z_cam[:, None, None]
    inv = jnp.linalg.inv(depth2img.T)
    imvote = imvote_uvz @ inv  # [S, D, 3] in depth frame
    seed_exp = jnp.broadcast_to(seeds_depth[:, None, :], (s, d, 3))
    ray = seed_exp + imvote
    ray = ray / jnp.sqrt(jnp.sum(ray ** 2, -1, keepdims=True) + EPS)
    # guard the forward-axis division: rays from invalid/degenerate boxes
    # can have ray_y ~ -EPS, and an inf here turns `* inside` (0 x inf)
    # into NaN — in the BACKWARD pass too, so masking alone cannot fix it
    den = ray[..., 1:2]
    den = jnp.where(jnp.abs(den) < 1e-4,
                    jnp.where(den < 0, -1e-4, 1e-4), den)
    xz = (
        ray[..., jnp.array([0, 2])] / den * seed_exp[..., 1:2]
        - seed_exp[..., jnp.array([0, 2])]
    )
    geo = jnp.concatenate([xz, ray], axis=-1)  # [S, D, 5]

    cues = jnp.concatenate([geo, sem], axis=-1) * inside[..., None]

    # top max_imvote per seed by inside + confidence
    pair_score = inside.astype(jnp.float32) + jnp.broadcast_to(conf[None], (s, d))
    if d < max_imvote:
        padn = max_imvote - d
        pair_score = jnp.pad(pair_score, ((0, 0), (0, padn)))
        cues = jnp.pad(cues, ((0, 0), (0, padn), (0, 0)))
    order = jnp.argsort(-pair_score, axis=1)[:, :max_imvote]  # [S, V]
    top_score = jnp.take_along_axis(pair_score, order, axis=1)
    top_cues = jnp.take_along_axis(cues, order[..., None], axis=1)  # [S, V, F]
    mask = jnp.floor(top_score) >= 1.0  # inside-box pairs only

    # texture cue: seed pixel RGB (normalized), shared across its votes
    h, w = image.shape[:2]
    px = jnp.clip(jnp.round(uv[:, 0]), 0, w - 1).astype(jnp.int32)
    py = jnp.clip(jnp.round(uv[:, 1]), 0, h - 1).astype(jnp.int32)
    rgb = image[py, px] / 255.0  # [S, 3]
    txt = jnp.broadcast_to(rgb[:, None, :], (s, max_imvote, 3))

    out = jnp.concatenate([top_cues, txt], axis=-1)  # [S, V, 5+C+3]
    return out.reshape(s * max_imvote, -1), mask.reshape(s * max_imvote)


def sample_valid_seeds(mask, k: int):
    """Indices of k valid imvotes, cycling when fewer than k are valid
    (`imvotenet.py:12-48` semantics, static shapes). mask: [M] bool.

    With NO valid imvote (empty 2D detector output) falls back to a uniform
    cycle over all seeds instead of repeating one row k times — 128 copies
    of a single point make the downstream FPS/grouping geometry degenerate
    (and its backward inf)."""
    m = mask.shape[0]
    order = jnp.argsort(~mask, stable=True)  # valid first, original order
    cnt = jnp.maximum(jnp.sum(mask), 1)
    ar = jnp.arange(k)
    first = order[jnp.minimum(ar, m - 1)]
    idx = jnp.where(ar < cnt, first, order[ar % cnt]).astype(jnp.int32)
    return jnp.where(jnp.any(mask), idx, (ar % m).astype(jnp.int32))


class ImVoteNet(nn.Module):
    """Stage-2 ImVoteNet: point backbone + vote fusion + three shared-weight
    VoteNet towers."""

    n_classes: int = 10
    n_reg_outs: int = 7
    yaw_parametrization: str = "fcaf3d"
    num_proposal: int = 256
    num_sampled_seed: int = 1024
    max_imvote: int = 3
    backbone_num_points: Sequence[int] = (2048, 1024, 512, 256)
    loss_weights: Sequence[float] = (0.8, 0.1, 0.1)

    def _tower(self, mods, feat_dict, train, sample_mod):
        """One VoteNet tower pass; `mods` are submodule instances created
        once in __call__, so joint/pts/img towers share weights."""
        vote_module, agg, shared, conv_cls, conv_reg = mods
        seed_xyz = feat_dict["seed_points"]
        seed_feats = feat_dict["seed_features"]
        vote_xyz, vote_feats, vote_offset = vote_module(seed_xyz, seed_feats, train)
        if sample_mod == "seed":
            from ..ops.pointnet import furthest_point_sample

            si = furthest_point_sample(seed_xyz, self.num_proposal)
            aggregated_xyz, agg_feats, _ = agg(
                vote_xyz, vote_feats, indices=si, train=train)
        else:
            aggregated_xyz, agg_feats, _ = agg(vote_xyz, vote_feats, train=train)
        x = agg_feats
        for layer in shared:
            x = layer(x, train)
        cls_out = conv_cls(x)
        reg_out = conv_reg(x)
        bbox_preds = decode_vote_bbox(
            aggregated_xyz, reg_out, self.yaw_parametrization)
        return dict(
            seed_points=seed_xyz,
            seed_indices=feat_dict["seed_indices"],
            vote_points=vote_xyz,
            vote_offset=vote_offset,
            aggregated_points=aggregated_xyz,
            obj_scores=cls_out[..., :2],
            sem_scores=cls_out[..., 2:],
            bbox_preds=bbox_preds,
        )

    @nn.compact
    def __call__(
        self,
        points,  # [B, N, 3+F] augmented-frame cloud
        images,  # [B, H, W, 3]
        boxes2d,  # [B, D, 6]
        boxes2d_valid,  # [B, D]
        seeds_depth_fn=None,  # maps seeds to original depth frame (aug undo)
        depth2img=None,  # [B, 3, 3]
        valid=None,
        train: bool = False,
        sample_mod: str = "vote",
        towers: Sequence[str] = ("joint", "pts", "img"),
    ):
        feat = PointNet2SASSG(
            num_points=self.backbone_num_points, name="backbone"
        )(points, valid=valid, train=train)
        seeds = feat["fp_xyz"][-1]
        seed_feats = feat["fp_features"][-1]
        seed_idx = feat["fp_indices"][-1]

        seeds_depth = seeds_depth_fn(seeds) if seeds_depth_fn else seeds
        cues, mask = jax.vmap(
            lambda im, bx, bv, sd, c: vote_fusion(
                im, bx, bv, sd, c, self.n_classes, self.max_imvote
            )
        )(images, boxes2d, boxes2d_valid, seeds_depth, depth2img)

        inds = jax.vmap(lambda m: sample_valid_seeds(m, self.num_sampled_seed))(
            mask
        )  # [B, K] into S*V
        cues = jnp.take_along_axis(cues, inds[..., None], axis=1)  # [B, K, F]
        seed_sel = inds % seeds.shape[1]
        sel_xyz = jnp.take_along_axis(seeds, seed_sel[..., None], axis=1)
        sel_feats = jnp.take_along_axis(seed_feats, seed_sel[..., None], axis=1)
        sel_idx = jnp.take_along_axis(seed_idx, seed_sel, axis=1)

        # img MLP (reference img_mlp: 18 -> 256 -> 256)
        x = cues
        for i, ch in enumerate((256, 256)):
            x = DenseBNReLU(ch, name=f"img_mlp{i}")(x, train)
        img_feats = x

        mods = (
            VoteModule(name="vote_module"),
            PointSAModule(
                num_point=self.num_proposal, radius=0.3, num_sample=16,
                mlp_channels=(128, 128, 128), name="vote_aggregation",
            ),
            [DenseBNReLU(128, name=f"shared_conv{i}") for i in range(2)],
            nn.Dense(self.n_classes + 2, use_bias=True, name="conv_cls"),
            nn.Dense(self.n_reg_outs, use_bias=True, name="conv_reg"),
        )
        outs = {}
        variants = {
            "joint": jnp.concatenate([sel_feats, img_feats], axis=-1),
            "pts": jnp.concatenate([sel_feats, jnp.zeros_like(img_feats)], -1),
            "img": jnp.concatenate([jnp.zeros_like(sel_feats), img_feats], -1),
        }
        for name in towers:
            outs[name] = self._tower(
                mods,
                dict(seed_points=sel_xyz, seed_features=variants[name],
                     seed_indices=sel_idx),
                train, sample_mod,
            )
        return outs


def imvotenet_loss(tower_outs, points, gt_boxes, gt_labels, gt_valid,
                   n_classes, loss_weights=(0.8, 0.1, 0.1)):
    """Weighted sum of the three towers' VoteNet losses (`imvotenet.py:486-509`)."""
    from .votenet import votenet_loss

    total = {}
    for w, (name, preds) in zip(loss_weights, tower_outs.items()):
        losses = votenet_loss(preds, points, gt_boxes, gt_labels, gt_valid,
                              n_classes=n_classes)
        for k, v in losses.items():
            total[f"{name}_{k}"] = w * v
    return total
