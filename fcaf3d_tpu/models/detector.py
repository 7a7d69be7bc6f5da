"""FCAF3D detector: voxelize -> sparse ResNet -> neck/head.

Equivalent of `SingleStageSparse3DDetector`
(`/root/reference/mmdet3d/models/detectors/single_stage_sparse.py`):
`extract_feat` collates points into a sparse tensor with coords p/voxel_size
and features rgb/255 (`:34-37`), then backbone + neck-with-head. Loss and
inference post-processing are pure functions over the head outputs
(`fcaf3d_loss` / `fcaf3d_get_bboxes` in `fcaf3d_head.py`).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..configs.fcaf3d import FCAF3DConfig
from ..ops.sparse.tensor import voxelize
from .fcaf3d_head import (
    Fcaf3DNeckWithHead,
    FcafLossConfig,
    FcafTestConfig,
    fcaf3d_get_bboxes,
    fcaf3d_loss,
)
from .me_resnet import MEResNet3D


class FCAF3D(nn.Module):
    cfg: FCAF3DConfig

    @nn.compact
    def __call__(self, points, colors, valid, train: bool = False):
        """Args: points [B, P, 3] metric; colors [B, P, C] raw 0-255 RGB;
        valid [B, P] bool. Returns per-level `HeadLevelOutput`s."""
        c = self.cfg
        st = voxelize(
            points,
            colors / 255.0,
            valid,
            voxel_size=c.voxel_size,
            budget=c.input_budget,
        )
        st = st.with_feats(st.feats.astype(c.compute_dtype))
        feats = MEResNet3D(
            depth=c.depth,
            n_outs=c.n_outs,
            budgets=c.backbone_budgets,
            name="backbone",
        )(st, train)
        # overflow telemetry: any nonzero count means a voxel budget dropped
        # real voxels (collect with mutable=["overflow"]; logged by the
        # trainer as overflow_max)
        self.sow("overflow", "input", st.dropped)
        for i, f in enumerate(feats):
            if f.dropped is not None:
                self.sow("overflow", f"backbone_s{f.stride}", f.dropped)
        return Fcaf3DNeckWithHead(
            n_classes=c.n_classes,
            out_channels=c.head_out_channels,
            n_reg_outs=c.n_reg_outs,
            voxel_size=c.voxel_size,
            neck_budgets=c.neck_budgets[: c.n_outs],
            neck_mode=c.neck_mode,
            name="neck_with_head",
        )(feats, train)


def loss_config(cfg: FCAF3DConfig) -> FcafLossConfig:
    return FcafLossConfig(
        n_scales=cfg.n_outs,
        assign_limit=cfg.assign_limit,
        assign_topk=cfg.assign_topk,
        with_yaw=cfg.with_yaw,
        yaw_parametrization=cfg.yaw_parametrization,
    )


def infer_config(cfg: FCAF3DConfig) -> FcafTestConfig:
    return FcafTestConfig(
        nms_pre=cfg.nms_pre,
        iou_thr=cfg.iou_thr,
        score_thr=cfg.score_thr,
        nms_cap=cfg.nms_cap,
        with_yaw=cfg.with_yaw,
        yaw_parametrization=cfg.yaw_parametrization,
    )


__all__ = [
    "FCAF3D",
    "loss_config",
    "infer_config",
    "fcaf3d_loss",
    "fcaf3d_get_bboxes",
]
