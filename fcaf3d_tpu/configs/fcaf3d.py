"""Declarative FCAF3D configs (dataclasses replace the reference's
mmcv config-file inheritance, `/root/reference/configs/fcaf3d/`).

The three north-star configs mirror `fcaf3d_scannet-3d-18class.py`,
`fcaf3d_sunrgbd-3d-10class.py`, `fcaf3d_s3dis-3d-5class.py`; voxel budgets
are the TPU static-shape counterpart of MinkowskiEngine's dynamic maps and
the `pts_threshold=100000` neck pruning.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class FCAF3DConfig:
    # model
    n_classes: int = 18
    in_channels: int = 3
    depth: int = 34
    n_outs: int = 4
    head_out_channels: int = 128
    n_reg_outs: int = 6
    voxel_size: float = 0.01
    yaw_parametrization: str = "fcaf3d"
    with_yaw: bool = False
    # neck ordering: "prune_early" (TPU-native, prune children by coarse
    # scores BEFORE the up conv) or "reference" (conv over all 8P children,
    # union-add, then prune — exact reference semantics for parity runs)
    neck_mode: str = "prune_early"

    # activation dtype on the conv path (params stay f32); bf16 doubles MXU
    # rate and halves gather/scatter HBM traffic on TPU
    compute_dtype: str = "bfloat16"
    # static row budgets
    num_points: int = 100000  # input point sample (IndoorPointSample)
    input_budget: int = 98304  # stride-1 voxels after dedup
    backbone_budgets: Tuple[int, ...] = (65536, 32768, 24576, 8192, 3072, 1024)
    neck_budgets: Tuple[int, ...] = (32768, 16384, 4096, 1024)
    max_gt_boxes: int = 64
    # assigner (reference `configs/fcaf3d/fcaf3d.py:18-22`)
    assign_limit: int = 27
    assign_topk: int = 18
    # test cfg (reference `:25-28`)
    nms_pre: int = 1000
    iou_thr: float = 0.5
    score_thr: float = 0.01
    nms_cap: int = 256  # per-class candidate cap fed to the NMS matrix
    # train schedule (reference `:30-33`)
    lr: float = 0.001
    weight_decay: float = 0.0001
    grad_clip: float = 10.0
    max_epochs: int = 12
    lr_steps: Tuple[int, ...] = (8, 11)
    batch_size: int = 16  # global (reference: 8/GPU x 2 GPUs)


def config_from_dict(d: dict) -> FCAF3DConfig:
    """Rebuild a config from a JSON round-trip (`dataclasses.asdict` ->
    json -> here); lists become the tuples the dataclass declares. Used to
    recover the training config from a checkpoint's `meta.json`."""
    fields = {f.name: f for f in dataclasses.fields(FCAF3DConfig)}
    kw = {}
    for k, v in d.items():
        if k not in fields:
            continue
        default = getattr(FCAF3DConfig(), k)
        kw[k] = tuple(v) if isinstance(default, tuple) and isinstance(v, list) else v
    return FCAF3DConfig(**kw)


def fcaf3d_scannet() -> FCAF3DConfig:
    """ScanNet 18-class, axis-aligned (`fcaf3d_scannet-3d-18class.py`).

    Voxel budgets are calibrated for the reference's ScanNet *detection*
    data, which is extracted with `--max_num_point 50000`
    (`/root/reference/data/scannet/README.md:7`): `IndoorPointSample(100000)`
    then samples WITH replacement, so dedup yields at most
    50000*(1 - e^-2) ~= 43233 unique points. Budgets are max + margin of the
    per-stride unique-voxel cascade measured on 16 room-like surface scans
    (`tools/calibrate_budgets.py --raw-points 50000`); s8-s32 carry p95*1.1
    (deep levels are cheap rows, so the wider margin costs ~nothing);
    `overflow_max` telemetry in the train log verifies them against real
    data, and `tests/test_golden_fixtures.py::
    test_shipped_budgets_hold_scene_occupancy` pins them against the
    acquisition model.
    """
    return FCAF3DConfig(
        n_classes=18,
        n_reg_outs=6,
        with_yaw=False,
        input_budget=45056,
        backbone_budgets=(43520, 39936, 30720, 13312, 3584, 1024),
        neck_budgets=(32768, 16384, 6144, 1024),
    )


def fcaf3d_scannet_3scales() -> FCAF3DConfig:
    """HDResNet34:3 fast variant (`fcaf3d_3scales_scannet-3d-18class.py`):
    3 output scales, same 1cm voxels; reference reports 69.8/53.6 mAP at
    12.2 scenes/s (`/root/reference/README.md:92`)."""
    return dataclasses.replace(fcaf3d_scannet(), n_outs=3)


def fcaf3d_scannet_2scales() -> FCAF3DConfig:
    """HDResNet34:2 fast variant (`fcaf3d_2scales_scannet-3d-18class.py`):
    2 output scales at 2cm voxels; reference reports 63.1/46.8 mAP at
    31.5 scenes/s (`/root/reference/README.md:93`).

    Budgets from the 2cm cascade measured directly on the 50k-raw-cap
    acquisition model (`tools/calibrate_budgets.py --raw-points 50000
    --voxel-size 0.02`, p95*1.1): at 2cm the capped scans barely collapse
    (one point per ~(4.5cm)^2 of surface), so occupancy is ~0.93x the 1cm
    cascade, NOT the ~0.45x a density-scaling argument predicts — the old
    scaled budgets dropped ~45% of stride-1 voxels
    (`test_shipped_budgets_hold_scene_occupancy` caught it)."""
    return dataclasses.replace(
        fcaf3d_scannet(),
        n_outs=2,
        voxel_size=0.02,
        input_budget=46592,
        backbone_budgets=(42496, 30720, 13312, 3584, 1024, 512),
        neck_budgets=(16384, 8192),
    )


def fcaf3d_sunrgbd() -> FCAF3DConfig:
    """SUN RGB-D 10-class, rotated boxes (`fcaf3d_sunrgbd-3d-10class.py`).

    Budgets calibrated on a single-Kinect-view acquisition model
    (`tools/calibrate_budgets.py --dataset sunrgbd`): unlike ScanNet's
    50k-point raw cap, SUN RGB-D back-projects every depth pixel
    (`sunrgbd_data_utils.py:140-148`), so the 100k sample stays ~98%
    unique at 1cm and the old generic defaults overflowed s2 (88k vs
    65536) and s4 (58k vs 32768). p95*1.1 rounded to 512s; `overflow_max`
    telemetry re-verifies on real data."""
    return FCAF3DConfig(
        n_classes=10,
        n_reg_outs=8,
        with_yaw=True,
        input_budget=100352,
        backbone_budgets=(96768, 62976, 24064, 6656, 2048, 1024),
        neck_budgets=(28672, 9728, 4096, 1024),
    )


def fcaf3d_s3dis() -> FCAF3DConfig:
    """S3DIS 5-class, axis-aligned (`fcaf3d_s3dis-3d-5class.py`).

    Budgets calibrated on a dense-Matterport acquisition model
    (~1M raw points, 100k sample; `tools/calibrate_budgets.py --dataset
    s3dis`): denser coverage than ScanNet's capped scans keeps deeper
    levels fuller (s4 p95 77k, s8 p95 42k) — the old generic defaults
    overflowed s2/s4/s8 by 1.4-2.4x. p95*1.1 rounded to 512s."""
    return FCAF3DConfig(
        n_classes=5,
        n_reg_outs=6,
        with_yaw=False,
        input_budget=100352,
        backbone_budgets=(98304, 85504, 46592, 13824, 3584, 1024),
        neck_budgets=(56320, 16896, 4608, 1024),
    )


def fcaf3d_nano(n_classes: int = 3) -> FCAF3DConfig:
    """Minimal config for multi-device dry runs: per-device compute must be
    sub-second so CPU-mesh collective rendezvous (40s timeout, possibly
    oversubscribed cores) can't drift apart.

    depth=14 / n_outs=2 (the smallest real backbone/fast-variant shape,
    reference `me_resnet.py:104-121` + `n_outs` truncation): XLA-CPU compile
    time scales with the op count of the unrolled sparse cascade, and the
    driver's cold-cache dryrun budget is minutes — depth-34/4-scale nano
    compiled in ~400 s on a 1-core host, this one in ~1/3 of that."""
    return FCAF3DConfig(
        n_classes=n_classes,
        n_reg_outs=6,
        with_yaw=False,
        compute_dtype="float32",
        depth=14,
        n_outs=2,
        num_points=128,
        input_budget=128,
        backbone_budgets=(96, 64, 48, 24, 12, 8),
        neck_budgets=(48, 24),
        max_gt_boxes=4,
        nms_pre=16,
        nms_cap=16,
        batch_size=8,
    )


def fcaf3d_tiny(n_classes: int = 4, with_yaw: bool = False) -> FCAF3DConfig:
    """Miniature budgets for CPU tests."""
    return FCAF3DConfig(
        n_classes=n_classes,
        n_reg_outs=8 if with_yaw else 6,
        with_yaw=with_yaw,
        compute_dtype="float32",
        num_points=512,
        input_budget=512,
        backbone_budgets=(256, 128, 96, 48, 24, 12),
        neck_budgets=(96, 48, 24, 12),
        max_gt_boxes=8,
        nms_pre=32,
        nms_cap=32,
        batch_size=2,
    )
