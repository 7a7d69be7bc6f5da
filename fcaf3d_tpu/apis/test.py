"""Evaluation API: run the detector over a dataset and compute indoor mAP.

Equivalent of `single_gpu_test` + `dataset.evaluate`
(`/root/reference/mmdet3d/apis/test.py:10-83`,
`datasets/custom_3d.py:225-272`).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.fcaf3d import FCAF3DConfig
from ..core.eval import indoor_eval
from ..data.loader import collate
from ..data.pipelines import Compose, GlobalAlignment, PointSample
from ..models.detector import FCAF3D, infer_config
from ..models.fcaf3d_head import Detections, fcaf3d_get_bboxes


def detections_to_numpy(dets: Detections, sample_idx: int) -> Dict[str, np.ndarray]:
    """Strip padding from one sample of a batched Detections pytree."""
    keep = np.asarray(dets.valid[sample_idx])
    return {
        "boxes_3d": np.asarray(dets.boxes[sample_idx])[keep],
        "scores_3d": np.asarray(dets.scores[sample_idx])[keep],
        "labels_3d": np.asarray(dets.labels[sample_idx])[keep],
    }


def evaluate_dataset(
    model: FCAF3D,
    variables,
    dataset,
    cfg: FCAF3DConfig,
    batch_size: int = 1,
    seed: int = 0,
    iou_thresholds=(0.25, 0.5),
    max_scenes: Optional[int] = None,
) -> Dict[str, float]:
    """Run inference over `dataset` (test-mode pipeline) and compute mAP/mAR."""
    tcfg = infer_config(cfg)

    @jax.jit
    def run(variables, points, colors, valid):
        outs = model.apply(variables, points, colors, valid, train=False)
        return fcaf3d_get_bboxes(outs, tcfg)

    n = len(dataset) if max_scenes is None else min(max_scenes, len(dataset))
    gt_annos: List[dict] = []
    dt_annos: List[dict] = []
    rng_root = np.random.default_rng(seed)
    for lo in range(0, n, batch_size):
        idxs = list(range(lo, min(lo + batch_size, n)))
        samples = [dataset(i, np.random.default_rng([seed, i])) for i in idxs]
        batch = collate(samples, cfg.num_points, cfg.max_gt_boxes)
        dets = run(
            variables,
            jnp.asarray(batch["points"]),
            jnp.asarray(batch["colors"]),
            jnp.asarray(batch["valid"]),
        )
        for j, s in enumerate(samples):
            dt_annos.append(detections_to_numpy(dets, j))
            gt_annos.append(
                {"gt_boxes_3d": s["gt_boxes"], "gt_labels_3d": s["gt_labels"]}
            )
    label2cat = {i: c for i, c in enumerate(dataset.classes)} if hasattr(
        dataset, "classes"
    ) else {}
    return indoor_eval(gt_annos, dt_annos, iou_thresholds, label2cat)


def make_test_pipeline(cfg: FCAF3DConfig, align: bool = True) -> Compose:
    """Deterministic test pipeline: align (ScanNet) + point sample. The
    reference's TTA wrapper keeps random flip/sample at test time for the
    5x5 protocol; a fixed seed per scene makes our runs reproducible."""
    ts = [GlobalAlignment()] if align else []
    ts.append(PointSample(cfg.num_points))
    return Compose(ts)
