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


FLIP_TTA = (
    {},
    {"flip_horizontal": True},
    {"flip_vertical": True},
    {"flip_horizontal": True, "flip_vertical": True},
)


def aug_test_batch(run, variables, batch, cfg, augs, rotated: bool):
    """Run K augmented forwards on a collated batch and merge per sample
    (the reference's `aug_test` + `merge_aug_bboxes_3d`,
    `models/detectors/base.py:14-44`, `core/post_processing/merge_augs.py`).

    Returns a list of per-sample numpy detection dicts."""
    from ..core.merge_augs import merge_aug_detections

    per_aug = []
    for aug in augs:
        pts = np.array(batch["points"])
        if aug.get("flip_horizontal"):
            pts[..., 0] = -pts[..., 0]
        if aug.get("flip_vertical"):
            pts[..., 1] = -pts[..., 1]
        dets = run(
            variables,
            jnp.asarray(pts),
            jnp.asarray(batch["colors"]),
            jnp.asarray(batch["valid"]),
        )
        per_aug.append(dets)

    out = []
    bsz = batch["points"].shape[0]
    for j in range(bsz):
        boxes, scores, labels, keep = merge_aug_detections(
            [d.boxes[j] for d in per_aug],
            [d.scores[j] for d in per_aug],
            [d.labels[j] for d in per_aug],
            [d.valid[j] for d in per_aug],
            list(augs),
            iou_thr=cfg.iou_thr,
            rotated=rotated,
        )
        k = np.asarray(keep)
        out.append({
            "boxes_3d": np.asarray(boxes)[k],
            "scores_3d": np.asarray(scores)[k],
            "labels_3d": np.asarray(labels)[k],
        })
    return out


def evaluate_dataset(
    model: FCAF3D,
    variables,
    dataset,
    cfg: FCAF3DConfig,
    batch_size: int = 1,
    seed: int = 0,
    iou_thresholds=(0.25, 0.5),
    max_scenes: Optional[int] = None,
    tta: bool = False,
    mesh=None,
    show_dir: Optional[str] = None,
) -> Dict[str, float]:
    """Run inference over `dataset` (test-mode pipeline) and compute mAP/mAR.

    tta=True runs the 4 BEV flip combinations per scene and merges the
    inverted detections with class-wise NMS (`MultiScaleFlipAug3D` +
    `aug_test`).

    mesh: optional `jax.sharding.Mesh` with a 'data' axis — val scenes are
    sharded across its devices (the reference's `multi_gpu_test`,
    `tools/test.py:186-191`); requires batch_size % mesh devices == 0.
    Detections come back to the host already gathered (single-controller
    JAX), so the rank-0 result-collect is implicit."""
    tcfg = infer_config(cfg)

    if mesh is not None:
        from ..parallel.mesh import replicate, shard_batch

        n_dev = mesh.devices.size
        assert batch_size % n_dev == 0, (
            f"batch_size {batch_size} must be a multiple of the mesh's "
            f"{n_dev} devices")
        rep, shard = replicate(mesh), shard_batch(mesh)

        def run_fn(variables, points, colors, valid):
            outs = model.apply(variables, points, colors, valid, train=False)
            return fcaf3d_get_bboxes(outs, tcfg)

        run = jax.jit(
            run_fn,
            in_shardings=(rep, shard, shard, shard),
            out_shardings=rep,
        )
    else:
        @jax.jit
        def run(variables, points, colors, valid):
            outs = model.apply(variables, points, colors, valid, train=False)
            return fcaf3d_get_bboxes(outs, tcfg)

    n = len(dataset) if max_scenes is None else min(max_scenes, len(dataset))
    gt_annos: List[dict] = []
    dt_annos: List[dict] = []
    for lo in range(0, n, batch_size):
        idxs = list(range(lo, min(lo + batch_size, n)))
        samples = [dataset(i, np.random.default_rng([seed, i])) for i in idxs]
        n_real = len(samples)
        if mesh is not None and n_real < batch_size:
            # pad the last batch so the sharded step keeps its static shape;
            # padded samples' detections are dropped below
            samples = samples + [samples[-1]] * (batch_size - n_real)
        batch = collate(samples, cfg.num_points, cfg.max_gt_boxes)
        samples = samples[:n_real]
        if tta:
            dt_annos.extend(
                aug_test_batch(run, variables, batch, cfg, FLIP_TTA,
                               rotated=cfg.with_yaw)[:n_real])
        else:
            dets = run(
                variables,
                jnp.asarray(batch["points"]),
                jnp.asarray(batch["colors"]),
                jnp.asarray(batch["valid"]),
            )
            for j in range(len(samples)):
                dt_annos.append(detections_to_numpy(dets, j))
        for s in samples:
            gt_annos.append(
                {"gt_boxes_3d": s["gt_boxes"], "gt_labels_3d": s["gt_labels"]}
            )
        if show_dir is not None:
            # dump points + pred/gt wireframes per scene (the reference's
            # `tools/test.py --show-dir` -> show_result .obj dumps)
            from ..core.visualizer import show_result

            for j, (i, s) in enumerate(zip(idxs, samples)):
                show_result(
                    s["points"][:, :3], dt_annos[lo + j]["boxes_3d"],
                    np.asarray(s["gt_boxes"]).reshape(-1, 7), show_dir,
                    f"scene_{i:05d}",
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
