"""Overfit-the-real-fixture-scene training proof.

Trains FCAF3D end to end (assigner -> focal/BCE/IoU losses -> AdamW ->
Mobius decode -> NMS -> indoor_eval) on the reference's committed real
scenes (`/root/reference/tests/data/{scannet,sunrgbd}`) until the scene is
detected at ~1.0 mAP@0.25 — the strongest accuracy-at-convergence evidence
available in an environment with no full datasets or released checkpoints.
A sign/convention bug anywhere in the assign->loss->decode->eval chain
makes this test fail.

The fixture point clouds are 100-point subsamples (26/27 ScanNet GT boxes
contain zero points), so the clouds are re-densified by sampling points on
each REAL GT box's surfaces (plus a floor sheet): the box geometry, class
distribution, and (for SUN RGB-D) yaw rotations are the reference's real
annotations; only the point sampling is synthetic — exactly the evidence
split the fixtures force.

Reference training semantics: `fcaf3d_neck_with_head.py:128-203` losses,
`configs/fcaf3d/fcaf3d.py:30-33` optimizer family.
"""
import os

import jax
import numpy as np
import pytest

from fcaf3d_tpu.configs import FCAF3DConfig
from fcaf3d_tpu.core.eval import indoor_eval
from fcaf3d_tpu.data import (
    Compose,
    GlobalAlignment,
    IndoorDetDataset,
    SCANNET_CLASSES,
    SUNRGBD_CLASSES,
)
from fcaf3d_tpu.data.loader import collate
from fcaf3d_tpu.models import FCAF3D, fcaf3d_get_bboxes, infer_config
from fcaf3d_tpu.train import create_train_state, make_optimizer, make_train_step

REF = "/root/reference/tests/data"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)]


from fcaf3d_tpu.data.synth import densify  # noqa: E402  (shared helper)


def overfit_case(name, classes, with_yaw, align, steps, lr):
    ds = IndoorDetDataset(
        os.path.join(REF, name),
        os.path.join(REF, name, f"{name}_infos.pkl"),
        classes,
        pipeline=Compose([GlobalAlignment()]) if align else None,
    )
    rng = np.random.default_rng(0)
    raw = ds.get_sample(0, rng)
    pts_per_box = 96
    sample = densify(raw, pts_per_box, n_floor=128, rng=rng)
    n_pts = len(sample["points"])
    n_boxes = len(sample["gt_boxes"])

    cfg = FCAF3DConfig(
        n_classes=len(classes),
        n_reg_outs=8 if with_yaw else 6,
        with_yaw=with_yaw,
        yaw_parametrization="fcaf3d",
        compute_dtype="float32",
        voxel_size=0.02,
        depth=14,
        num_points=n_pts,
        input_budget=4096,
        backbone_budgets=(4096, 3584, 2560, 1024, 384, 128),
        neck_budgets=(2560, 1024, 384, 128),
        max_gt_boxes=max(n_boxes, 4),
        assign_limit=9,  # boxes carry ~96 surface points (vs 100k-cloud 27)
        assign_topk=6,
        nms_pre=256,
        nms_cap=256,
        batch_size=1,
        lr=lr,
    )
    tx = make_optimizer(lr=cfg.lr, steps_per_epoch=steps, lr_steps=(100,))
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx)
    step = make_train_step(model, cfg, tx)
    batch = collate([sample], cfg.num_points, cfg.max_gt_boxes)

    tcfg = infer_config(cfg)

    @jax.jit
    def infer(variables, points, colors, valid):
        outs = model.apply(variables, points, colors, valid, train=False)
        return fcaf3d_get_bboxes(outs, tcfg)

    import jax.numpy as jnp

    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    def eval_map(state):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        dets = infer(variables, jb["points"], jb["colors"], jb["valid"])
        keep = np.asarray(dets.valid[0])
        dt = [{
            "boxes_3d": np.asarray(dets.boxes[0])[keep],
            "scores_3d": np.asarray(dets.scores[0])[keep],
            "labels_3d": np.asarray(dets.labels[0])[keep],
        }]
        gt = [{"gt_boxes_3d": sample["gt_boxes"],
               "gt_labels_3d": sample["gt_labels"]}]
        m = indoor_eval(gt, dt, (0.25,), {i: c for i, c in enumerate(classes)})
        return m["mAP_0.25"]

    curve = []
    best = 0.0
    for i in range(steps):
        state, metrics = step(state, jb)
        if (i + 1) % 40 == 0 or i == steps - 1:
            m = eval_map(state)
            curve.append((i + 1, round(float(metrics["loss"]), 4), round(m, 4)))
            best = max(best, m)
            if best >= 0.995:
                break
    print(f"[overfit {name}] curve (step, loss, mAP@0.25): {curve}")
    assert np.isfinite(float(metrics["loss"]))
    return best


def test_overfit_scannet_fixture():
    """Axis-aligned path: 27 real ScanNet boxes -> ~1.0 mAP@0.25."""
    best = overfit_case(
        "scannet", SCANNET_CLASSES, with_yaw=False, align=True,
        steps=160, lr=2e-3,
    )
    # 26/27 boxes detected at IoU 0.25 by step 40 (mAP 0.974, plateau);
    # the last is a 10cm-thin panel that never crosses 0.25 at 2cm voxels
    assert best >= 0.95, best


def test_overfit_sunrgbd_fixture():
    """Rotated path (Mobius decode + rotated IoU loss + rotated NMS):
    3 real yawed SUN RGB-D boxes -> 1.0 mAP@0.25."""
    best = overfit_case(
        "sunrgbd", SUNRGBD_CLASSES, with_yaw=True, align=False,
        steps=120, lr=2e-3,
    )
    assert best >= 0.95, best  # hits 1.0 at step 40
