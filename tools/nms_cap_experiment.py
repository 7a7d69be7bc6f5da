#!/usr/bin/env python
"""Quantify the per-class NMS candidate cap (`nms_cap`).

The reference feeds the UNCAPPED per-class candidate set (<= 4 levels x
nms_pre=1000) to rotated NMS (`fcaf3d_neck_with_head.py:332-374`); this
framework caps each class's score-sorted candidates at `nms_cap` for a
static NMS matrix. This experiment trains a tiny FCAF3D to overfit a
crowded synthetic room (many same-class objects -> large per-class
candidate pools) and diffs indoor_eval mAP across caps, answering whether
the configured 256 loses recall tail vs the uncapped-equivalent.

Run (CPU ok): python tools/nms_cap_experiment.py [--boxes 60] [--steps 120]
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--boxes", type=int, default=60)
    ap.add_argument("--classes", type=int, default=3)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--caps", type=int, nargs="+",
                    default=[16, 64, 256, 1024, 4000])
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # honor the env even when the axon TPU plugin is registered
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fcaf3d_tpu.configs import FCAF3DConfig
    from fcaf3d_tpu.core.eval import indoor_eval
    from fcaf3d_tpu.data.loader import collate
    from fcaf3d_tpu.data.synth import crowded_scene, densify
    from fcaf3d_tpu.models import FCAF3D, fcaf3d_get_bboxes
    from fcaf3d_tpu.models.fcaf3d_head import FcafTestConfig
    from fcaf3d_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    rng = np.random.default_rng(0)
    scene = crowded_scene(args.boxes, args.classes, rng)
    sample = densify(scene, pts_per_box=64, n_floor=256, rng=rng)
    n_pts = len(sample["points"])

    cfg = FCAF3DConfig(
        n_classes=args.classes,
        n_reg_outs=6,
        with_yaw=False,
        compute_dtype="float32",
        voxel_size=0.02,
        depth=14,
        num_points=n_pts,
        input_budget=6144,
        backbone_budgets=(6144, 5120, 4096, 1536, 512, 128),
        neck_budgets=(4096, 1536, 512, 128),
        max_gt_boxes=args.boxes,
        assign_limit=9,
        assign_topk=6,
        nms_pre=1000,
        batch_size=1,
        lr=2e-3,
    )
    tx = make_optimizer(lr=cfg.lr, steps_per_epoch=args.steps, lr_steps=(100,))
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx)
    step = make_train_step(model, cfg, tx)
    batch = collate([sample], cfg.num_points, cfg.max_gt_boxes)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    for i in range(args.steps):
        state, metrics = step(state, jb)
    print(f"trained {args.steps} steps, loss={float(metrics['loss']):.4f}")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    outs = jax.jit(lambda v, p, c, m: model.apply(v, p, c, m, train=False))(
        variables, jb["points"], jb["colors"], jb["valid"])

    gt = [{"gt_boxes_3d": sample["gt_boxes"],
           "gt_labels_3d": sample["gt_labels"]}]
    label2cat = {i: f"c{i}" for i in range(args.classes)}
    results = {}
    for cap in args.caps:
        tcfg = FcafTestConfig(
            nms_pre=cfg.nms_pre, iou_thr=cfg.iou_thr, score_thr=cfg.score_thr,
            nms_cap=cap, with_yaw=cfg.with_yaw,
            yaw_parametrization=cfg.yaw_parametrization,
        )
        dets = jax.jit(lambda o: fcaf3d_get_bboxes(o, tcfg))(outs)
        keep = np.asarray(dets.valid[0])
        dt = [{
            "boxes_3d": np.asarray(dets.boxes[0])[keep],
            "scores_3d": np.asarray(dets.scores[0])[keep],
            "labels_3d": np.asarray(dets.labels[0])[keep],
        }]
        m = indoor_eval(gt, dt, (0.25, 0.5), label2cat)
        results[cap] = {
            "mAP_0.25": round(m["mAP_0.25"], 4),
            "mAP_0.50": round(m["mAP_0.50"], 4),
            "detections": int(keep.sum()),
        }
        print(f"nms_cap={cap:5d}: {results[cap]}")
    print(json.dumps({"boxes": args.boxes, "classes": args.classes,
                      "results": {str(k): v for k, v in results.items()}}))


if __name__ == "__main__":
    main()
