#!/usr/bin/env python
"""VoteNet-v2 training CLI (SUN RGB-D, reference
`configs/votenet/votenet-v2_16x8_sunrgbd-3d-10class.py` recipe)."""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--head", choices=["v1", "v2"], default="v2",
                    help="v2 = Mobius direct regression; v1 = upstream "
                         "bin-based VoteHead (votenet_16x8_sunrgbd config)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fcaf3d_tpu.configs.votenet import votenet_sunrgbd, votenet_v1_sunrgbd
    from fcaf3d_tpu.data import (
        Compose, GlobalRotScaleTrans, IndoorDetDataset, Loader, PointSample,
        RandomFlip, RepeatDataset, ShiftHeight, SUNRGBD_CLASSES)
    from fcaf3d_tpu.models.votenet import VoteNet
    from fcaf3d_tpu.models.votenet_v1 import VoteNetV1, sunrgbd_coder
    from fcaf3d_tpu.train.checkpoint import save_checkpoint
    from fcaf3d_tpu.train.optim import make_optimizer
    from fcaf3d_tpu.train.trainer import (
        TrainState, make_votenet_train_step, make_votenet_v1_train_step)

    cfg = votenet_sunrgbd() if args.head == "v2" else votenet_v1_sunrgbd()
    if args.batch:
        cfg = dataclasses.replace(cfg, batch_size=args.batch)
    if args.epochs:
        cfg = dataclasses.replace(cfg, max_epochs=args.epochs)

    # SUN RGB-D votenet pipeline: use_dim [0,1,2] + shift_height
    pipe = Compose([
        ShiftHeight(),
        PointSample(cfg.num_points),
        RandomFlip(0.5, 0.0),
        GlobalRotScaleTrans((-0.523599, 0.523599), (0.85, 1.15), (0, 0, 0)),
    ])
    ds = RepeatDataset(
        IndoorDetDataset(
            args.data_root,
            os.path.join(args.data_root, "sunrgbd_infos_train.pkl"),
            SUNRGBD_CLASSES, pipe, use_dim=(0, 1, 2),
        ), times=1,
    )
    loader = Loader(ds, cfg.batch_size, cfg.num_points, cfg.max_gt_boxes,
                    n_feat_dims=cfg.in_feat_dims, seed=args.seed)
    steps = loader.steps_per_epoch()

    if args.head == "v2":
        model = VoteNet(
            n_classes=cfg.n_classes, n_reg_outs=cfg.n_reg_outs,
            yaw_parametrization=cfg.yaw_parametrization,
            num_proposal=cfg.num_proposal,
            backbone_num_points=cfg.backbone_num_points,
            sample_mod=cfg.sample_mod,
        )
    else:
        model = VoteNetV1(
            coder=sunrgbd_coder(), n_classes=cfg.n_classes,
            num_proposal=cfg.num_proposal,
            backbone_num_points=cfg.backbone_num_points,
            sample_mod=cfg.sample_mod,
        )
    tx = make_optimizer(lr=cfg.lr, weight_decay=cfg.weight_decay,
                        grad_clip=cfg.grad_clip, steps_per_epoch=steps,
                        lr_steps=cfg.lr_steps)
    zeros = jnp.zeros((1, cfg.num_points, 3 + cfg.in_feat_dims), jnp.float32)
    variables = jax.jit(lambda k, p: model.init(k, p, train=False))(
        jax.random.PRNGKey(args.seed), zeros)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    step = (make_votenet_train_step if args.head == "v2"
            else make_votenet_v1_train_step)(model, cfg, tx)

    os.makedirs(args.work_dir, exist_ok=True)
    log = open(os.path.join(args.work_dir, "train_log.jsonl"), "a")
    for epoch in range(cfg.max_epochs):
        for i, batch in enumerate(loader.epoch(epoch)):
            # collate puts height into "colors"; fold back into points
            pts = np.concatenate([batch["points"], batch["colors"]], axis=-1)
            jb = {
                "points": jnp.asarray(pts),
                "gt_boxes": jnp.asarray(batch["gt_boxes"]),
                "gt_labels": jnp.asarray(batch["gt_labels"]),
                "gt_valid": jnp.asarray(batch["gt_valid"]),
            }
            state, m = step(state, jb)
            if (i + 1) % 50 == 0 or i + 1 == steps:
                rec = {"epoch": epoch + 1, "iter": i + 1,
                       **{k: round(float(v), 4) for k, v in m.items()}}
                print(rec, flush=True)
                log.write(json.dumps(rec) + "\n")
        save_checkpoint(args.work_dir, epoch + 1, state)


if __name__ == "__main__":
    main()
