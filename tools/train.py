#!/usr/bin/env python
"""Training CLI (reference `tools/train.py` equivalent).

Example:
    python tools/train.py --dataset scannet --data-root data/scannet \
        --work-dir work_dirs/fcaf3d_scannet [--batch 16] [--resume]
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["scannet", "sunrgbd", "s3dis"], required=True)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--batch", type=int, default=None, help="global batch size")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--load-from", default=None, metavar="WORK_DIR",
                    help="weights-only init from another run's work dir "
                    "(load_from semantics; shape-mismatched heads keep "
                    "fresh init -- e.g. ScanNet-pretrained S3DIS)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--no-eval", action="store_true")
    ap.add_argument("--max-eval-scenes", type=int, default=None)
    ap.add_argument("--scales", type=int, default=4, choices=[2, 3, 4],
                    help="ScanNet fast variants (fcaf3d_2scales/3scales)")
    ap.add_argument("--autoscale-lr", action="store_true",
                    help="linearly scale lr by batch/16 (reference "
                         "`tools/train.py:74-77` world-size rule)")
    from fcaf3d_tpu.configs import add_set_argument, apply_overrides
    add_set_argument(ap)
    args = ap.parse_args()

    from fcaf3d_tpu.apis.test import evaluate_dataset, make_test_pipeline
    from fcaf3d_tpu.apis.train import train_model
    from fcaf3d_tpu.configs import (
        fcaf3d_s3dis,
        fcaf3d_scannet,
        fcaf3d_scannet_2scales,
        fcaf3d_scannet_3scales,
        fcaf3d_sunrgbd,
    )
    from fcaf3d_tpu.data import (
        Compose,
        GlobalAlignment,
        GlobalRotScaleTrans,
        IndoorDetDataset,
        Loader,
        PointSample,
        RandomFlip,
        RepeatDataset,
        build_s3dis,
        S3DIS_CLASSES,
        SCANNET_CLASSES,
        SUNRGBD_CLASSES,
    )

    if args.scales != 4 and args.dataset != "scannet":
        ap.error("--scales fast variants exist for ScanNet only")

    cfg = {
        "scannet": {4: fcaf3d_scannet, 3: fcaf3d_scannet_3scales,
                    2: fcaf3d_scannet_2scales}[args.scales],
        "sunrgbd": fcaf3d_sunrgbd,
        "s3dis": fcaf3d_s3dis,
    }[args.dataset]()
    if args.batch:
        cfg = dataclasses.replace(cfg, batch_size=args.batch)
    if args.epochs:
        cfg = dataclasses.replace(cfg, max_epochs=args.epochs)
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)
    if args.autoscale_lr:
        cfg = dataclasses.replace(cfg, lr=cfg.lr * cfg.batch_size / 16)

    if args.dataset == "scannet":
        classes = SCANNET_CLASSES
        train_pipe = Compose([
            GlobalAlignment(),
            PointSample(cfg.num_points),
            RandomFlip(0.5, 0.5, with_yaw=False),
            GlobalRotScaleTrans((-0.087266, 0.087266), (0.9, 1.1), (0.1,) * 3,
                                with_yaw=False),
        ])
        ds = RepeatDataset(
            IndoorDetDataset(
                args.data_root,
                os.path.join(args.data_root, "scannet_infos_train.pkl"),
                classes,
                train_pipe,
            ),
            times=10,
        )
        val = IndoorDetDataset(
            args.data_root,
            os.path.join(args.data_root, "scannet_infos_val.pkl"),
            classes,
            make_test_pipeline(cfg),
            test_mode=True,
        )
    elif args.dataset == "sunrgbd":
        classes = SUNRGBD_CLASSES
        train_pipe = Compose([
            PointSample(cfg.num_points),
            RandomFlip(0.5, 0.0),
            GlobalRotScaleTrans((-0.523599, 0.523599), (0.85, 1.15), (0.1,) * 3),
        ])
        ds = RepeatDataset(
            IndoorDetDataset(
                args.data_root,
                os.path.join(args.data_root, "sunrgbd_infos_train.pkl"),
                classes,
                train_pipe,
            ),
            times=3,
        )
        val = IndoorDetDataset(
            args.data_root,
            os.path.join(args.data_root, "sunrgbd_infos_val.pkl"),
            classes,
            make_test_pipeline(cfg, align=False),
            test_mode=True,
        )
    else:
        classes = S3DIS_CLASSES
        train_pipe = Compose([
            PointSample(cfg.num_points),
            RandomFlip(0.5, 0.5, with_yaw=False),
            GlobalRotScaleTrans((-0.087266, 0.087266), (0.9, 1.1), (0.1,) * 3,
                                with_yaw=False),
        ])
        train_files = [
            os.path.join(args.data_root, f"s3dis_infos_Area_{a}.pkl")
            for a in (1, 2, 3, 4, 6)
        ]
        ds = build_s3dis(args.data_root, train_files, train_pipe)
        val = IndoorDetDataset(
            args.data_root,
            os.path.join(args.data_root, "s3dis_infos_Area_5.pkl"),
            classes,
            make_test_pipeline(cfg, align=False),
            test_mode=True,
        )

    # multi-host: each process loads its slice of the global batch (the
    # per-rank sampler analog); on a single controller this is a no-op
    import jax

    loader = Loader(
        ds, cfg.batch_size, cfg.num_points, cfg.max_gt_boxes, seed=args.seed,
        shard_index=jax.process_index(), num_shards=jax.process_count(),
    )

    eval_hook = None
    if not args.no_eval:
        def eval_hook(model, state, epoch):
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            metrics = evaluate_dataset(
                model, variables, val, cfg, max_scenes=args.max_eval_scenes
            )
            keys = [k for k in metrics if k.startswith("mAP") or k.startswith("mAR")]
            print(f"[eval epoch {epoch}] " + " ".join(f"{k}={metrics[k]:.4f}" for k in keys))
            return {k: metrics[k] for k in keys}

    os.makedirs(args.work_dir, exist_ok=True)
    with open(os.path.join(args.work_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    train_model(
        cfg, loader, args.work_dir, seed=args.seed, eval_hook=eval_hook,
        resume=args.resume, load_from=args.load_from, classes=classes,
    )


if __name__ == "__main__":
    main()
