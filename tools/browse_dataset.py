#!/usr/bin/env python
"""Visualize ground truth through the real training pipeline.

Equivalent of the reference's `tools/misc/browse_dataset.py`: draws each
sample AFTER the augmentation pipeline (so what the model actually sees)
and dumps `<name>_points.obj` + `<name>_gt.obj` wireframes for MeshLab.

Example:
    python tools/browse_dataset.py --dataset scannet --data-root data/scannet \
        --out-dir work_dirs/browse [--split val] [--max-samples 10] [--no-aug]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def build_dataset(dataset, data_root, split, aug):
    from fcaf3d_tpu.apis.test import make_test_pipeline
    from fcaf3d_tpu.configs import fcaf3d_s3dis, fcaf3d_scannet, fcaf3d_sunrgbd
    from fcaf3d_tpu.data import (
        Compose,
        GlobalAlignment,
        GlobalRotScaleTrans,
        IndoorDetDataset,
        PointSample,
        RandomFlip,
        S3DIS_CLASSES,
        SCANNET_CLASSES,
        SUNRGBD_CLASSES,
    )

    if dataset == "scannet":
        cfg, classes = fcaf3d_scannet(), SCANNET_CLASSES
        ann = f"scannet_infos_{split}.pkl"
        train_pipe = Compose([
            GlobalAlignment(),
            PointSample(cfg.num_points),
            RandomFlip(0.5, 0.5, with_yaw=False),
            GlobalRotScaleTrans((-0.087266, 0.087266), (0.9, 1.1), (0.1,) * 3,
                                with_yaw=False),
        ])
        align = True
    elif dataset == "sunrgbd":
        cfg, classes = fcaf3d_sunrgbd(), SUNRGBD_CLASSES
        ann = f"sunrgbd_infos_{split}.pkl"
        train_pipe = Compose([
            PointSample(cfg.num_points),
            RandomFlip(0.5, 0.0),
            GlobalRotScaleTrans((-0.523599, 0.523599), (0.85, 1.15), (0.1,) * 3),
        ])
        align = False
    else:
        cfg, classes = fcaf3d_s3dis(), S3DIS_CLASSES
        ann = "s3dis_infos_Area_5.pkl" if split == "val" else "s3dis_infos_Area_1.pkl"
        train_pipe = Compose([
            PointSample(cfg.num_points),
            RandomFlip(0.5, 0.5, with_yaw=False),
            GlobalRotScaleTrans((-0.087266, 0.087266), (0.9, 1.1), (0.1,) * 3,
                                with_yaw=False),
        ])
        align = False
    pipe = train_pipe if aug else make_test_pipeline(cfg, align=align)
    ann_path = os.path.join(data_root, ann)
    if not os.path.isfile(ann_path):  # e.g. fixture dirs: <dataset>_infos.pkl
        ann_path = os.path.join(data_root, f"{dataset}_infos.pkl")
    return IndoorDetDataset(data_root, ann_path, classes, pipe), classes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["scannet", "sunrgbd", "s3dis"],
                    required=True)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--split", default="train", choices=["train", "val"])
    ap.add_argument("--max-samples", type=int, default=10)
    ap.add_argument("--no-aug", action="store_true",
                    help="deterministic test pipeline instead of train aug")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from fcaf3d_tpu.core.visualizer import write_boxes_obj, write_points_obj

    ds, classes = build_dataset(
        args.dataset, args.data_root, args.split, aug=not args.no_aug
    )
    n = min(args.max_samples, len(ds))
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(n):
        s = ds(i, np.random.default_rng([args.seed, i]))
        name = f"{args.dataset}_{args.split}_{s.get('sample_idx', i)}"
        write_points_obj(s["points"], os.path.join(args.out_dir, f"{name}_points.obj"))
        write_boxes_obj(s["gt_boxes"], os.path.join(args.out_dir, f"{name}_gt.obj"))
        labels = [classes[j] for j in s["gt_labels"]]
        print(f"{name}: {len(s['points'])} pts, {len(s['gt_boxes'])} boxes "
              f"({', '.join(sorted(set(labels)))})")
    print(f"wrote {n} samples to {args.out_dir}")


if __name__ == "__main__":
    main()
