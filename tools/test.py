#!/usr/bin/env python
"""Evaluation CLI (reference `tools/test.py --eval mAP` equivalent)."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["scannet", "sunrgbd", "s3dis"], required=True)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--work-dir", default=None, help="dir containing ckpts/")
    ap.add_argument("--params", default=None,
                    help="converted reference checkpoint pickle "
                         "(tools/convert_checkpoint.py) instead of --work-dir")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--max-scenes", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="json file for metrics")
    ap.add_argument("--show-dir", default=None,
                    help="dump per-scene points + pred/gt wireframe .obj "
                    "(reference tools/test.py --show-dir analog)")
    ap.add_argument("--tta", action="store_true",
                    help="4-way BEV flip test-time augmentation "
                         "(MultiScaleFlipAug3D + aug_test analog)")
    ap.add_argument("--sharded", action="store_true",
                    help="shard val scenes across all local devices "
                         "(multi_gpu_test analog; batch must divide evenly)")
    from fcaf3d_tpu.configs import add_set_argument, apply_overrides
    add_set_argument(ap)
    args = ap.parse_args()

    from fcaf3d_tpu.apis.inference import init_detector
    from fcaf3d_tpu.apis.test import evaluate_dataset, make_test_pipeline
    from fcaf3d_tpu.configs import fcaf3d_s3dis, fcaf3d_scannet, fcaf3d_sunrgbd
    from fcaf3d_tpu.data import (
        IndoorDetDataset,
        S3DIS_CLASSES,
        SCANNET_CLASSES,
        SUNRGBD_CLASSES,
    )

    if args.dataset == "scannet":
        cfg, classes, ann, align = (
            fcaf3d_scannet(), SCANNET_CLASSES, "scannet_infos_val.pkl", True)
    elif args.dataset == "sunrgbd":
        cfg, classes, ann, align = (
            fcaf3d_sunrgbd(), SUNRGBD_CLASSES, "sunrgbd_infos_val.pkl", False)
    else:
        cfg, classes, ann, align = (
            fcaf3d_s3dis(), S3DIS_CLASSES, "s3dis_infos_Area_5.pkl", False)

    # prefer the training-time config/CLASSES embedded in the checkpoint
    # meta (reference `tools/test.py` reads CLASSES from ckpt meta)
    from fcaf3d_tpu.configs import config_from_dict
    from fcaf3d_tpu.train.checkpoint import load_meta

    meta = load_meta(args.work_dir) if args.work_dir else None
    if meta is not None and meta.get("config"):
        cfg = config_from_dict(meta["config"])
        if meta.get("classes"):
            if tuple(meta["classes"]) != tuple(classes):
                print(f"warning: checkpoint meta classes differ from "
                      f"--dataset {args.dataset}; using meta classes")
            classes = tuple(meta["classes"])
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)

    val = IndoorDetDataset(
        args.data_root,
        os.path.join(args.data_root, ann),
        classes,
        make_test_pipeline(cfg, align=align),
        test_mode=True,
    )
    if not args.work_dir and not args.params:
        ap.error("one of --work-dir / --params is required")
    model, variables = init_detector(cfg, args.work_dir,
                                     params_file=args.params)
    mesh = None
    if args.sharded:
        from fcaf3d_tpu.parallel.mesh import data_mesh

        mesh = data_mesh()
    metrics = evaluate_dataset(
        model, variables, val, cfg,
        batch_size=args.batch, seed=args.seed, max_scenes=args.max_scenes,
        tta=args.tta, mesh=mesh, show_dir=args.show_dir,
    )
    for k in sorted(metrics):
        print(f"{k}: {metrics[k]:.4f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
