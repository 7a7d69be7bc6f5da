#!/usr/bin/env python
"""Point-cloud detection demo (reference `demo/pcd_demo.py` equivalent):
run FCAF3D on one `.bin` cloud and dump .obj files for MeshLab.

    python demo/pcd_demo.py scene.bin --dataset scannet \
        --work-dir work_dirs/fcaf3d_scannet --out-dir demo_out
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pcd", help=".bin float32 [N, 6] xyz+rgb point cloud")
    ap.add_argument("--dataset", choices=["scannet", "sunrgbd", "s3dis"],
                    default="scannet")
    ap.add_argument("--work-dir", default=None, help="trained checkpoint dir")
    ap.add_argument("--out-dir", default="demo_out")
    ap.add_argument("--score-thr", type=float, default=0.3)
    args = ap.parse_args()

    from fcaf3d_tpu.apis.inference import inference_detector, init_detector
    from fcaf3d_tpu.configs import fcaf3d_s3dis, fcaf3d_scannet, fcaf3d_sunrgbd
    from fcaf3d_tpu.core.visualizer import show_result

    cfg = {"scannet": fcaf3d_scannet, "sunrgbd": fcaf3d_sunrgbd,
           "s3dis": fcaf3d_s3dis}[args.dataset]()
    model, variables = init_detector(cfg, args.work_dir)

    points = np.fromfile(args.pcd, dtype=np.float32).reshape(-1, 6)
    result = inference_detector(model, variables, points, cfg)
    keep = result["scores_3d"] > args.score_thr
    boxes = result["boxes_3d"][keep]
    print(f"{keep.sum()} detections above {args.score_thr}")
    name = os.path.splitext(os.path.basename(args.pcd))[0]
    show_result(points, boxes, None, args.out_dir, name)
    print(f"wrote {args.out_dir}/{name}_points.obj and _pred.obj")


if __name__ == "__main__":
    main()
