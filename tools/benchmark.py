#!/usr/bin/env python
"""Inference FPS benchmark CLI (reference `tools/analysis_tools/benchmark.py`).

Measures end-to-end scenes/sec (voxelize -> backbone -> head -> NMS) with
serialized on-device timing. `bench.py` at the repo root is the fixed
driver entrypoint; this CLI adds model/dataset/batch options and forwards
the chosen config factory name to it (no monkey-patching).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["scannet", "sunrgbd", "s3dis"],
                    default="scannet")
    ap.add_argument("--scales", type=int, default=4, choices=[2, 3, 4],
                    help="backbone output scales (fast variants)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    if args.scales != 4 and args.dataset != "scannet":
        ap.error("--scales fast variants exist for ScanNet only")

    config = {
        ("scannet", 4): "fcaf3d_scannet",
        ("scannet", 3): "fcaf3d_scannet_3scales",
        ("scannet", 2): "fcaf3d_scannet_2scales",
        ("sunrgbd", 4): "fcaf3d_sunrgbd",
        ("s3dis", 4): "fcaf3d_s3dis",
    }[(args.dataset, args.scales)]
    sys.argv = [sys.argv[0], "--batch", str(args.batch),
                "--iters", str(args.iters), "--config", config]
    import bench as root_bench  # reuse the driver bench implementation

    root_bench.main()


if __name__ == "__main__":
    main()
