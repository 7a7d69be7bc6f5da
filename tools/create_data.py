#!/usr/bin/env python
"""Dataset preparation CLI (reference `tools/create_data.py` equivalent).

    python tools/create_data.py scannet --root-path data/scannet
    python tools/create_data.py sunrgbd --root-path data/sunrgbd
    python tools/create_data.py s3dis --root-path data/s3dis
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=["scannet", "sunrgbd", "s3dis"])
    ap.add_argument("--root-path", required=True)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    from fcaf3d_tpu.data.converters import (
        S3DISConverter,
        ScanNetConverter,
        SUNRGBDConverter,
    )

    if args.dataset == "scannet":
        for split in ("train", "val", "test"):
            n = len(ScanNetConverter(args.root_path, split).convert(
                num_workers=args.workers))
            print(f"scannet {split}: {n} scenes")
    elif args.dataset == "sunrgbd":
        for split in ("train", "val"):
            n = len(SUNRGBDConverter(args.root_path, split).convert(
                num_workers=args.workers))
            print(f"sunrgbd {split}: {n} scenes")
    else:
        for area in (1, 2, 3, 4, 5, 6):
            n = len(S3DISConverter(args.root_path, f"Area_{area}").convert(
                num_workers=args.workers))
            print(f"s3dis Area_{area}: {n} rooms")


if __name__ == "__main__":
    main()
