#!/usr/bin/env python
"""Raw S3DIS (Stanford3dDataset_v1.2_Aligned_Version) -> npy arrays.

Clean-room equivalent of the reference's
`/root/reference/data/s3dis/collect_indoor3d_data.py` + `indoor3d_util.py`:
per room, aggregate the per-instance `Annotations/*.txt` files into
`Area_X_room_point.npy` (xyz+rgb, shifted so the min corner is the origin),
`_sem_label.npy` and `_ins_label.npy` — the inputs
`tools/create_data.py s3dis` consumes. Includes the v1.2
`Area_5/hallway_6/ceiling_1.txt` stray-character fix.

Usage:
    python tools/data_prep/collect_s3dis_data.py \
        --data-dir Stanford3dDataset_v1.2_Aligned_Version \
        --output-dir s3dis_data [--areas 1 2 3 4 5 6]
"""
import argparse
import glob
import os

import numpy as np

CLASS_NAMES = (
    "ceiling", "floor", "wall", "beam", "column", "window", "door", "table",
    "chair", "sofa", "bookcase", "board", "clutter",
)
CLASS2LABEL = {c: i for i, c in enumerate(CLASS_NAMES)}


def fix_v12_stray_char(data_dir):
    """v1.2 ships one corrupt char in Area_5/hallway_6/ceiling_1.txt."""
    path = os.path.join(data_dir, "Area_5/hallway_6/Annotations/ceiling_1.txt")
    if not os.path.isfile(path):
        return
    with open(path, "rb") as f:
        data = f.read()
    if len(data) > 5545348 and data[5545347:5545348] not in b" \t\n.0123456789-":
        with open(path, "wb") as f:
            f.write(data[:5545347] + b" " + data[5545348:])


def export_room(anno_dir, out_prefix):
    points_list = []
    ins_idx = 1
    for f in sorted(glob.glob(os.path.join(anno_dir, "*.txt"))):
        cls = os.path.basename(f).split("_")[0]
        if cls not in CLASS2LABEL:  # e.g. the 'staris' typo rooms
            cls = "clutter"
        pts = np.loadtxt(f)
        sem = np.full((len(pts), 1), CLASS2LABEL[cls], np.float64)
        ins = np.full((len(pts), 1), ins_idx, np.float64)
        ins_idx += 1
        points_list.append(np.concatenate([pts, sem, ins], 1))
    data = np.concatenate(points_list, 0)  # [N, 8]
    data[:, :3] -= data[:, :3].min(0)
    np.save(out_prefix + "_point.npy", data[:, :6].astype(np.float32))
    np.save(out_prefix + "_sem_label.npy", data[:, 6].astype(np.int64))
    np.save(out_prefix + "_ins_label.npy", data[:, 7].astype(np.int64))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--areas", type=int, nargs="+", default=(1, 2, 3, 4, 5, 6))
    args = ap.parse_args()

    fix_v12_stray_char(args.data_dir)
    os.makedirs(args.output_dir, exist_ok=True)
    for area in args.areas:
        rooms = sorted(glob.glob(
            os.path.join(args.data_dir, f"Area_{area}", "*", "Annotations")))
        for anno in rooms:
            room = os.path.basename(os.path.dirname(anno))
            out = os.path.join(args.output_dir, f"Area_{area}_{room}")
            if os.path.isfile(out + "_point.npy"):
                continue
            print(f"Area_{area}/{room}", flush=True)
            export_room(anno, out)


if __name__ == "__main__":
    main()
