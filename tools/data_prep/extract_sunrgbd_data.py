#!/usr/bin/env python
"""Raw SUN RGB-D -> the `sunrgbd_trainval/` layout, in Python.

Clean-room replacement for the reference's MATLAB extractors
(`/root/reference/data/sunrgbd/matlab/extract_rgbd_data_v2.m`,
`extract_split.m`): reads the official `SUNRGBDMeta3DBB_v2.mat` /
`SUNRGBDMeta2DBB_v2.mat` with scipy.io, converts each depth png to a point
cloud (`read3dPoints`: 3-bit-shifted uint16 depth, K back-projection,
Rtilt rotation; rgb in 0-1 like the MATLAB `im2double`), and writes
`depth/%06d.mat` ({'instance': [N,6]}), `image/%06d.jpg`,
`calib/%06d.txt` (Rtilt then K, column-major rows) and `label/%06d.txt`
(`classname x1 y1 w h cx cy cz c1 c2 c3 basis11 basis12`) — exactly what
`tools/create_data.py sunrgbd` consumes.

Usage:
    python tools/data_prep/extract_sunrgbd_data.py \
        --official-dir OFFICIAL_SUNRGBD --output-dir sunrgbd_trainval \
        [--start 1 --end 10335]
"""
import argparse
import os
import shutil
import sys

import numpy as np


def read_depth_points(depth_path, k):
    """MATLAB `read3dPoints`/`read_3d_pts_general` semantics."""
    from PIL import Image

    d = np.asarray(Image.open(depth_path), np.uint16)
    depth = np.bitwise_or(d >> 3, d << 13).astype(np.float32) / 1000.0
    depth = np.minimum(depth, 8.0)
    h, w = depth.shape
    xs, ys = np.meshgrid(np.arange(1, w + 1), np.arange(1, h + 1))
    cx, cy, fx, fy = k[0, 2], k[1, 2], k[0, 0], k[1, 1]
    x3 = (xs - cx) * depth / fx
    y3 = depth
    z3 = -(ys - cy) * depth / fy
    pts = np.stack([x3, y3, z3], -1).reshape(-1, 3)
    valid = depth.reshape(-1) > 0
    return pts, valid, (h, w)


def extract_one(meta3d, meta2d, official_dir, out_dir, image_id):
    from PIL import Image
    from scipy import io as sio

    data = meta3d[image_id - 1]
    depthpath = os.path.join(official_dir, str(data.depthpath)[17:])
    rgbpath = os.path.join(official_dir, str(data.rgbpath)[17:])
    k = np.asarray(data.K, np.float64)
    rtilt = np.asarray(data.Rtilt, np.float64)

    pts, valid, _ = read_depth_points(depthpath, k)
    rgb = np.asarray(Image.open(rgbpath).convert("RGB"), np.float64) / 255.0
    rgb = rgb.reshape(-1, 3)[: len(pts)]
    pts = (rtilt @ pts.T).T
    cloud = np.concatenate([pts, rgb], 1)[valid].astype(np.float32)

    sio.savemat(os.path.join(out_dir, "depth", f"{image_id:06d}.mat"),
                {"instance": cloud})
    shutil.copyfile(rgbpath,
                    os.path.join(out_dir, "image", f"{image_id:06d}.jpg"))
    with open(os.path.join(out_dir, "calib", f"{image_id:06d}.txt"), "w") as f:
        f.write(" ".join(str(v) for v in rtilt.flatten(order="F")) + "\n")
        f.write(" ".join(str(v) for v in k.flatten(order="F")) + "\n")

    # v1-format label lines from the v2 3D boxes + index-matched v2 2D boxes
    lines = []
    bb3 = np.atleast_1d(getattr(data, "groundtruth3DBB", np.array([])))
    d2 = meta2d[image_id - 1]
    bb2 = np.atleast_1d(getattr(d2, "groundtruth2DBB", np.array([])))
    for j, box in enumerate(bb3):
        if j >= len(bb2):
            continue
        try:
            cls = str(box.classname)
            if str(bb2[j].classname) != cls:
                continue
            b2 = np.asarray(bb2[j].gtBb2D, np.float64).reshape(-1)
            centroid = np.asarray(box.centroid, np.float64).reshape(-1)
            coeffs = np.asarray(box.coeffs, np.float64).reshape(-1)
            basis = np.asarray(box.basis, np.float64).reshape(3, 3)
        except AttributeError:
            continue
        # MATLAB flips the basis so the first axis has positive x (order_basis)
        if basis[0, 0] < 0:
            basis[0] = -basis[0]
        lines.append(
            f"{cls} {b2[0]:.0f} {b2[1]:.0f} {b2[2]:.0f} {b2[3]:.0f} "
            f"{centroid[0]} {centroid[1]} {centroid[2]} "
            f"{coeffs[0]} {coeffs[1]} {coeffs[2]} "
            f"{basis[0, 0]} {basis[0, 1]}")
    with open(os.path.join(out_dir, "label", f"{image_id:06d}.txt"), "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--official-dir", required=True,
                    help="OFFICIAL_SUNRGBD dir with the v2 meta .mat files")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--start", type=int, default=1)
    ap.add_argument("--end", type=int, default=10335)
    args = ap.parse_args()

    from scipy import io as sio

    meta3d = sio.loadmat(
        os.path.join(args.official_dir, "SUNRGBDMeta3DBB_v2.mat"),
        squeeze_me=True, struct_as_record=False)["SUNRGBDMeta"]
    meta2d = sio.loadmat(
        os.path.join(args.official_dir, "SUNRGBDMeta2DBB_v2.mat"),
        squeeze_me=True, struct_as_record=False)["SUNRGBDMeta2DBB"]
    for sub in ("depth", "image", "calib", "label"):
        os.makedirs(os.path.join(args.output_dir, sub), exist_ok=True)
    for i in range(args.start, args.end + 1):
        if os.path.isfile(os.path.join(args.output_dir, "depth", f"{i:06d}.mat")):
            continue
        if i % 100 == 0:
            print(i, flush=True)
        try:
            extract_one(meta3d, meta2d, args.official_dir, args.output_dir, i)
        except Exception as e:  # some official entries are broken
            print(f"skip {i}: {e}", flush=True)


if __name__ == "__main__":
    main()
