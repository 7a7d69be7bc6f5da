#!/usr/bin/env python
"""Occupancy + kernel-map-span calibration on realistic surface scenes.

Real indoor scans are 2D manifolds (floors, walls, furniture shells), not
uniform volumes — voxel counts per stride level and kernel-map window spans
both depend on that structure. This script synthesizes room-like scans
(floor + walls + box/cylinder furniture shells, with scan-like point
density and noise), runs them through voxelize + the backbone/neck
coordinate cascade, and reports:

  * voxel-count distributions per stride level (-> budget calibration),
  * per-(tile, offset) kernel-map span distributions (-> Pallas window
    sizes in ops/sparse/gather_kernel.py).

Usage: python tools/calibrate_budgets.py [--scenes 8] [--points 100000]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def synth_room(rng, n_points=100000, size=None):
    """Point cloud of a room interior: floor, 4 walls (partial), furniture
    shells. Returns [N, 3] float32 in meters (z up, origin at floor corner)."""
    if size is None:
        size = rng.uniform([4.0, 4.0, 2.4], [9.0, 9.0, 3.2])
    sx, sy, sz = size
    patches = []
    weights = []

    def rect(origin, u, v, density):
        patches.append(("rect", np.asarray(origin, np.float64),
                        np.asarray(u, np.float64), np.asarray(v, np.float64)))
        weights.append(np.linalg.norm(u) * np.linalg.norm(v) * density)

    # floor (dense: scanners see it well) + partial ceiling
    rect([0, 0, 0], [sx, 0, 0], [0, sy, 0], 1.0)
    if rng.rand() < 0.5:
        rect([0, 0, sz], [sx, 0, 0], [0, sy, 0], 0.3)
    # walls, each partially observed
    for origin, u in [([0, 0, 0], [sx, 0, 0]), ([0, sy, 0], [sx, 0, 0]),
                      ([0, 0, 0], [0, sy, 0]), ([sx, 0, 0], [0, sy, 0])]:
        rect(origin, u, [0, 0, sz], rng.uniform(0.4, 0.9))
    # furniture: boxes (tables, cabinets, beds) — top + sides
    n_furn = rng.randint(5, 14)
    for _ in range(n_furn):
        w, d, h = rng.uniform([0.3, 0.3, 0.3], [2.0, 2.0, 1.2])
        x0, y0 = rng.uniform([0.2, 0.2], [sx - w - 0.2, sy - d - 0.2])
        rect([x0, y0, h], [w, 0, 0], [0, d, 0], 1.2)  # top
        for o, u in [([x0, y0, 0], [w, 0, 0]), ([x0, y0 + d, 0], [w, 0, 0]),
                     ([x0, y0, 0], [0, d, 0]), ([x0 + w, y0, 0], [0, d, 0])]:
            rect(o, u, [0, 0, h], rng.uniform(0.3, 0.9))

    w = np.asarray(weights)
    w = w / w.sum()
    counts = rng.multinomial(n_points, w)
    pts = []
    for (kind, o, u, v), c in zip(patches, counts):
        a = rng.rand(c, 1)
        b = rng.rand(c, 1)
        pts.append(o + a * u + b * v)
    p = np.concatenate(pts, 0)
    p += rng.randn(*p.shape) * 0.004  # scanner noise ~4mm
    return p.astype(np.float32)


def synth_sunrgbd(rng, n_points=100000, width=640, height=480, fx=570.0):
    """Single-view depth scan of a room (SUN RGB-D acquisition model:
    one Kinect frame, `sunrgbd_data_utils.py:125-220` back-projects every
    valid depth pixel, no 50k cap). Density is pixel-quantized and falls
    off with depth^2 — near-field surfaces collapse heavily under 1cm
    dedup, so the voxel cascade differs a lot from a full scan.

    Simulated by z-buffering dense room-surface samples into a virtual
    640x480 depth frame and keeping one (nearest) sample per pixel, then
    IndoorPointSample(n_points)."""
    pts = synth_room(rng, n_points=700000)
    # camera in a corner region, typical sensor height, looking at the room
    ext = pts.max(0)
    cam = np.array([rng.uniform(0.2, 0.8), rng.uniform(0.2, 0.8),
                    rng.uniform(0.9, 1.7)])
    target = np.array([ext[0] * rng.uniform(0.4, 0.8),
                       ext[1] * rng.uniform(0.4, 0.8),
                       rng.uniform(0.6, 1.4)])
    f = target - cam
    f = f / np.linalg.norm(f)
    up = np.array([0.0, 0.0, 1.0])
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)
    # camera frame: x right, y down, z forward
    rel = pts - cam
    xc = rel @ r
    yc = -(rel @ u)
    zc = rel @ f
    vis = zc > 0.4
    ui = np.floor(fx * xc[vis] / zc[vis] + width / 2).astype(np.int64)
    vi = np.floor(fx * yc[vis] / zc[vis] + height / 2).astype(np.int64)
    inb = (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height)
    pix = vi[inb] * width + ui[inb]
    depth = zc[vis][inb]
    src = np.where(vis)[0][inb]
    # z-buffer: nearest sample per pixel wins
    order = np.lexsort((depth, pix))
    pix_s = pix[order]
    first = np.ones(len(pix_s), bool)
    first[1:] = pix_s[1:] != pix_s[:-1]
    cloud = pts[src[order][first]]
    if len(cloud) >= n_points:
        cloud = cloud[rng.choice(len(cloud), n_points, replace=False)]
    else:
        cloud = cloud[rng.choice(len(cloud), n_points, replace=True)]
    return cloud.astype(np.float32)


def load_real(path, points=100000, load_dim=6):
    """Ingest a prepared `.bin` cloud (float32 rows, xyz first) and apply
    IndoorPointSample(points) — the real-data calibration path for when
    full datasets are present (the committed reference fixtures keep only
    100 points per scene, enough to exercise the code path but not to set
    budgets)."""
    raw = np.fromfile(path, np.float32)
    for d in (load_dim, 6, 4, 3):
        if len(raw) % d == 0:
            raw = raw.reshape(-1, d)
            break
    rng = np.random.RandomState(0)
    n = len(raw)
    idx = rng.choice(n, points, replace=n < points)
    return raw[idx, :3].astype(np.float32)


def cascade_counts(pts, voxel_size=0.01):
    """Unique-voxel counts along the FCAF3D coordinate cascade."""
    c = np.floor(pts / voxel_size).astype(np.int64)

    def nuniq(cc):
        key = (cc[:, 0] << 42) + (cc[:, 1] << 21) + cc[:, 2]
        return len(np.unique(key)), cc[np.unique(key, return_index=True)[1]]

    counts = {}
    n0, u = nuniq(c)
    counts["input(s1)"] = n0
    # backbone: conv k3 s2 -> s2 ; maxpool s2 -> s4 ; then stride-2 stages
    cur = u
    stride = 1
    names = ["conv1(s2)", "pool(s4)", "stage1(s8)", "stage2(s16)",
             "stage3(s32)", "stage4(s64)"]
    for nm in names:
        cur = np.unique(np.floor_divide(cur, 2), axis=0)
        stride *= 2
        counts[nm] = len(cur)
    return counts


def span_stats(pts, voxel_size=0.01, tile=256, stride_level=2):
    """Per-(tile, offset) kernel-map spans for a k3 s1 submanifold conv on
    the sorted coordinate map at `stride_level` downsamplings."""
    c = np.floor(pts / voxel_size).astype(np.int64)
    for _ in range(stride_level):
        c = np.unique(np.floor_divide(c, 2), axis=0)
    key = (c[:, 0] << 42) + (c[:, 1] << 21) + c[:, 2]
    key = np.unique(key)
    n = len(key)
    spans = []
    import itertools
    for dx, dy, dz in itertools.product((-1, 0, 1), repeat=3):
        dk = (dx << 42) + (dy << 21) + dz
        q = key + dk
        pos = np.searchsorted(key, q)
        pos_c = np.minimum(pos, n - 1)
        hit = key[pos_c] == q
        idx = np.where(hit, pos_c, -1)
        for t0 in range(0, n - tile + 1, tile):
            w = idx[t0:t0 + tile]
            w = w[w >= 0]
            if len(w) > 1:
                spans.append(w.max() - w.min() + 1)
    return np.asarray(spans), n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--points", type=int, default=100000,
                    help="pipeline sample size (IndoorPointSample num_points)")
    ap.add_argument("--raw-points", type=int, default=0,
                    help="raw scene point cap BEFORE sampling (ScanNet "
                    "detection data is extracted with --max_num_point 50000, "
                    "reference data/scannet/README.md:7; sampling 100k from "
                    "<=50k duplicates, and dedup collapses duplicates)")
    ap.add_argument("--min-side", type=float, default=4.0)
    ap.add_argument("--max-side", type=float, default=9.0)
    ap.add_argument("--noise", type=float, default=0.004)
    ap.add_argument("--spans", action="store_true", help="also measure kernel-map spans")
    ap.add_argument("--dataset", choices=("scannet", "sunrgbd", "s3dis"),
                    default="scannet",
                    help="acquisition model: scannet = fused scan capped at "
                    "50k raw points (pass --raw-points 50000); sunrgbd = "
                    "single Kinect view (z-buffered frame); s3dis = dense "
                    "Matterport room (~1M raw points, sample 100k)")
    ap.add_argument("--real", default=None,
                    help="glob of prepared .bin clouds to calibrate on "
                    "instead of synthetic scenes")
    ap.add_argument("--voxel-size", type=float, default=0.01)
    args = ap.parse_args()

    rng = np.random.RandomState(0)

    def gen(rr):
        if args.dataset == "sunrgbd":
            return synth_sunrgbd(rr, args.points)
        size = rr.uniform([args.min_side, args.min_side, 2.4],
                          [args.max_side, args.max_side, 3.2])
        raw = args.raw_points
        if args.dataset == "s3dis" and not raw:
            raw = 1000000  # dense Matterport coverage before the 100k sample
        n = max(raw, args.points) if raw else args.points
        p = synth_room(rr, n, size=size)
        if raw and raw < len(p):
            p = p[rr.choice(len(p), raw, replace=False)]
        if len(p) > args.points:
            p = p[rr.choice(len(p), args.points, replace=False)]
        elif len(p) < args.points:  # IndoorPointSample with replacement
            p = p[rr.choice(len(p), args.points, replace=True)]
        return p

    if args.real:
        import glob as globmod
        files = sorted(globmod.glob(args.real))
        if not files:
            raise SystemExit(f"no files match {args.real}")
        scenes = [load_real(f, args.points) for f in files]
        print(f"calibrating on {len(scenes)} real clouds from {args.real}")
    else:
        scenes = None

    all_counts = {}
    for s in range(args.scenes if scenes is None else len(scenes)):
        pts = scenes[s] if scenes is not None else gen(rng)
        cc = cascade_counts(pts, voxel_size=args.voxel_size)
        for k, v in cc.items():
            all_counts.setdefault(k, []).append(v)
        print(f"scene {s}: " + "  ".join(f"{k}={v}" for k, v in cc.items()), flush=True)

    print("\nlevel      mean    p95     max   suggested budget (p95*1.1 -> x512)")
    for k, v in all_counts.items():
        v = np.asarray(v)
        sug = int(-(-np.percentile(v, 95) * 1.1 // 512) * 512)
        print(f"{k:11s} {v.mean():7.0f} {np.percentile(v, 95):7.0f} "
              f"{v.max():7.0f}   {sug}")

    if args.spans:
        print("\nkernel-map spans (k3 s1, tile=256 rows):")
        for lvl in (0, 1, 2, 3):
            sp, n = span_stats(synth_room(np.random.RandomState(1), args.points),
                               stride_level=lvl)
            print(f"  level s{2**lvl}: rows={n}  span p50={np.percentile(sp,50):.0f} "
                  f"p95={np.percentile(sp,95):.0f} p99={np.percentile(sp,99):.0f} "
                  f"max={sp.max()}  frac>512: {(sp>512).mean():.4f} "
                  f"frac>1024: {(sp>1024).mean():.4f}")


if __name__ == "__main__":
    main()
