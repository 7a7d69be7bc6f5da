#!/usr/bin/env python
"""Parity-on-arrival harness: per-layer activation stats + final detections
for a converted reference checkpoint, ready to diff the moment real data /
released `.pth` files are available.

Protocol (reference `/root/reference/README.md:70-84`, `tools/test5x5.py`):
1. `python tools/convert_checkpoint.py --pth epoch_12.pth --out params.pkl`
2. `python tools/parity_check.py --params params.pkl --dataset scannet \
       --dump tpu_dump.json`
   runs `neck_mode="reference"` inference (exact reference op ordering,
   `fcaf3d_head.py` docstring) on the committed fixture scene (or any
   `--points xyz.bin`), recording per-module activation statistics and the
   final detections.
3. Diff two dumps (TPU vs a reference-side dump, or two TPU builds):
   `python tools/parity_check.py --diff a.json b.json [--rtol 1e-3]`

Without `--params` it initializes random weights — useful to smoke the
harness itself (exercised by tests/test_parity_harness.py).

Known index-level nondeterminism: knn/three_nn/ball_query break exact-
duplicate-point ties arbitrarily (TPU partial-reduce top-k), whereas the
reference CUDA ops' strict-less scans pick the lowest index. Distances and
interpolated FEATURES are identical either way, so activation stats and
detections match; only raw neighbor-INDEX dumps can flap on scenes with
duplicated points (ScanNet/SUN RGB-D sample with replacement).
"""
import argparse
import dataclasses
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_FIXTURES = "/root/reference/tests/data"


def tensor_stats(x, mask=None):
    """Summary stats of one activation array (masked rows excluded)."""
    x = np.asarray(x, np.float64)
    if mask is not None:
        m = np.asarray(mask, bool)
        x = x[m] if m.shape == x.shape[: m.ndim] else x
    if x.size == 0:
        return {"n": 0}
    return {
        "n": int(x.size),
        "mean": float(x.mean()),
        "std": float(x.std()),
        "absmax": float(np.abs(x).max()),
        "finite_frac": float(np.isfinite(x).mean()),
    }


def collect_stats(tree, prefix, out):
    """Walk a flax intermediates subtree; SparseTensors contribute masked
    feature stats, plain arrays contribute raw stats."""
    from fcaf3d_tpu.ops.sparse.tensor import SparseTensor

    if isinstance(tree, SparseTensor):
        out[prefix] = tensor_stats(tree.feats, np.asarray(tree.valid))
        out[prefix + ".n_valid"] = {
            "n": int(np.asarray(tree.num_valid()).sum())}
        return
    if isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            collect_stats(v, f"{prefix}[{i}]", out)
        return
    if isinstance(tree, dict):
        for k, v in tree.items():
            collect_stats(v, f"{prefix}/{k}" if prefix else str(k), out)
        return
    if hasattr(tree, "shape"):
        out[prefix] = tensor_stats(tree)
        return
    if dataclasses.is_dataclass(tree):
        for f in dataclasses.fields(tree):
            collect_stats(getattr(tree, f.name), f"{prefix}.{f.name}", out)


def load_fixture_points(dataset: str):
    """The reference's committed real scene through the deterministic test
    pipeline (GlobalAlignment for ScanNet; no augmentation)."""
    from fcaf3d_tpu.data import Compose, GlobalAlignment, IndoorDetDataset
    from fcaf3d_tpu.data.datasets import SCANNET_CLASSES, SUNRGBD_CLASSES

    root = os.path.join(REF_FIXTURES, dataset)
    infos = {
        "scannet": ("scannet_infos.pkl", SCANNET_CLASSES, 6),
        "sunrgbd": ("sunrgbd_infos.pkl", SUNRGBD_CLASSES, 6),
    }[dataset]
    ds = IndoorDetDataset(
        root, os.path.join(root, infos[0]), infos[1],
        pipeline=Compose([GlobalAlignment()]) if dataset == "scannet" else None,
        load_dim=infos[2], test_mode=True,
    )
    sample = ds.get_sample(0, np.random.default_rng(0))
    return sample["points"]


def run_dump(args):
    import jax
    import jax.numpy as jnp

    from fcaf3d_tpu import configs
    from fcaf3d_tpu.models import FCAF3D
    from fcaf3d_tpu.models.detector import infer_config
    from fcaf3d_tpu.models.fcaf3d_head import fcaf3d_get_bboxes

    cfg = getattr(configs, args.config or f"fcaf3d_{args.dataset}")()
    # exact reference op ordering: conv all children -> union add -> prune
    cfg = dataclasses.replace(cfg, neck_mode="reference",
                              compute_dtype="float32")
    model = FCAF3D(cfg)

    if args.points:
        pts = np.fromfile(args.points, np.float32).reshape(-1, args.load_dim)
    else:
        pts = load_fixture_points(args.dataset)
    rng = np.random.RandomState(0)
    n = cfg.num_points
    idx = rng.choice(len(pts), n, replace=len(pts) < n)
    pts = pts[idx]
    points = jnp.asarray(pts[None, :, :3])
    colors = jnp.asarray(pts[None, :, 3:6]) if pts.shape[1] >= 6 else (
        jnp.zeros((1, n, 3), jnp.float32))
    valid = jnp.ones((1, n), bool)

    if args.params:
        with open(args.params, "rb") as f:
            loaded = pickle.load(f)
        variables = {
            "params": jax.tree_util.tree_map(jnp.asarray, loaded["params"]),
            "batch_stats": jax.tree_util.tree_map(
                jnp.asarray, loaded.get("batch_stats", {})),
        }
    else:
        print("no --params: random init (harness smoke mode)")
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), points, colors, valid)
        variables = {"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})}

    outs, inter = model.apply(
        variables, points, colors, valid, train=False,
        capture_intermediates=True, mutable=["intermediates", "overflow"],
    )
    stats = {}
    collect_stats(inter.get("intermediates", {}), "", stats)

    dets = fcaf3d_get_bboxes(outs, infer_config(cfg))
    keep = np.asarray(dets.valid[0])
    order = np.argsort(-np.asarray(dets.scores[0])[keep])
    dump = {
        "config": f"fcaf3d_{args.dataset}",
        "layer_stats": stats,
        "detections": {
            "boxes": np.asarray(dets.boxes[0])[keep][order].tolist(),
            "scores": np.asarray(dets.scores[0])[keep][order].tolist(),
            "labels": np.asarray(dets.labels[0])[keep][order].tolist(),
        },
    }
    if args.dump:
        with open(args.dump, "w") as f:
            json.dump(dump, f, indent=1)
        print(f"wrote {args.dump} ({len(stats)} layer records, "
              f"{int(keep.sum())} detections)")
    else:
        for k in sorted(stats):
            print(k, stats[k])
    return dump


def run_diff(path_a, path_b, rtol):
    with open(path_a) as f:
        a = json.load(f)
    with open(path_b) as f:
        b = json.load(f)
    worst = (0.0, None)
    missing = []
    for k, sa in a["layer_stats"].items():
        sb = b["layer_stats"].get(k)
        if sb is None:
            missing.append(k)
            continue
        for field in ("mean", "std", "absmax"):
            if field not in sa or field not in sb:
                continue
            denom = max(abs(sa[field]), abs(sb[field]), 1e-6)
            rel = abs(sa[field] - sb[field]) / denom
            if rel > worst[0]:
                worst = (rel, f"{k}.{field}: {sa[field]:.6g} vs {sb[field]:.6g}")
    na = len(a["detections"]["scores"])
    nb = len(b["detections"]["scores"])
    print(f"layers compared: {len(a['layer_stats']) - len(missing)}, "
          f"missing in b: {len(missing)}")
    print(f"detections: {na} vs {nb}")
    if worst[1]:
        print(f"worst layer-stat deviation: {worst[0]:.3e} ({worst[1]})")
    ok = worst[0] <= rtol and na == nb
    print("PARITY OK" if ok else "PARITY FAIL")
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default=None,
                    help="converted checkpoint pickle (convert_checkpoint.py)")
    ap.add_argument("--dataset", default="scannet",
                    choices=("scannet", "sunrgbd", "s3dis"))
    ap.add_argument("--config", default=None,
                    help="config factory override (e.g. fcaf3d_tiny)")
    ap.add_argument("--points", default=None,
                    help="override: raw .bin point file instead of fixture")
    ap.add_argument("--load-dim", type=int, default=6, dest="load_dim")
    ap.add_argument("--dump", default=None, help="output JSON path")
    ap.add_argument("--diff", nargs=2, metavar=("A", "B"),
                    help="compare two dumps instead of running")
    ap.add_argument("--rtol", type=float, default=1e-3)
    ap.add_argument("--export-points", default=None, metavar="OUT.bin",
                    help="write the sampled fixture scene as a flat f32 "
                    "[N, 6] .bin and exit — feed the SAME file to "
                    "tools/reference_parity_dump.py on the reference "
                    "machine so both dumps consume bit-identical inputs")
    args = ap.parse_args()
    if args.diff:
        sys.exit(run_diff(args.diff[0], args.diff[1], args.rtol))
    if args.export_points:
        pts = load_fixture_points(args.dataset)
        rng = np.random.RandomState(0)
        from fcaf3d_tpu import configs

        cfg = getattr(configs, args.config or f"fcaf3d_{args.dataset}")()
        idx = rng.choice(len(pts), cfg.num_points,
                         replace=len(pts) < cfg.num_points)
        out = np.zeros((cfg.num_points, 6), np.float32)
        out[:, :pts.shape[1]] = pts[idx][:, :6]
        out.tofile(args.export_points)
        print(f"wrote {args.export_points} ({cfg.num_points} x 6 f32)")
        return
    run_dump(args)


if __name__ == "__main__":
    main()
