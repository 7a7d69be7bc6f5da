#!/usr/bin/env python
"""Reference-side parity dumper (runs where torch + MinkowskiEngine exist).

Counterpart of `tools/parity_check.py`: loads a released reference FCAF3D
checkpoint (`/root/reference/README.md:81-84`), runs the reference model on
the SAME points file, and writes the SAME JSON layout, so that

    # on the reference machine (mmdet3d + ME installed):
    python tools/reference_parity_dump.py \
        --ref-repo /path/to/fcaf3d --config \
        configs/fcaf3d/fcaf3d_scannet-3d-18class.py \
        --pth epoch_12.pth --points scene.bin --dump ref_dump.json

    # on the TPU machine:
    python tools/convert_checkpoint.py --pth epoch_12.pth --out params.pkl
    python tools/parity_check.py --params params.pkl --points scene.bin \
        --dump tpu_dump.json
    python tools/parity_check.py --diff ref_dump.json tpu_dump.json

is a one-command parity verdict. `scene.bin` is a flat f32 [N, 6] xyzrgb
dump (np.ndarray.tofile) — produce it once with
`python tools/parity_check.py --export-points scene.bin --dataset scannet`
so both sides consume bit-identical inputs.

Layer-stat keys are translated to this framework's flax-intermediates
names (backbone/layer{i}_{j}/__call__[0], ...) via the hook table below;
stats are computed over MinkowskiEngine SparseTensor features (.F), which
correspond to the framework's masked valid rows (the reference has no
padding). Detections are dumped gravity-centered box7 + score + label,
sorted by descending score — the same convention as parity_check.py.

This script cannot run in the TPU build environment (no torch-cuda/ME);
it is committed as the missing half of the parity runbook (VERDICT r4
item 10). Syntax-checked only.
"""
import argparse
import json

import numpy as np

# torch module path (reference names, `mmdet3d/models/backbones/me_resnet.py`,
# `mmdet3d/models/dense_heads/fcaf3d_neck_with_head.py`) -> framework
# intermediates key prefix (see fcaf3d_tpu/models/*.py module names)
HOOKS = {
    "backbone.conv1": "backbone/conv1",
    # stages are appended programmatically: backbone.layer{i}.{j}
    "neck_with_head.centerness_conv": "neck_with_head/centerness_conv",
    "neck_with_head.reg_conv": "neck_with_head/reg_conv",
    "neck_with_head.cls_conv": "neck_with_head/cls_conv",
}
for i in range(1, 5):
    for j in range(8):  # more than any shipped depth; missing ones skipped
        HOOKS[f"backbone.layer{i}.{j}"] = f"backbone/layer{i}_{j}"
for i in range(4):
    HOOKS[f"neck_with_head.out_block_{i}"] = f"neck_with_head/out_block_{i}"
for i in range(1, 4):
    HOOKS[f"neck_with_head.up_block_{i}"] = f"neck_with_head/up_block_{i}"


def tensor_stats(x):
    """Must mirror parity_check.tensor_stats (duplicated so this file is
    self-contained on the reference machine)."""
    x = np.asarray(x, np.float64)
    if x.size == 0:
        return {"n": 0}
    return {
        "n": int(x.size),
        "mean": float(x.mean()),
        "std": float(x.std()),
        "absmax": float(np.abs(x).max()),
        "finite_frac": float(np.isfinite(x).mean()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-repo", required=True,
                    help="path to the reference SamsungLabs/fcaf3d checkout")
    ap.add_argument("--config", required=True,
                    help="reference config path, relative to --ref-repo")
    ap.add_argument("--pth", required=True)
    ap.add_argument("--points", required=True,
                    help="flat f32 [N, load-dim] .bin (xyzrgb)")
    ap.add_argument("--load-dim", type=int, default=6)
    ap.add_argument("--dump", required=True)
    ap.add_argument("--device", default="cuda:0")
    args = ap.parse_args()

    import os
    import sys

    sys.path.insert(0, args.ref_repo)
    try:
        import torch
        from mmcv import Config
        from mmdet3d.models import build_model
    except ImportError as e:  # pragma: no cover - reference-env only
        raise SystemExit(
            f"{e}\nThis script needs the reference environment "
            "(torch + mmcv + mmdet3d + MinkowskiEngine); see module "
            "docstring for the runbook.")

    cfg = Config.fromfile(os.path.join(args.ref_repo, args.config))
    model = build_model(cfg.model, test_cfg=cfg.get("test_cfg"))
    ckpt = torch.load(args.pth, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    if missing:
        print(f"WARNING: {len(missing)} missing keys (head mismatch?)")
    model = model.to(args.device).eval()

    stats = {}

    def mk_hook(name):
        def hook(_mod, _inp, out):
            feats = out.F if hasattr(out, "F") else out
            stats[f"{name}/__call__[0]"] = tensor_stats(
                feats.detach().cpu().numpy())

        return hook

    by_name = dict(model.named_modules())
    n_hooked = 0
    for tname, fname in HOOKS.items():
        mod = by_name.get(tname)
        if mod is not None:
            mod.register_forward_hook(mk_hook(fname))
            n_hooked += 1
    print(f"hooked {n_hooked} modules")

    pts = np.fromfile(args.points, np.float32).reshape(-1, args.load_dim)
    points = torch.from_numpy(pts).to(args.device)
    img_metas = [{"box_type_3d": __import__(
        "mmdet3d.core", fromlist=["bbox"]).bbox.structures.DepthInstance3DBoxes}]
    with torch.no_grad():
        results = model.simple_test(points=[points], img_metas=img_metas)

    det = results[0]["boxes_3d"]
    boxes = det.tensor.cpu().numpy()  # [K, 7] bottom-center box7
    # -> gravity-centered (parity_check dumps gravity-centered boxes)
    boxes = boxes.copy()
    boxes[:, 2] += boxes[:, 5] / 2.0
    scores = results[0]["scores_3d"].cpu().numpy()
    labels = results[0]["labels_3d"].cpu().numpy()
    order = np.argsort(-scores)

    dump = {
        "config": os.path.basename(args.config),
        "layer_stats": stats,
        "detections": {
            "boxes": boxes[order].tolist(),
            "scores": scores[order].tolist(),
            "labels": labels[order].tolist(),
        },
    }
    with open(args.dump, "w") as f:
        json.dump(dump, f, indent=1)
    print(f"wrote {args.dump} ({len(stats)} layer records, "
          f"{len(scores)} detections)")


if __name__ == "__main__":
    main()
