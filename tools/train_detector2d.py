#!/usr/bin/env python
"""Train ImVoteNet's stage-1 2D detector on SUN RGB-D 2D annotations.

The reference freezes a Faster R-CNN pretrained via mmdetection
(`configs/_base_/models/imvotenet_image.py`); here the compact FCOS-style
`Detector2D` is trained directly on the converter-extracted 2D boxes
(`annos['bbox']` xyxy + `annos['class']`) and its checkpoint feeds
`extract_bboxes_2d` for stage-2 training.

Usage:
    python tools/train_detector2d.py --data-root data/sunrgbd \
        --work-dir work_dirs/imvotenet_2d [--epochs 12] [--batch 8]
"""
import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

IMG_HW = (480, 640)  # fixed input (SUN RGB-D images are ~530x730)


def load_sample(root, info, rng, train=True):
    from PIL import Image

    path = os.path.join(root, info["image"]["image_path"])
    im = Image.open(path).convert("RGB")
    w0, h0 = im.size
    im = im.resize((IMG_HW[1], IMG_HW[0]))
    img = np.asarray(im, np.float32)
    sx, sy = IMG_HW[1] / w0, IMG_HW[0] / h0
    annos = info.get("annos", {})
    if annos.get("gt_num", 0):
        boxes = annos["bbox"].astype(np.float32)
        boxes = boxes * np.asarray([sx, sy, sx, sy], np.float32)
        labels = annos["class"].astype(np.int32)
    else:
        boxes = np.zeros((0, 4), np.float32)
        labels = np.zeros((0,), np.int32)
    if train and rng.random() < 0.5:  # horizontal flip
        img = img[:, ::-1]
        x1 = IMG_HW[1] - boxes[:, 2]
        x2 = IMG_HW[1] - boxes[:, 0]
        boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], -1)
    return img, boxes, labels


def collate(samples, max_gt=32):
    b = len(samples)
    imgs = np.stack([s[0] for s in samples])
    boxes = np.zeros((b, max_gt, 4), np.float32)
    labels = np.zeros((b, max_gt), np.int32)
    valid = np.zeros((b, max_gt), bool)
    for i, (_, bx, lb) in enumerate(samples):
        n = min(len(bx), max_gt)
        boxes[i, :n] = bx[:n]
        labels[i, :n] = lb[:n]
        valid[i, :n] = True
    return imgs, boxes, labels, valid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from fcaf3d_tpu.models.detector2d import Detector2D, detector2d_loss
    from fcaf3d_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    with open(os.path.join(args.data_root, "sunrgbd_infos_train.pkl"), "rb") as f:
        infos = pickle.load(f)
    infos = [i for i in infos if i.get("annos", {}).get("gt_num", 0) > 0]
    print(f"{len(infos)} images with 2D annotations")

    model = Detector2D(n_classes=10)
    zeros = jnp.zeros((1, IMG_HW[0], IMG_HW[1], 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(args.seed), zeros)
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(args.lr, weight_decay=1e-4),
    )
    params, stats = variables["params"], variables.get("batch_stats", {})
    opt = tx.init(params)

    @jax.jit
    def train_step(params, stats, opt, imgs, boxes, labels, valid):
        def loss_fn(p):
            outs, mut = model.apply(
                {"params": p, "batch_stats": stats}, imgs, train=True,
                mutable=["batch_stats"])
            losses = detector2d_loss(outs, boxes, labels, valid)
            return sum(losses.values()), (losses, mut.get("batch_stats", {}))

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt, params)
        return (optax.apply_updates(params, updates), new_stats, opt2,
                total, losses)

    os.makedirs(args.work_dir, exist_ok=True)
    log = open(os.path.join(args.work_dir, "train_log.jsonl"), "a")
    rng = np.random.default_rng(args.seed)
    steps = len(infos) // args.batch
    for epoch in range(args.epochs):
        order = rng.permutation(len(infos))
        for it in range(steps):
            idxs = order[it * args.batch:(it + 1) * args.batch]
            samples = [load_sample(args.data_root, infos[i], rng) for i in idxs]
            imgs, boxes, labels, valid = collate(samples)
            params, stats, opt, total, losses = train_step(
                params, stats, opt, jnp.asarray(imgs), jnp.asarray(boxes),
                jnp.asarray(labels), jnp.asarray(valid))
            if (it + 1) % 50 == 0 or it + 1 == steps:
                rec = {"epoch": epoch + 1, "iter": it + 1,
                       "loss": round(float(total), 4),
                       **{k: round(float(v), 4) for k, v in losses.items()}}
                print(rec, flush=True)
                log.write(json.dumps(rec) + "\n")
        with open(os.path.join(args.work_dir, "detector2d.pkl"), "wb") as f:
            pickle.dump(
                {"params": jax.device_get(params),
                 "batch_stats": jax.device_get(stats)}, f)
    print("saved", os.path.join(args.work_dir, "detector2d.pkl"))


if __name__ == "__main__":
    main()
