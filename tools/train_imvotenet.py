#!/usr/bin/env python
"""Train ImVoteNet stage 2 on SUN RGB-D with the in-framework 2D branch.

Reference recipe: `configs/imvotenet/imvotenet-v2_stage2_16x8_sunrgbd…py` —
stage 2 trains the point/fusion towers with the 2D branch FROZEN
(`imvotenet.py:169-215`). Here the frozen branch is the `Detector2D`
checkpoint produced by `tools/train_detector2d.py`; its
`extract_bboxes_2d` (with the reference's train-time random half-drop)
feeds `VoteFusion` each step. `--gt-boxes-2d` substitutes ground-truth 2D
boxes instead (useful before a 2D checkpoint exists).

Usage:
    python tools/train_imvotenet.py --data-root data/sunrgbd \
        --work-dir work_dirs/imvotenet \
        [--detector2d work_dirs/imvotenet_2d/detector2d.pkl | --gt-boxes-2d]
"""
import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

IMG_HW = (480, 640)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--detector2d", default=None,
                    help="detector2d.pkl from tools/train_detector2d.py")
    ap.add_argument("--gt-boxes-2d", action="store_true",
                    help="use GT 2D boxes instead of the trained branch")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=36)
    ap.add_argument("--num-points", type=int, default=20000)
    ap.add_argument("--max-det2d", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if not args.gt_boxes_2d and not args.detector2d:
        ap.error("need --detector2d CKPT or --gt-boxes-2d")

    import jax
    import jax.numpy as jnp
    import optax
    from PIL import Image

    from fcaf3d_tpu.configs.votenet import votenet_sunrgbd
    from fcaf3d_tpu.data.pipelines import ShiftHeight
    from fcaf3d_tpu.models.detector2d import Detector2D, extract_bboxes_2d
    from fcaf3d_tpu.models.imvotenet import ImVoteNet, imvotenet_loss
    from fcaf3d_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    cfg = votenet_sunrgbd()
    with open(os.path.join(args.data_root, "sunrgbd_infos_train.pkl"), "rb") as f:
        infos = pickle.load(f)
    infos = [i for i in infos if i.get("annos", {}).get("gt_num", 0) > 0]
    print(f"{len(infos)} scenes")

    det2d = None
    if args.detector2d:
        det2d = Detector2D(n_classes=cfg.n_classes)
        with open(args.detector2d, "rb") as f:
            det2d_vars = pickle.load(f)

    def load_sample(info, rng):
        pts = np.fromfile(
            os.path.join(args.data_root, info["pts_path"]), np.float32
        ).reshape(-1, 6)[:, :3]
        sh = ShiftHeight()({"points": pts}, rng)
        pts = sh["points"]  # [N, 4] xyz + height
        sel = rng.choice(len(pts), args.num_points, replace=len(pts) < args.num_points)
        pts = pts[sel]
        im = Image.open(os.path.join(
            args.data_root, info["image"]["image_path"])).convert("RGB")
        w0, h0 = im.size
        img = np.asarray(im.resize((IMG_HW[1], IMG_HW[0])), np.float32)
        sx, sy = IMG_HW[1] / w0, IMG_HW[0] / h0
        annos = info["annos"]
        # depth->image projection (SUN RGB-D transposed-K + Rt + axis flip)
        from fcaf3d_tpu.data.datasets import sunrgbd_depth2img

        k = sunrgbd_depth2img(info["calib"], sx, sy)
        boxes3d = annos["gt_boxes_upright_depth"].astype(np.float32)
        if boxes3d.shape[1] == 6:
            boxes3d = np.concatenate(
                [boxes3d, np.zeros((len(boxes3d), 1), np.float32)], 1)
        labels = annos["class"].astype(np.int32)
        gt2d = annos["bbox"].astype(np.float32) * np.asarray(
            [sx, sy, sx, sy], np.float32)
        return pts, img, k, boxes3d, labels, gt2d

    def collate(samples):
        b = len(samples)
        g = cfg.max_gt_boxes
        pts = np.stack([s[0] for s in samples])
        imgs = np.stack([s[1] for s in samples])
        calib = np.stack([s[2] for s in samples])
        boxes = np.zeros((b, g, 7), np.float32)
        labels = np.zeros((b, g), np.int32)
        valid = np.zeros((b, g), bool)
        d = args.max_det2d
        gt2 = np.zeros((b, d, 6), np.float32)
        gt2v = np.zeros((b, d), bool)
        for i, (_, _, _, bx, lb, b2) in enumerate(samples):
            n = min(len(bx), g)
            boxes[i, :n], labels[i, :n], valid[i, :n] = bx[:n], lb[:n], True
            m = min(len(b2), d)
            gt2[i, :m, :4] = b2[:m]
            gt2[i, :m, 4] = 1.0
            gt2[i, :m, 5] = lb[:m].astype(np.float32)
            gt2v[i, :m] = True
        return pts, imgs, calib, boxes, labels, valid, gt2, gt2v

    net = ImVoteNet(n_classes=cfg.n_classes, n_reg_outs=cfg.n_reg_outs,
                    num_proposal=cfg.num_proposal)
    rng = np.random.default_rng(args.seed)
    s0 = collate([load_sample(infos[0], rng)])
    variables = jax.jit(lambda k, p, i, b, v, c: net.init(
        k, p, i, b, v, depth2img=c, train=False))(
        jax.random.PRNGKey(args.seed), jnp.asarray(s0[0]), jnp.asarray(s0[1]),
        jnp.asarray(s0[6]), jnp.asarray(s0[7]), jnp.asarray(s0[2]))

    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                     optax.adamw(cfg.lr, weight_decay=cfg.weight_decay))
    params, stats = variables["params"], variables.get("batch_stats", {})
    opt = tx.init(params)

    @jax.jit
    def train_step(params, stats, opt, pts, imgs, calib, gt2, gt2v,
                   boxes, labels, valid):
        def loss_fn(p):
            outs, mut = net.apply(
                {"params": p, "batch_stats": stats}, pts, imgs, gt2, gt2v,
                depth2img=calib, train=True, mutable=["batch_stats"])
            losses = imvotenet_loss(outs, pts, boxes, labels, valid,
                                    n_classes=cfg.n_classes)
            return sum(losses.values()), (losses, mut["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt, params)
        return (optax.apply_updates(params, updates), new_stats, opt2, total)

    if det2d is not None:
        extract = jax.jit(lambda imgs, key: extract_bboxes_2d(
            det2d, det2d_vars, imgs, rng=key, train=True,
            max_det=args.max_det2d))

    os.makedirs(args.work_dir, exist_ok=True)
    log = open(os.path.join(args.work_dir, "train_log.jsonl"), "a")
    steps = len(infos) // args.batch
    key = jax.random.PRNGKey(args.seed)
    for epoch in range(args.epochs):
        order = rng.permutation(len(infos))
        for it in range(steps):
            idxs = order[it * args.batch:(it + 1) * args.batch]
            batch = collate([load_sample(infos[i], rng) for i in idxs])
            pts, imgs, calib, boxes, labels, valid, gt2, gt2v = batch
            if det2d is not None:
                key, sub = jax.random.split(key)
                b2, b2v = extract(jnp.asarray(imgs), sub)
            else:
                b2, b2v = jnp.asarray(gt2), jnp.asarray(gt2v)
            params, stats, opt, total = train_step(
                params, stats, opt, jnp.asarray(pts), jnp.asarray(imgs),
                jnp.asarray(calib), b2, b2v, jnp.asarray(boxes),
                jnp.asarray(labels), jnp.asarray(valid))
            if (it + 1) % 50 == 0 or it + 1 == steps:
                rec = {"epoch": epoch + 1, "iter": it + 1,
                       "loss": round(float(total), 4)}
                print(rec, flush=True)
                log.write(json.dumps(rec) + "\n")
        with open(os.path.join(args.work_dir, "imvotenet.pkl"), "wb") as f:
            pickle.dump({"params": jax.device_get(params),
                         "batch_stats": jax.device_get(stats)}, f)
    print("saved", os.path.join(args.work_dir, "imvotenet.pkl"))


if __name__ == "__main__":
    main()
