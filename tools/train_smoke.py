#!/usr/bin/env python
"""Full-scale synthetic training smoke/benchmark: step time + loss descent.

Runs the real ScanNet-size FCAF3D train step on synthetic clustered scenes
(batch 8 like the reference's per-2-GPU global batch is 16; see --batch).
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=40)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from fcaf3d_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    from fcaf3d_tpu.configs import fcaf3d_scannet
    from fcaf3d_tpu.train import create_train_state, make_optimizer, make_train_step

    cfg = dataclasses.replace(fcaf3d_scannet(), batch_size=args.batch)
    tx = make_optimizer(lr=cfg.lr, weight_decay=cfg.weight_decay,
                        grad_clip=cfg.grad_clip, steps_per_epoch=100)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx)
    step = make_train_step(model, cfg, tx)

    rng = np.random.RandomState(0)
    b, p, g = args.batch, cfg.num_points, cfg.max_gt_boxes
    pts = rng.uniform(0, 6.0, (b, p, 3)).astype(np.float32)
    boxes = np.zeros((b, g, 7), np.float32)
    boxes[..., :2] = rng.uniform(1, 5, (b, g, 2))
    boxes[..., 3:6] = rng.uniform(0.3, 1.2, (b, g, 3))
    for i in range(b):
        for j in range(12):
            c, d = boxes[i, j, :3], boxes[i, j, 3:6]
            lo, hi = j * 2000, (j + 1) * 2000
            pts[i, lo:hi] = rng.uniform(c - d / 2, c + d / 2, (2000, 3))
            pts[i, lo:hi, 2] += d[2] / 2
    batch = {
        "points": jnp.asarray(pts),
        "colors": jnp.asarray(rng.uniform(0, 255, (b, p, 3)).astype(np.float32)),
        "valid": jnp.ones((b, p), bool),
        "gt_boxes": jnp.asarray(boxes),
        "gt_labels": jnp.asarray(rng.randint(0, 18, (b, g)).astype(np.int32)),
        "gt_valid": jnp.asarray(np.tile(np.arange(g) < 12, (b, 1))),
    }
    t0 = time.time()
    state, m = step(state, batch)
    print(f"first step (compile): {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(10):
        state, m = step(state, batch)
    loss = float(m["loss"])
    dt = (time.time() - t0) / 10
    print(f"train step: {dt * 1000:.1f} ms/step "
          f"({args.batch / dt:.2f} scenes/s), loss={loss:.4f}", flush=True)
    for i in range(args.steps):
        state, m = step(state, batch)
        if i % 10 == 9:
            print(
                f"step {i + 1}: loss={float(m['loss']):.4f} "
                f"cls={float(m['loss_cls']):.4f} "
                f"bbox={float(m['loss_bbox']):.4f} "
                f"ctr={float(m['loss_centerness']):.4f} "
                f"gn={float(m['grad_norm']):.2f}", flush=True)


if __name__ == "__main__":
    main()
