#!/usr/bin/env python
"""Training-step throughput benchmark (fwd + bwd + optimizer update).

The reference's training benchmark analog (`docs/benchmarks.md`); FCAF3D
trains at global batch 16 (`configs/fcaf3d/fcaf3d.py:30-33`, 8/GPU x 2).
Prints one JSON line with scenes/sec at the configured batch.

Example:
    python tools/bench_train.py [--batch 16] [--steps 8] [--config fcaf3d_scannet]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None,
                    help="global batch (default: config batch_size)")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--config", default="fcaf3d_scannet",
                    help="fcaf3d_* or votenet_* config factory")
    ap.add_argument("--trace", action="store_true",
                    help="profile one warm timing block and print the "
                    "per-op device-time table")
    ap.add_argument("--trace-top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fcaf3d_tpu.utils import setup_compilation_cache

    setup_compilation_cache()

    from bench import synth_scene
    from fcaf3d_tpu import configs
    from fcaf3d_tpu.train import create_train_state, make_optimizer, make_train_step

    cfg = getattr(configs, args.config)()
    b = args.batch or cfg.batch_size
    p, g = cfg.num_points, cfg.max_gt_boxes

    rng = np.random.RandomState(0)
    pts = np.stack([synth_scene(rng, p)[0] for _ in range(b)])
    boxes = np.zeros((b, g, 7), np.float32)
    boxes[..., :2] = rng.uniform(0.5, 5.0, (b, g, 2))
    boxes[..., 2] = 0.0
    boxes[..., 3:6] = rng.uniform(0.3, 1.5, (b, g, 3))
    labels = rng.randint(0, cfg.n_classes, (b, g)).astype(np.int32)
    tx = make_optimizer(lr=cfg.lr, weight_decay=cfg.weight_decay,
                        grad_clip=cfg.grad_clip, steps_per_epoch=1000,
                        lr_steps=cfg.lr_steps)

    if args.config.startswith("votenet"):
        # VoteNet training throughput is the reference's published training
        # benchmark (docs/benchmarks.md:8-23: 358 samples/s on 8x V100)
        from fcaf3d_tpu.models.votenet import VoteNet
        from fcaf3d_tpu.train.trainer import TrainState, make_votenet_train_step

        model = VoteNet(
            n_classes=cfg.n_classes, n_reg_outs=cfg.n_reg_outs,
            yaw_parametrization=cfg.yaw_parametrization,
            num_proposal=cfg.num_proposal,
            backbone_num_points=cfg.backbone_num_points,
            sample_mod=cfg.sample_mod,
        )
        height = pts[..., 2:3] - np.percentile(pts[..., 2], 1)
        variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
            jax.random.PRNGKey(0),
            jnp.zeros((1, p, 3 + cfg.in_feat_dims), jnp.float32))
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        )
        step = make_votenet_train_step(model, cfg, tx)
        batch = {
            "points": jnp.asarray(
                np.concatenate([pts, height], axis=-1).astype(np.float32)),
            "gt_boxes": jnp.asarray(boxes),
            "gt_labels": jnp.asarray(labels),
            "gt_valid": jnp.ones((b, g), bool),
        }
    else:
        batch = {
            "points": jnp.asarray(pts),
            "colors": jnp.asarray(
                rng.uniform(0, 255, (b, p, 3)).astype(np.float32)),
            "valid": jnp.ones((b, p), bool),
            "gt_boxes": jnp.asarray(boxes),
            "gt_labels": jnp.asarray(labels),
            "gt_valid": jnp.ones((b, g), bool),
        }
        model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx)
        step = make_train_step(model, cfg, tx)

    # serialized protocol (same as bench.py): run all steps inside ONE
    # lax.scan with the TrainState as carry, and synchronize by converting
    # the final loss to a Python float (a real D2H). Per-call wall timing +
    # block_until_ready is NOT trustworthy through the tunneled TPU backend
    # (dispatch returns early and block can no-op -> ms-level fake numbers).
    def many(state, batch):
        def body(carry, _):
            new_state, metrics = step(carry, batch)
            return new_state, metrics["loss"]

        return jax.lax.scan(body, state, None, length=args.steps)

    jmany = jax.jit(many, donate_argnums=0)
    state, losses = jmany(state, batch)
    first_loss = float(losses[0])  # compile + warm (pays first-D2H cost)
    if args.trace:
        # per-op device-time table of the warm train step (same summarizer
        # as trace_forward.py)
        from trace_forward import summarize

        tdir = os.path.join("/tmp", f"train_trace_{args.config}_b{b}")
        with jax.profiler.trace(tdir):
            state, losses = jmany(state, batch)
            float(losses[-1])
        summarize(tdir, top=args.trace_top)
    t0 = time.perf_counter()
    state, losses = jmany(state, batch)
    last_loss = float(losses[-1])
    dt = (time.perf_counter() - t0) / args.steps

    print(json.dumps({
        "metric": f"{args.config}_train_step",
        "config": args.config,
        "batch": b,
        "step_ms": round(dt * 1000, 1),
        "value": round(b / dt, 3),
        "unit": "scenes/sec",
        "loss": round(last_loss, 4),
        "first_loss": round(first_loss, 4),
    }))


if __name__ == "__main__":
    main()
