"""High-level training loop (the native runner layer).

The reference delegates to mmcv `EpochBasedRunner` via a 30-line shim
(`/root/reference/mmdet3d/apis/train.py:5-34`); this framework owns the
loop: epoch iteration, jitted sharded step, JSON-line logging (analog of
`TextLoggerHook`), per-epoch orbax checkpointing, optional eval hook.
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import jax
import numpy as np

from ..configs.fcaf3d import FCAF3DConfig
from ..data.loader import Loader
from ..parallel.mesh import data_mesh
from ..train.checkpoint import latest_epoch, restore_checkpoint, save_checkpoint
from ..train.optim import make_optimizer
from ..train.trainer import create_train_state, make_train_step


def train_model(
    cfg: FCAF3DConfig,
    loader: Loader,
    work_dir: str,
    seed: int = 0,
    log_interval: int = 50,
    eval_hook: Optional[Callable] = None,
    resume: bool = False,
    load_from: Optional[str] = None,
    use_mesh: bool = True,
    classes: Optional[tuple] = None,
):
    """Train FCAF3D for `cfg.max_epochs` epochs; returns final TrainState.

    `classes` (when given) is embedded with the config snapshot in
    `ckpts/meta.json` so test-time tools can recover them from the work
    dir alone (the reference's checkpoint `meta` CLASSES+config embed,
    `tools/train.py:199-209`)."""
    import dataclasses

    from ..train.checkpoint import save_meta

    os.makedirs(work_dir, exist_ok=True)
    save_meta(work_dir, {
        "classes": list(classes) if classes is not None else None,
        "config": dataclasses.asdict(cfg),
        "config_class": type(cfg).__name__,
        "seed": seed,
    })
    log_path = os.path.join(work_dir, "train_log.jsonl")
    steps_per_epoch = loader.steps_per_epoch()

    tx = make_optimizer(
        lr=cfg.lr,
        weight_decay=cfg.weight_decay,
        grad_clip=cfg.grad_clip,
        steps_per_epoch=steps_per_epoch,
        lr_steps=cfg.lr_steps,
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(seed), tx)
    mesh = data_mesh() if use_mesh and len(jax.devices()) > 1 else None
    step_fn = make_train_step(model, cfg, tx, mesh=mesh)

    start_epoch = 0
    if load_from and not resume:
        # weights-only init from another run's work dir (`load_from`
        # semantics, reference `configs/fcaf3d/fcaf3d.py:38` +
        # `README.md:84` ScanNet-pretrained S3DIS recipe); shape-mismatched
        # heads keep their fresh init
        from ..train.checkpoint import load_params

        state = load_params(load_from, state)
        print(f"loaded weights from {load_from}")
    if resume:
        ep = latest_epoch(work_dir)
        if ep is not None:
            state, ep = restore_checkpoint(work_dir, state)
            start_epoch = ep
            print(f"resumed from epoch {ep}")

    def log(record):
        with open(log_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    for epoch in range(start_epoch, cfg.max_epochs):
        t_epoch = time.time()
        window = []
        for i, batch in enumerate(loader.epoch(epoch)):
            t0 = time.time()
            state, metrics = step_fn(state, batch)
            if (i + 1) % log_interval == 0 or i + 1 == steps_per_epoch:
                metrics = {k: float(v) for k, v in metrics.items()}
                window.append(time.time() - t0)
                rec = {
                    "epoch": epoch + 1,
                    "iter": i + 1,
                    "total": steps_per_epoch,
                    "time": round(np.mean(window), 3),
                    **{k: round(v, 4) for k, v in metrics.items()},
                }
                print(
                    f"Epoch [{rec['epoch']}/{cfg.max_epochs}]"
                    f"[{rec['iter']}/{steps_per_epoch}] "
                    + " ".join(f"{k}: {v}" for k, v in rec.items() if "loss" in k)
                )
                log(rec)
            else:
                window.append(time.time() - t0)
        save_checkpoint(work_dir, epoch + 1, state)
        log({"epoch": epoch + 1, "epoch_time": round(time.time() - t_epoch, 1)})
        if eval_hook is not None:
            metrics = eval_hook(model, state, epoch + 1)
            log({"epoch": epoch + 1, "eval": metrics})
    return model, state
