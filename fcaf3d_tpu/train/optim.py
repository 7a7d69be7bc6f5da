"""Optimizer & LR schedule (optax), matching the reference recipe.

Reference: AdamW lr 1e-3, weight decay 1e-4, grad-clip max_norm 10, step LR
x0.1 at epochs [8, 11] of 12, no warmup
(`/root/reference/configs/fcaf3d/fcaf3d.py:30-33`).
"""
from __future__ import annotations

from typing import Sequence

import optax


def step_lr_schedule(
    base_lr: float, steps_per_epoch: int, lr_steps: Sequence[int], gamma: float = 0.1
):
    boundaries = {int(e * steps_per_epoch): gamma for e in lr_steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(
    lr: float = 1e-3,
    weight_decay: float = 1e-4,
    grad_clip: float = 10.0,
    steps_per_epoch: int = 1,
    lr_steps: Sequence[int] = (8, 11),
) -> optax.GradientTransformation:
    schedule = step_lr_schedule(lr, steps_per_epoch, lr_steps)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, weight_decay=weight_decay),
    )
