"""Training state + jitted data-parallel train/eval steps.

The reference delegates its loop to mmcv's `EpochBasedRunner` + DDP
(SURVEY.md §2.9); here the runner layer is native: a flax TrainState, a
pjit-sharded train step (batch split over the 'data' mesh axis, params
replicated, gradient reduction inserted by XLA), and orbax checkpointing
(see `fcaf3d_tpu.train.checkpoint`).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from ..configs.fcaf3d import FCAF3DConfig
from ..models.detector import FCAF3D, loss_config
from ..models.fcaf3d_head import fcaf3d_loss
from ..parallel.mesh import replicate, shard_batch


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(
    cfg: FCAF3DConfig, rng: jax.Array, tx: optax.GradientTransformation
) -> Tuple[FCAF3D, TrainState]:
    model = FCAF3D(cfg)
    b = 1
    pts = jnp.zeros((b, cfg.num_points, 3), jnp.float32)
    colors = jnp.zeros((b, cfg.num_points, cfg.in_channels), jnp.float32)
    valid = jnp.ones((b, cfg.num_points), bool)
    variables = jax.jit(model.init)(rng, pts, colors, valid)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return model, TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(
    model: FCAF3D,
    cfg: FCAF3DConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict]]:
    """Build the jitted train step. `batch` dict keys: points [B,P,3],
    colors [B,P,C], valid [B,P], gt_boxes [B,G,7], gt_labels [B,G],
    gt_valid [B,G]. With a mesh, batch arrays are sharded over 'data' and
    the state is replicated."""
    lcfg = loss_config(cfg)

    def step_fn(state: TrainState, batch):
        def loss_fn(params):
            outs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["points"],
                batch["colors"],
                batch["valid"],
                train=True,
                mutable=["batch_stats", "overflow"],
            )
            losses = fcaf3d_loss(
                outs, batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"], lcfg
            )
            total = losses["loss_cls"] + losses["loss_centerness"] + losses["loss_bbox"]
            overflow = mutated.get("overflow", {})
            return total, (losses, mutated["batch_stats"], overflow)

        (total, (losses, new_stats, overflow)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        # budget-overflow telemetry: voxels dropped by a too-small budget
        # anywhere in the cascade (the reference's dynamic maps never drop;
        # nonzero here means re-calibrate configs.*_budgets)
        drop_leaves = [
            jnp.max(x) for x in jax.tree_util.tree_leaves(overflow) if x is not None
        ]
        metrics["overflow_max"] = (
            jnp.max(jnp.stack(drop_leaves)) if drop_leaves
            else jnp.zeros((), jnp.int32)
        )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)
    rep = replicate(mesh)
    shard = shard_batch(mesh)
    batch_shardings = {
        "points": shard,
        "colors": shard,
        "valid": shard,
        "gt_boxes": shard,
        "gt_labels": shard,
        "gt_valid": shard,
    }
    return jax.jit(
        step_fn,
        in_shardings=(rep, batch_shardings),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )


def make_forward_fn(model: FCAF3D):
    """Jitted inference forward returning head outputs."""

    def fwd(variables, points, colors, valid):
        return model.apply(variables, points, colors, valid, train=False)

    return jax.jit(fwd)


def make_votenet_train_step(model, cfg, tx, mesh: Mesh = None):
    """Jitted VoteNet-v2 train step. `batch` keys: points [B, N, 3+F],
    gt_boxes [B, G, 7], gt_labels [B, G], gt_valid [B, G]."""
    from ..models.votenet import votenet_loss

    def step_fn(state, batch):
        def loss_fn(params):
            preds, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["points"],
                train=True,
                mutable=["batch_stats"],
            )
            losses = votenet_loss(
                preds, batch["points"], batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"], n_classes=cfg.n_classes,
                with_yaw=cfg.with_yaw, gt_per_seed=cfg.gt_per_seed,
            )
            total = sum(losses.values())
            return total, (losses, mutated["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in losses.items()}
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)
    rep = replicate(mesh)
    shard = shard_batch(mesh)
    shardings = {k: shard for k in ("points", "gt_boxes", "gt_labels", "gt_valid")}
    return jax.jit(
        step_fn, in_shardings=(rep, shardings), out_shardings=(rep, rep),
        donate_argnums=0,
    )


def make_votenet_v1_train_step(model, cfg, tx, mesh: Mesh = None):
    """Jitted bin-based VoteNet-v1 train step (same batch layout as v2;
    `model` must be a `VoteNetV1` so its coder drives targets/losses)."""
    from ..models.votenet_v1 import votenet_v1_loss

    def step_fn(state, batch):
        def loss_fn(params):
            preds, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["points"],
                train=True,
                mutable=["batch_stats"],
            )
            losses = votenet_v1_loss(
                preds, batch["points"], batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"], coder=model.coder, n_classes=cfg.n_classes,
                gt_per_seed=cfg.gt_per_seed,
            )
            total = sum(losses.values())
            return total, (losses, mutated["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in losses.items()}
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)
    rep = replicate(mesh)
    shard = shard_batch(mesh)
    shardings = {k: shard for k in ("points", "gt_boxes", "gt_labels", "gt_valid")}
    return jax.jit(
        step_fn, in_shardings=(rep, shardings), out_shardings=(rep, rep),
        donate_argnums=0,
    )
