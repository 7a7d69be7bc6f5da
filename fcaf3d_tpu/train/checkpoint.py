"""Orbax checkpointing: save/restore full train state + resume.

Replaces mmcv's `CheckpointHook` + `load_checkpoint`/`resume_from`
(reference `configs/fcaf3d/fcaf3d.py:36-39`, `tools/train.py:116-117`):
`epoch_N` directories under work_dir, a `latest` pointer, max_keep pruning,
and the `load` (weights only) vs `resume` (full state) distinction.
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp

from .trainer import TrainState


def _mngr(work_dir: str, max_keep: int = 1) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(os.path.join(work_dir, "ckpts")),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_keep, create=True),
    )


def save_meta(work_dir: str, meta: dict):
    """Embed run metadata next to the checkpoints (the reference stores
    CLASSES + the full config text in every .pth's `meta`,
    `tools/train.py:199-209`; here it is one `ckpts/meta.json`)."""
    import json

    path = os.path.join(work_dir, "ckpts")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_meta(work_dir: str) -> Optional[dict]:
    """Read back checkpoint metadata (classes/config), or None if absent
    (the reference's CLASSES-from-ckpt-meta path, `tools/test.py`)."""
    import json

    path = os.path.join(work_dir, "ckpts", "meta.json")
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)


def save_checkpoint(work_dir: str, epoch: int, state: TrainState, max_keep: int = 1):
    mngr = _mngr(work_dir, max_keep)
    mngr.save(epoch, args=ocp.args.StandardSave(state))
    mngr.wait_until_finished()
    mngr.close()


def latest_epoch(work_dir: str) -> Optional[int]:
    path = os.path.join(work_dir, "ckpts")
    if not os.path.isdir(path):
        return None
    mngr = _mngr(work_dir)
    step = mngr.latest_step()
    mngr.close()
    return step


def restore_checkpoint(
    work_dir: str, state: TrainState, epoch: Optional[int] = None
) -> Tuple[TrainState, int]:
    """Restore `state`-shaped checkpoint; returns (state, epoch)."""
    mngr = _mngr(work_dir)
    if epoch is None:
        epoch = mngr.latest_step()
    restored = mngr.restore(epoch, args=ocp.args.StandardRestore(state))
    mngr.close()
    return restored, int(epoch)


def load_params(work_dir: str, state: TrainState) -> TrainState:
    """Weights-only load (`load_from` semantics): params + batch_stats, fresh
    optimizer. Shape-tolerant like mmcv's `load_checkpoint(strict=False)`
    (`tools/train.py:116`): leaves whose path is absent or whose shape
    differs (e.g. the cls conv when transferring a ScanNet-trained backbone
    to S3DIS's 5 classes, reference `README.md:84`) keep their fresh init
    and are reported."""
    import jax

    mngr = _mngr(work_dir)
    step = mngr.latest_step()
    raw = mngr.restore(step)  # saved structure, no template
    mngr.close()

    def merge(tree, saved, prefix, skipped):
        if not isinstance(tree, dict):
            ok = (
                saved is not None
                and getattr(saved, "shape", None) == getattr(tree, "shape", None)
                and getattr(saved, "dtype", None) == getattr(tree, "dtype", None)
            )
            if not ok:
                skipped.append(prefix)
                return tree
            return jax.numpy.asarray(saved)
        out = {}
        for k, v in tree.items():
            sub = saved.get(k) if isinstance(saved, dict) else None
            out[k] = merge(v, sub, f"{prefix}/{k}", skipped)
        return out

    skipped: list = []
    new_params = merge(state.params, raw.get("params", {}), "params", skipped)
    new_stats = merge(
        state.batch_stats, raw.get("batch_stats", {}), "batch_stats", skipped
    )
    if skipped:
        print(f"load_params: kept fresh init for {len(skipped)} leaves "
              f"(shape/path mismatch): {', '.join(skipped[:8])}"
              + (" ..." if len(skipped) > 8 else ""))
    return state.replace(params=new_params, batch_stats=new_stats)
