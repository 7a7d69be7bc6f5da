"""End-to-end API tests: train_model loop + checkpoint resume + evaluation."""
import os
import pickle

import numpy as np
import pytest

from fcaf3d_tpu.configs import fcaf3d_tiny


@pytest.fixture(scope="module")
def mini_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini")
    os.makedirs(root / "points", exist_ok=True)
    rng = np.random.RandomState(0)
    infos = []
    for i in range(4):
        n = 600
        pts = np.zeros((n, 6), np.float32)
        # cluster points inside boxes so training has signal
        boxes = np.zeros((2, 6), np.float32)
        boxes[:, :3] = rng.uniform(0.8, 1.6, (2, 3))
        boxes[:, 3:6] = rng.uniform(0.4, 0.7, (2, 3))
        half = n // 2
        for j, (lo, hi) in enumerate(((0, half), (half, n))):
            c, d = boxes[j, :3], boxes[j, 3:6]
            pts[lo:hi, :3] = rng.uniform(c - d / 2, c + d / 2, (hi - lo, 3))
        pts[:, 3:] = rng.uniform(0, 255, (n, 3))
        rel = f"points/{i:04d}.bin"
        pts.tofile(root / rel)
        infos.append(
            {
                "pts_path": rel,
                "annos": {
                    "gt_num": 2,
                    "gt_boxes_upright_depth": boxes,
                    "class": np.array([0, 1]),
                },
            }
        )
    with open(root / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)
    return root


def test_train_eval_checkpoint_roundtrip(mini_root, tmp_path):
    import dataclasses

    import jax

    from fcaf3d_tpu.apis.test import evaluate_dataset, make_test_pipeline
    from fcaf3d_tpu.apis.train import train_model
    from fcaf3d_tpu.data import Compose, IndoorDetDataset, Loader, PointSample
    from fcaf3d_tpu.train.checkpoint import latest_epoch, restore_checkpoint
    from fcaf3d_tpu.train.optim import make_optimizer
    from fcaf3d_tpu.train.trainer import create_train_state

    cfg = dataclasses.replace(fcaf3d_tiny(), max_epochs=2, batch_size=2, num_points=256)
    pipe = Compose([PointSample(cfg.num_points)])
    ds = IndoorDetDataset(
        str(mini_root), str(mini_root / "infos.pkl"), classes=("a", "b", "c", "d"),
        pipeline=pipe,
    )
    loader = Loader(ds, cfg.batch_size, cfg.num_points, cfg.max_gt_boxes, num_workers=2)
    work_dir = str(tmp_path / "run")

    model, state = train_model(
        cfg, loader, work_dir, log_interval=1, use_mesh=False
    )
    assert int(state.step) == cfg.max_epochs * loader.steps_per_epoch()
    assert latest_epoch(work_dir) == 2
    assert os.path.exists(os.path.join(work_dir, "train_log.jsonl"))

    # restore round-trips exactly
    tx = make_optimizer()
    _, fresh = create_train_state(cfg, jax.random.PRNGKey(0), tx)
    restored, ep = restore_checkpoint(work_dir, fresh)
    assert ep == 2
    leaf0 = jax.tree_util.tree_leaves(state.params)[0]
    leaf1 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(leaf0), np.asarray(leaf1))

    # evaluation runs and produces the mAP keys
    val = IndoorDetDataset(
        str(mini_root), str(mini_root / "infos.pkl"), classes=("a", "b", "c", "d"),
        pipeline=make_test_pipeline(cfg, align=False), test_mode=True,
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    metrics = evaluate_dataset(model, variables, val, cfg, batch_size=2)
    assert "mAP_0.25" in metrics and "mAP_0.50" in metrics
    assert 0.0 <= metrics["mAP_0.25"] <= 1.0
