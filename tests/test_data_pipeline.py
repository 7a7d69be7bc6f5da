"""Data pipeline tests on a synthetic mini-dataset in the reference layout."""
import os
import pickle

import numpy as np
import pytest

from fcaf3d_tpu.data import (
    Compose,
    GlobalAlignment,
    GlobalRotScaleTrans,
    IndoorDetDataset,
    Loader,
    PointSample,
    RandomFlip,
    RepeatDataset,
    collate,
)


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet")
    os.makedirs(root / "points", exist_ok=True)
    rng = np.random.RandomState(0)
    infos = []
    for i in range(3):
        n = 500 + i * 100
        pts = np.zeros((n, 6), np.float32)
        pts[:, :3] = rng.uniform(0, 4, (n, 3))
        pts[:, 3:] = rng.uniform(0, 255, (n, 3))
        rel = f"points/{i:04d}.bin"
        pts.tofile(root / rel)
        g = 2 + i
        boxes = np.zeros((g, 6), np.float32)
        boxes[:, :3] = rng.uniform(1, 3, (g, 3))
        boxes[:, 3:6] = rng.uniform(0.5, 1.0, (g, 3))
        infos.append(
            {
                "pts_path": rel,
                "annos": {
                    "gt_num": g,
                    "gt_boxes_upright_depth": boxes,
                    "class": rng.randint(0, 4, g),
                    "axis_align_matrix": np.eye(4, dtype=np.float32),
                },
            }
        )
    ann = root / "infos_train.pkl"
    with open(ann, "wb") as f:
        pickle.dump(infos, f)
    return str(root), str(ann)


def test_dataset_loads_and_converts_boxes(mini_dataset):
    root, ann = mini_dataset
    ds = IndoorDetDataset(root, ann, classes=("a", "b", "c", "d"))
    sample = ds(0, np.random.default_rng(0))
    assert sample["points"].shape[1] == 6
    boxes = sample["gt_boxes"]
    assert boxes.shape == (2, 7)
    # bottom center: z was gravity-centered in the info
    info_boxes = ds.data_infos[0]["annos"]["gt_boxes_upright_depth"]
    np.testing.assert_allclose(
        boxes[:, 2], info_boxes[:, 2] - info_boxes[:, 5] / 2, atol=1e-6
    )


def test_pipeline_deterministic(mini_dataset):
    root, ann = mini_dataset
    pipe = Compose(
        [
            GlobalAlignment(),
            PointSample(256),
            RandomFlip(0.5, 0.5),
            GlobalRotScaleTrans(),
        ]
    )
    ds = IndoorDetDataset(root, ann, classes=("a",) * 4, pipeline=pipe)
    s1 = ds(1, np.random.default_rng([7, 1]))
    s2 = ds(1, np.random.default_rng([7, 1]))
    np.testing.assert_array_equal(s1["points"], s2["points"])
    np.testing.assert_array_equal(s1["gt_boxes"], s2["gt_boxes"])
    assert s1["points"].shape == (256, 6)


def test_flip_consistency_points_and_boxes(mini_dataset):
    root, ann = mini_dataset
    ds = IndoorDetDataset(root, ann, classes=("a",) * 4)
    s = ds(0, np.random.default_rng(0))
    from fcaf3d_tpu.data.pipelines import _flip_points_boxes

    before_box = s["gt_boxes"].copy()
    before_pts = s["points"].copy()
    s = _flip_points_boxes(s, 0)
    np.testing.assert_allclose(s["points"][:, 0], -before_pts[:, 0])
    np.testing.assert_allclose(s["gt_boxes"][:, 0], -before_box[:, 0])
    np.testing.assert_allclose(s["gt_boxes"][:, 1], before_box[:, 1])


def test_rot_scale_trans_box_point_consistency(mini_dataset):
    """A point at a box's gravity center must stay at the center after aug."""
    root, ann = mini_dataset
    ds = IndoorDetDataset(root, ann, classes=("a",) * 4)
    s = ds(0, np.random.default_rng(3))
    center = s["gt_boxes"][0, :3].copy()
    center[2] += s["gt_boxes"][0, 5] / 2
    s["points"] = np.concatenate(
        [center[None], np.zeros((1, 3), np.float32)], axis=1
    )
    aug = GlobalRotScaleTrans((-0.5, 0.5), (0.8, 1.2), (0.1, 0.1, 0.1))
    s = aug(s, np.random.default_rng(5))
    new_center = s["gt_boxes"][0, :3].copy()
    new_center[2] += s["gt_boxes"][0, 5] / 2
    np.testing.assert_allclose(s["points"][0, :3], new_center, atol=1e-5)


def test_loader_batches(mini_dataset):
    root, ann = mini_dataset
    pipe = Compose([PointSample(128)])
    ds = RepeatDataset(
        IndoorDetDataset(root, ann, classes=("a",) * 4, pipeline=pipe), times=4
    )
    loader = Loader(ds, batch_size=4, num_points=128, max_gt=8, num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == 3  # 12 samples / 4
    b = batches[0]
    assert b["points"].shape == (4, 128, 3)
    assert b["colors"].shape == (4, 128, 3)
    assert b["gt_boxes"].shape == (4, 8, 7)
    assert b["valid"].all()
    assert b["gt_valid"].sum() > 0
    # determinism across constructions
    batches2 = list(Loader(ds, 4, 128, 8, num_workers=2).epoch(0))
    np.testing.assert_array_equal(batches[1]["points"], batches2[1]["points"])


def test_loader_multihost_sharding(mini_dataset):
    """Per-host shards tile the global batch exactly (same per-sample RNG),
    the multi-host analog of mmdet's per-rank sampler."""
    root, ann = mini_dataset
    pipe = Compose([PointSample(128)])
    ds = RepeatDataset(
        IndoorDetDataset(root, ann, classes=("a",) * 4, pipeline=pipe), times=4
    )
    full = list(Loader(ds, 4, 128, 8, num_workers=2).epoch(1))
    sh0 = list(Loader(ds, 4, 128, 8, num_workers=2,
                      shard_index=0, num_shards=2).epoch(1))
    sh1 = list(Loader(ds, 4, 128, 8, num_workers=2,
                      shard_index=1, num_shards=2).epoch(1))
    assert len(sh0) == len(full) and len(sh1) == len(full)
    for f, a, b in zip(full, sh0, sh1):
        assert a["points"].shape[0] == 2 and b["points"].shape[0] == 2
        np.testing.assert_array_equal(
            f["points"], np.concatenate([a["points"], b["points"]], axis=0))
        np.testing.assert_array_equal(
            f["gt_boxes"], np.concatenate([a["gt_boxes"], b["gt_boxes"]], axis=0))
    import pytest

    with pytest.raises(ValueError):
        Loader(ds, 4, 128, 8, num_shards=3)
