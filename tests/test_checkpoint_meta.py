"""Checkpoint meta (CLASSES + config snapshot) and browse_dataset tests
(reference `tools/train.py:199-209` meta embed, `tools/misc/browse_dataset.py`)."""
import dataclasses
import os
import subprocess
import sys

import numpy as np
import pytest

from fcaf3d_tpu.configs import FCAF3DConfig, config_from_dict, fcaf3d_tiny
from fcaf3d_tpu.train.checkpoint import load_meta, save_meta

REF = "/root/reference/tests/data"


def test_meta_roundtrip_and_config_rebuild(tmp_path):
    cfg = fcaf3d_tiny()
    classes = ("bed", "chair", "table", "desk")
    save_meta(str(tmp_path), {
        "classes": list(classes),
        "config": dataclasses.asdict(cfg),
        "config_class": "FCAF3DConfig",
    })
    meta = load_meta(str(tmp_path))
    assert tuple(meta["classes"]) == classes
    rebuilt = config_from_dict(meta["config"])
    assert rebuilt == cfg  # tuples restored, frozen-dataclass equality
    assert isinstance(rebuilt.lr_steps, tuple)
    assert load_meta(str(tmp_path / "nope")) is None


def test_train_model_writes_meta(tmp_path):
    """train_model embeds meta.json usable to rebuild the exact config."""
    import jax

    from fcaf3d_tpu.apis.train import train_model
    from fcaf3d_tpu.data.loader import Loader
    from tests.test_fcaf3d_model import synth_batch

    cfg = dataclasses.replace(fcaf3d_tiny(), max_epochs=1, batch_size=2)

    class OneBatch:
        classes = ("a", "b", "c", "d")

        def __len__(self):
            return 2

        def __call__(self, i, rng):
            r = np.random.RandomState(i)
            pts, colors, valid, boxes, labels, gt_valid = synth_batch(r, b=1)
            return {
                "points": np.concatenate(
                    [pts[0], colors[0] * 255], axis=1),
                "gt_boxes": boxes[0],
                "gt_labels": labels[0],
            }

    loader = Loader(OneBatch(), cfg.batch_size, cfg.num_points,
                    cfg.max_gt_boxes, seed=0)
    train_model(cfg, loader, str(tmp_path), use_mesh=False,
                classes=OneBatch.classes)
    meta = load_meta(str(tmp_path))
    assert meta is not None
    assert tuple(meta["classes"]) == OneBatch.classes
    assert config_from_dict(meta["config"]) == cfg


@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference fixtures")
def test_browse_dataset_cli(tmp_path):
    """browse_dataset dumps points/gt .obj through the real train pipeline."""
    out = subprocess.run(
        [sys.executable, "tools/browse_dataset.py",
         "--dataset", "scannet", "--data-root", os.path.join(REF, "scannet"),
         "--out-dir", str(tmp_path), "--max-samples", "1"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    files = os.listdir(tmp_path)
    assert any(f.endswith("_points.obj") for f in files), files
    assert any(f.endswith("_gt.obj") for f in files), files
    gt = [f for f in files if f.endswith("_gt.obj")][0]
    lines = open(tmp_path / gt).read().splitlines()
    assert sum(l.startswith("v ") for l in lines) == 27 * 8  # 27 boxes
