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

pytestmark = pytest.mark.slow  # model/engine compile-heavy (two-lane suite)

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


def test_load_params_shape_tolerant_transfer(tmp_path):
    """`load_from` semantics: transfer a 4-class checkpoint into a 3-class
    model (the ScanNet-pretrained S3DIS recipe, reference `README.md:84` +
    mmcv `load_checkpoint(strict=False)`): matching leaves are copied,
    the shape-mismatched cls conv keeps its fresh init."""
    import jax
    import jax.numpy as jnp

    from fcaf3d_tpu.train.checkpoint import load_params, save_checkpoint
    from fcaf3d_tpu.train.optim import make_optimizer
    from fcaf3d_tpu.train.trainer import create_train_state

    tx = make_optimizer(lr=1e-3, weight_decay=1e-4, grad_clip=10.0,
                        steps_per_epoch=2, lr_steps=(8, 11))
    cfg4 = fcaf3d_tiny(n_classes=4)
    _, state4 = create_train_state(cfg4, jax.random.PRNGKey(0), tx)
    # make source params recognizable
    state4 = state4.replace(
        params=jax.tree.map(lambda x: jnp.full_like(x, 0.25), state4.params))
    save_checkpoint(str(tmp_path), 1, state4)

    cfg3 = fcaf3d_tiny(n_classes=3)
    _, state3 = create_train_state(cfg3, jax.random.PRNGKey(1), tx)
    fresh_cls = state3.params["neck_with_head"]["cls_conv"]["kernel"]
    merged = load_params(str(tmp_path), state3)
    # backbone leaf transferred
    bb = merged.params["backbone"]["conv1"]["kernel"]
    assert float(jnp.max(jnp.abs(bb - 0.25))) == 0.0
    # cls conv shape differs (4 vs 3 classes) -> fresh init kept
    got_cls = merged.params["neck_with_head"]["cls_conv"]["kernel"]
    assert got_cls.shape == fresh_cls.shape
    np.testing.assert_array_equal(np.asarray(got_cls), np.asarray(fresh_cls))


@pytest.mark.slow
def test_load_from_scannet_pretrained_to_s3dis(tmp_path):
    """The reference's S3DIS recipe trains from a ScanNet-pretrained
    checkpoint (`README.md:84`). End to end at the REAL configs: save a
    fcaf3d_scannet (18-class) state, `load_params` it into a fcaf3d_s3dis
    (5-class) state — every shape-matched leaf transfers (backbone + neck
    + reg/centerness heads), the class-dependent cls conv/bias keep fresh
    init, and the merged state drives a train step config-compatibly."""
    import jax
    import jax.numpy as jnp

    from fcaf3d_tpu.configs import fcaf3d_s3dis, fcaf3d_scannet
    from fcaf3d_tpu.train.checkpoint import load_params, save_checkpoint
    from fcaf3d_tpu.train.optim import make_optimizer
    from fcaf3d_tpu.train.trainer import create_train_state

    tx = make_optimizer(lr=1e-3, weight_decay=1e-4, grad_clip=10.0,
                        steps_per_epoch=2, lr_steps=(8, 11))
    cfg_src = fcaf3d_scannet()
    _, st_src = create_train_state(cfg_src, jax.random.PRNGKey(0), tx)
    st_src = st_src.replace(
        params=jax.tree.map(lambda x: jnp.full_like(x, 0.125), st_src.params))
    save_checkpoint(str(tmp_path), 12, st_src)

    cfg_dst = fcaf3d_s3dis()
    assert cfg_dst.n_classes != cfg_src.n_classes
    _, st_dst = create_train_state(cfg_dst, jax.random.PRNGKey(1), tx)
    fresh_cls = np.asarray(
        st_dst.params["neck_with_head"]["cls_conv"]["kernel"])
    merged = load_params(str(tmp_path), st_dst)

    # backbone + shared head convs transferred wholesale
    for path in (("backbone", "conv1", "kernel"),
                 ("neck_with_head", "reg_conv", "kernel"),
                 ("neck_with_head", "centerness_conv", "kernel")):
        leaf = merged.params
        for k in path:
            leaf = leaf[k]
        assert float(jnp.max(jnp.abs(leaf - 0.125))) == 0.0, path
    # cls conv depends on n_classes -> fresh init kept
    got = np.asarray(merged.params["neck_with_head"]["cls_conv"]["kernel"])
    np.testing.assert_array_equal(got, fresh_cls)
