"""End-to-end API tests: train_model loop + checkpoint resume + evaluation."""
import os
import pickle

import numpy as np
import pytest

from fcaf3d_tpu.configs import fcaf3d_tiny

pytestmark = pytest.mark.slow  # model/engine compile-heavy (two-lane suite)


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
    show = tmp_path / "show"
    metrics = evaluate_dataset(model, variables, val, cfg, batch_size=2,
                               show_dir=str(show))
    assert "mAP_0.25" in metrics and "mAP_0.50" in metrics
    assert 0.0 <= metrics["mAP_0.25"] <= 1.0
    # --show-dir analog dumped per-scene .obj wireframes
    dumped = list(show.glob("scene_*"))
    assert dumped, "show_dir produced no scene dumps"


def test_tta_aug_test_merges_flips():
    """aug_test path: 4-way flip TTA produces valid merged detections, and
    each aug's inverted boxes coincide for a flip-symmetric model input."""
    import dataclasses

    import jax

    import jax.numpy as jnp

    from fcaf3d_tpu.apis.test import FLIP_TTA, aug_test_batch
    from fcaf3d_tpu.configs import fcaf3d_tiny
    from fcaf3d_tpu.models import FCAF3D, fcaf3d_get_bboxes, infer_config

    cfg = fcaf3d_tiny()
    rng = np.random.RandomState(0)
    b, p = 1, cfg.num_points
    pts = rng.uniform(-1.0, 1.0, (b, p, 3)).astype(np.float32)
    cols = rng.uniform(0, 255, (b, p, 3)).astype(np.float32)
    valid = np.ones((b, p), bool)
    batch = {"points": pts, "colors": cols, "valid": valid}

    model = FCAF3D(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(cols),
        jnp.asarray(valid))
    tcfg = infer_config(cfg)

    @jax.jit
    def run(v, a, c, m):
        return fcaf3d_get_bboxes(model.apply(v, a, c, m, train=False), tcfg)

    dt = aug_test_batch(run, variables, batch, cfg, FLIP_TTA, rotated=False)
    assert len(dt) == 1
    assert np.isfinite(dt[0]["boxes_3d"]).all()
    # merged output must not exceed the concatenated candidate count
    assert dt[0]["boxes_3d"].shape[0] <= 4 * cfg.nms_pre

    # TTA with ONLY the identity aug must equal the plain forward
    dt_id = aug_test_batch(run, variables, batch, cfg, ({},), rotated=False)
    dets = run(variables, jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid))
    keep = np.asarray(dets.valid[0])
    got = np.sort(dt_id[0]["scores_3d"])
    exp = np.sort(np.asarray(dets.scores[0])[keep])
    # identity-aug TTA re-runs NMS on the already-NMSed set; scores survive
    assert got.shape[0] <= exp.shape[0] + 1
    if got.shape[0] and exp.shape[0]:
        assert abs(got[-1] - exp[-1]) < 1e-5


def test_sharded_eval_matches_single(mini_root):
    """Mesh-sharded evaluation (multi_gpu_test analog) == single-device."""
    import dataclasses

    import jax

    from fcaf3d_tpu.apis.test import evaluate_dataset, make_test_pipeline
    from fcaf3d_tpu.data import Compose, IndoorDetDataset, PointSample
    from fcaf3d_tpu.models import FCAF3D
    from fcaf3d_tpu.parallel.mesh import data_mesh

    cfg = dataclasses.replace(fcaf3d_tiny(), num_points=256)
    ds = IndoorDetDataset(
        str(mini_root), str(mini_root / "infos.pkl"),
        classes=("a", "b", "c", "d"),
        pipeline=Compose([PointSample(cfg.num_points)]),
        test_mode=True,
    )
    import jax.numpy as jnp

    model = FCAF3D(cfg)
    z = jnp.zeros((1, cfg.num_points, 3))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), z, z, jnp.ones((1, cfg.num_points), bool))

    single = evaluate_dataset(model, variables, ds, cfg, batch_size=2)
    mesh = data_mesh(jax.devices()[:2])
    sharded = evaluate_dataset(
        model, variables, ds, cfg, batch_size=2, mesh=mesh)
    for k in single:
        assert abs(single[k] - sharded[k]) < 1e-6, k
    # odd scene count exercises the pad-last-batch path
    sharded3 = evaluate_dataset(
        model, variables, ds, cfg, batch_size=2, mesh=mesh, max_scenes=3)
    assert set(sharded3) == set(single)


def test_fuse_conv_bn_preserves_inference():
    """Folding BN multiplies into conv kernels must leave the inference
    forward numerically unchanged (reference tools/misc/fuse_conv_bn.py)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from fcaf3d_tpu.configs import fcaf3d_tiny
    from fcaf3d_tpu.models import FCAF3D
    from fcaf3d_tpu.utils.fuse_bn import fuse_conv_bn

    cfg = dataclasses.replace(fcaf3d_tiny(), compute_dtype="float32")
    rng = np.random.RandomState(0)
    b, p = 1, cfg.num_points
    pts = jnp.asarray(rng.uniform(0, 2, (b, p, 3)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, 255, (b, p, 3)).astype(np.float32))
    valid = jnp.ones((b, p), bool)
    model = FCAF3D(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts, cols, valid)
    # make BN stats non-trivial so the fold actually moves numbers
    import jax.tree_util as jtu

    def perturb(path, v):
        name = "/".join(str(p) for p in path)
        if "batch_stats" in name and "mean" in name:
            return v + 0.3
        if "batch_stats" in name and "var" in name:
            return v * 1.7
        if "scale" in name:
            return v * 1.2
        return v
    variables = jtu.tree_map_with_path(perturb, variables)

    fused, n = fuse_conv_bn(variables)
    assert n >= 10  # all block/neck conv+BN pairs found

    out_ref = jax.jit(lambda v: model.apply(v, pts, cols, valid, train=False))(variables)
    out_fused = jax.jit(lambda v: model.apply(v, pts, cols, valid, train=False))(fused)
    for a, b_ in zip(jax.tree_util.tree_leaves(out_ref),
                     jax.tree_util.tree_leaves(out_fused)):
        if jnp.issubdtype(a.dtype, jnp.floating):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-4)
