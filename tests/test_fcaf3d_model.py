"""FCAF3D end-to-end smoke tests on tiny synthetic scenes (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcaf3d_tpu.configs import fcaf3d_tiny
from fcaf3d_tpu.models import (
    FCAF3D,
    fcaf3d_get_bboxes,
    fcaf3d_loss,
    loss_config,
    infer_config,
)
from fcaf3d_tpu.models.assigner import fcaf3d_assign
from fcaf3d_tpu.models.fcaf3d_head import bbox_pred_to_bbox

pytestmark = pytest.mark.slow  # model/engine compile-heavy (two-lane suite)


def synth_batch(rng, b=2, p=512, n_classes=4, g=8):
    pts = rng.uniform(0, 2.0, (b, p, 3)).astype(np.float32)
    colors = rng.uniform(0, 255, (b, p, 3)).astype(np.float32)
    valid = np.ones((b, p), bool)
    valid[:, -32:] = False
    boxes = np.zeros((b, g, 7), np.float32)
    boxes[..., :3] = rng.uniform(0.4, 1.6, (b, g, 3))
    boxes[..., 2] = 0.0
    boxes[..., 3:6] = rng.uniform(0.3, 0.8, (b, g, 3))
    labels = rng.randint(0, n_classes, (b, g)).astype(np.int32)
    gt_valid = np.ones((b, g), bool)
    gt_valid[:, -2:] = False
    return (
        jnp.asarray(pts),
        jnp.asarray(colors),
        jnp.asarray(valid),
        jnp.asarray(boxes),
        jnp.asarray(labels),
        jnp.asarray(gt_valid),
    )


@pytest.fixture(scope="module")
def model_and_outs():
    cfg = fcaf3d_tiny()
    rng = np.random.RandomState(0)
    pts, colors, valid, boxes, labels, gt_valid = synth_batch(rng)
    model = FCAF3D(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts, colors, valid)
    outs = jax.jit(model.apply)(variables, pts, colors, valid)
    return cfg, model, variables, outs, (pts, colors, valid, boxes, labels, gt_valid)


def test_forward_shapes(model_and_outs):
    cfg, _, _, outs, _ = model_and_outs
    assert len(outs) == cfg.n_outs
    for i, o in enumerate(outs):
        n = o.valid.shape[1]
        assert o.centerness.shape == (2, n, 1)
        assert o.bbox_pred.shape == (2, n, cfg.n_reg_outs)
        assert o.cls_scores.shape == (2, n, cfg.n_classes)
        assert o.points.shape == (2, n, 3)
        assert np.all(np.isfinite(np.asarray(o.points)))
        assert int(o.valid.sum()) > 0, f"level {i} has no valid voxels"
    # exp(reg distances) must be positive
    for o in outs:
        v = np.asarray(o.bbox_pred[..., :6])[np.asarray(o.valid)]
        assert np.all(v > 0)


def test_loss_finite_and_positive(model_and_outs):
    cfg, _, _, outs, data = model_and_outs
    _, _, _, boxes, labels, gt_valid = data
    losses = fcaf3d_loss(outs, boxes, labels, gt_valid, loss_config(cfg))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
        assert float(v) >= 0, k
    assert float(losses["loss_cls"]) > 0


def test_get_bboxes_shapes(model_and_outs):
    cfg, _, _, outs, _ = model_and_outs
    dets = fcaf3d_get_bboxes(outs, infer_config(cfg))
    b, d = dets.scores.shape
    assert b == 2
    assert dets.boxes.shape == (2, d, 7)
    assert dets.labels.shape == (2, d)
    kept = np.asarray(dets.valid)
    sc = np.asarray(dets.scores)
    assert np.all(sc[kept] > cfg.score_thr)
    assert np.all(np.isfinite(np.asarray(dets.boxes)))


def test_grads_finite(model_and_outs):
    cfg, model, variables, _, data = model_and_outs
    pts, colors, valid, boxes, labels, gt_valid = data

    def loss_fn(params):
        outs = model.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}},
                           pts, colors, valid, train=False)
        losses = fcaf3d_loss(outs, boxes, labels, gt_valid, loss_config(cfg))
        return losses["loss_cls"] + losses["loss_bbox"] + losses["loss_centerness"]

    g = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    # at least some gradients are nonzero
    total = sum(float(jnp.sum(jnp.abs(x))) for x in flat)
    assert total > 0


def test_assigner_basic():
    # one box containing a cluster of points at scale 0
    pts = jnp.asarray(
        np.concatenate(
            [
                np.random.RandomState(0).uniform(0.4, 0.6, (20, 3)),
                np.random.RandomState(1).uniform(5.0, 6.0, (20, 3)),
            ]
        ).astype(np.float32)
    )
    scales = jnp.zeros((40,), jnp.int32)
    valid = jnp.ones((40,), bool)
    gt = jnp.asarray([[0.5, 0.5, 0.3, 0.4, 0.4, 0.6, 0.0]], jnp.float32)
    gt_boxes = jnp.concatenate([gt, jnp.zeros((1, 7))], axis=0)
    gt_labels = jnp.asarray([2, 0], jnp.int32)
    gt_valid = jnp.asarray([True, False])
    res = fcaf3d_assign(pts, scales, valid, gt_boxes, gt_labels, gt_valid,
                        n_scales=1, limit=3, topk=6)
    labels = np.asarray(res.labels)
    # some of the first 20 points assigned to class 2, none of the far ones
    assert (labels[:20] == 2).sum() > 0
    assert (labels[:20] == 2).sum() <= 6  # topk cap
    assert np.all(labels[20:] == -1)
    pos = labels >= 0
    assert np.all(np.asarray(res.centerness)[pos] > 0)
    np.testing.assert_allclose(
        np.asarray(res.bbox_targets)[pos][:, 2], 0.6, atol=1e-6
    )  # gravity z = 0.3 + 0.6/2


def test_bbox_pred_to_bbox_modes():
    pts = jnp.asarray([[1.0, 2.0, 3.0]])
    # distances: x-,x+,y-,y+,z-,z+
    pred6 = jnp.asarray([[0.5, 0.5, 1.0, 1.0, 0.2, 0.4]])
    out = np.asarray(bbox_pred_to_bbox(pts, pred6))
    np.testing.assert_allclose(out[0], [1.0, 2.0, 3.1, 1.0, 2.0, 0.6], atol=1e-6)

    # fcaf3d mode with zero angle-channels -> q=1, square box
    pred8 = jnp.asarray([[0.5, 0.5, 1.0, 1.0, 0.2, 0.4, 0.0, 0.0]])
    out8 = np.asarray(bbox_pred_to_bbox(pts, pred8, "fcaf3d"))
    s = 3.0  # sum of 4 horizontal distances
    np.testing.assert_allclose(
        out8[0], [1.0, 2.0, 3.1, s / 2, s / 2, 0.6, 0.0], atol=1e-5
    )


def test_fast_variant_configs_forward():
    """First-class 2-/3-scale fast variants (`fcaf3d_2scales_scannet…py`,
    `fcaf3d_3scales_scannet…py`): truncated backbone + matching head."""
    import dataclasses

    from fcaf3d_tpu.configs import fcaf3d_scannet_2scales, fcaf3d_scannet_3scales

    c3 = fcaf3d_scannet_3scales()
    assert c3.n_outs == 3 and c3.voxel_size == 0.01
    c2 = fcaf3d_scannet_2scales()
    assert c2.n_outs == 2 and c2.voxel_size == 0.02
    assert len(c2.neck_budgets) == 2

    # tiny-budget 2-scale forward end to end
    tiny2 = dataclasses.replace(
        c2,
        n_classes=4,
        compute_dtype="float32",
        num_points=512,
        input_budget=512,
        backbone_budgets=(256, 128, 96, 48, 24, 12),
        neck_budgets=(96, 48),
        max_gt_boxes=8,
        nms_pre=32,
        nms_cap=32,
    )
    rng = np.random.RandomState(3)
    pts, colors, valid, *_ = synth_batch(rng)
    model = FCAF3D(tiny2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts, colors, valid)
    outs = jax.jit(model.apply)(variables, pts, colors, valid)
    assert len(outs) == 2
    dets = fcaf3d_get_bboxes(outs, infer_config(tiny2))
    assert np.all(np.isfinite(np.asarray(dets.boxes)))


def test_bottleneck_depth50_backbone():
    """Depth-50 Bottleneck backbone (reference `me_resnet.py:113-118`):
    expansion-4 outputs, end-to-end forward on tiny budgets."""
    import dataclasses

    from fcaf3d_tpu.models.me_resnet import MEResNet3D
    from fcaf3d_tpu.ops.sparse import voxelize

    rng = np.random.RandomState(5)
    pts, colors, valid, *_ = synth_batch(rng, b=1)
    st = jax.jit(lambda a, c, v: voxelize(a, c, v, 0.02, 512))(pts, colors, valid)
    bb = MEResNet3D(depth=50, n_outs=2, budgets=(256, 128, 96, 48, 24, 12))
    variables = jax.jit(bb.init)(jax.random.PRNGKey(0), st)
    outs = jax.jit(bb.apply)(variables, st)
    assert len(outs) == 2
    assert outs[0].num_channels == 64 * 4  # Bottleneck expansion
    assert outs[1].num_channels == 128 * 4
    for o in outs:
        assert np.all(np.isfinite(np.asarray(o.feats)))
