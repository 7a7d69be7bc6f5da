"""VoteNet v1 (bin-based head + PartialBinBasedBBoxCoder) tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcaf3d_tpu.configs.votenet import votenet_tiny
from fcaf3d_tpu.models.votenet_v1 import (
    PartialBinBasedBBoxCoder,
    VoteNetV1,
    scannet_coder,
    sunrgbd_coder,
    votenet_v1_get_bboxes,
    votenet_v1_loss,
)

from test_votenet import synth

pytestmark = pytest.mark.slow  # model/engine compile-heavy (two-lane suite)


def tiny_coder(n_classes=4):
    return PartialBinBasedBBoxCoder(
        num_dir_bins=6,
        num_sizes=n_classes,
        mean_sizes=tuple((0.5 + 0.1 * i, 0.6, 0.7) for i in range(n_classes)),
        with_rot=True,
    )


def test_angle_bin_roundtrip():
    c = sunrgbd_coder()
    angles = jnp.asarray(np.linspace(-np.pi + 1e-3, np.pi - 1e-3, 50))
    cls, res = c.angle2class(angles)
    back = c.class2angle(cls, res)
    # equality modulo 2pi
    d = np.abs(((np.asarray(back - angles) + np.pi) % (2 * np.pi)) - np.pi)
    assert d.max() < 1e-5
    assert np.abs(np.asarray(res)).max() <= c.angle_per_class / 2 + 1e-6


def test_encode_decode_roundtrip_through_onehot():
    """encode(gt) fed back through decode as one-hot logits must return gt."""
    c = tiny_coder()
    rng = np.random.RandomState(0)
    g = 16
    boxes = np.zeros((1, g, 7), np.float32)
    boxes[..., :3] = rng.uniform(-2, 2, (1, g, 3))
    boxes[..., 3:6] = rng.uniform(0.3, 1.2, (1, g, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (1, g))
    labels = jnp.asarray(rng.randint(0, c.num_sizes, (1, g)).astype(np.int32))
    boxes = jnp.asarray(boxes)
    center, size_cls, size_res, dir_cls, dir_res = c.encode(boxes, labels)

    b_bins = c.num_dir_bins
    preds = {
        "center": center,
        "dir_class": jax.nn.one_hot(dir_cls, b_bins) * 10,
        "dir_res": jnp.tile(dir_res[..., None], (1, 1, b_bins)),
        "size_class": jax.nn.one_hot(size_cls, c.num_sizes) * 10,
        "size_res": jnp.tile(size_res[..., None, :], (1, 1, c.num_sizes, 1)),
    }
    out = c.decode(preds)
    np.testing.assert_allclose(np.asarray(out[..., :6]),
                               np.asarray(boxes[..., :6]), atol=1e-5)
    dyaw = np.abs(((np.asarray(out[..., 6] - boxes[..., 6]) + np.pi)
                   % (2 * np.pi)) - np.pi)
    assert dyaw.max() < 1e-5


@pytest.fixture(scope="module")
def setup_v1():
    cfg = votenet_tiny()
    coder = tiny_coder(cfg.n_classes)
    rng = np.random.RandomState(1)
    pts, boxes, labels, gt_valid = synth(rng, cfg)
    model = VoteNetV1(
        coder=coder,
        n_classes=cfg.n_classes,
        num_proposal=cfg.num_proposal,
        backbone_num_points=cfg.backbone_num_points,
    )
    variables = jax.jit(lambda k, p: model.init(k, p, train=False))(
        jax.random.PRNGKey(0), pts
    )
    preds = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, pts)
    return cfg, coder, model, variables, preds, (pts, boxes, labels, gt_valid)


def test_v1_forward_shapes(setup_v1):
    cfg, coder, _, _, preds, (pts, *_) = setup_v1
    b, p = pts.shape[0], cfg.num_proposal
    assert preds["bbox_preds"].shape == (b, p, 7)
    assert preds["dir_class"].shape == (b, p, coder.num_dir_bins)
    assert preds["size_res_norm"].shape == (b, p, coder.num_sizes, 3)
    assert np.all(np.isfinite(np.asarray(preds["bbox_preds"])))


def test_v1_loss_finite_and_grads(setup_v1):
    cfg, coder, model, variables, _, (pts, boxes, labels, gt_valid) = setup_v1

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params,
             **{k: v for k, v in variables.items() if k != "params"}},
            pts, train=True, mutable=["batch_stats"],
        )
        losses = votenet_v1_loss(
            preds, pts, boxes, labels, gt_valid, coder, cfg.n_classes)
        return sum(losses.values()), losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.sum(jnp.abs(l))) > 0 for l in leaves)


def test_v1_get_bboxes(setup_v1):
    cfg, _, _, _, preds, (pts, *_) = setup_v1
    dets = votenet_v1_get_bboxes(preds, pts, cfg.n_classes)
    assert dets.boxes.shape[-1] == 7
    assert np.all(np.isfinite(np.asarray(dets.boxes)))


def test_reference_coders():
    assert sunrgbd_coder().num_dir_bins == 12
    assert len(scannet_coder().mean_sizes) == 18
    assert not scannet_coder().with_rot
