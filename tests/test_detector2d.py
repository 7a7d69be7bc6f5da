"""ImVoteNet stage-1 2D detector: targets, loss, NMS, end-to-end wiring."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcaf3d_tpu.models.detector2d import (
    Detector2D,
    detector2d_get_bboxes,
    detector2d_loss,
    extract_bboxes_2d,
    fcos_targets,
    nms_2d,
)

pytestmark = pytest.mark.slow  # model/engine compile-heavy (two-lane suite)


def synth(rng, b=1, hw=(96, 128), g=3, n_classes=4):
    imgs = rng.uniform(0, 255, (b, hw[0], hw[1], 3)).astype(np.float32)
    boxes = np.zeros((b, g, 4), np.float32)
    for i in range(b):
        for j in range(g):
            x1, y1 = rng.uniform(0, hw[1] - 40), rng.uniform(0, hw[0] - 40)
            w, h = rng.uniform(16, 40), rng.uniform(16, 40)
            boxes[i, j] = [x1, y1, min(x1 + w, hw[1]), min(y1 + h, hw[0])]
        # paint the boxes so there is signal
        for j in range(g):
            x1, y1, x2, y2 = boxes[i, j].astype(int)
            imgs[i, y1:y2, x1:x2] = (j + 1) * 60.0
    labels = rng.randint(0, n_classes, (b, g)).astype(np.int32)
    valid = np.ones((b, g), bool)
    return (jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(labels),
            jnp.asarray(valid))


@pytest.fixture(scope="module")
def setup2d():
    rng = np.random.RandomState(0)
    imgs, boxes, labels, valid = synth(rng)
    model = Detector2D(n_classes=4, width=16, fpn_ch=32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), imgs)
    outs = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, imgs)
    return model, variables, outs, (imgs, boxes, labels, valid)


def test_forward_shapes(setup2d):
    model, _, outs, (imgs, *_) = setup2d
    assert len(outs) == 3
    h, w = imgs.shape[1:3]
    for lvl, o in enumerate(outs):
        s = (8, 16, 32)[lvl]
        assert o["cls"].shape == (1, h // s, w // s, 4)
        assert o["reg"].shape == (1, h // s, w // s, 4)
        assert np.all(np.asarray(o["reg"]) > 0)  # exp-decoded distances


def test_fcos_targets(setup2d):
    _, _, outs, (_, boxes, labels, valid) = setup2d
    ts = fcos_targets(outs, boxes, labels, valid)
    n_pos = sum(int(jnp.sum(t["pos"])) for t in ts)
    assert n_pos > 0
    for t in ts:
        lab = np.asarray(t["labels"])
        pos = np.asarray(t["pos"])
        assert np.all(lab[pos] >= 0) and np.all(lab[~pos] == -1)
        ctr = np.asarray(t["ctr"])[pos]
        assert np.all((ctr >= 0) & (ctr <= 1 + 1e-5))


def test_loss_and_grads_decrease(setup2d):
    model, variables, _, (imgs, boxes, labels, valid) = setup2d
    import optax

    tx = optax.adam(3e-3)

    def loss_fn(params, stats):
        outs, mut = model.apply(
            {"params": params, "batch_stats": stats}, imgs, train=True,
            mutable=["batch_stats"])
        losses = detector2d_loss(outs, boxes, labels, valid)
        return sum(losses.values()), (losses, mut.get("batch_stats", {}))

    params, stats = variables["params"], variables.get("batch_stats", {})
    opt = tx.init(params)

    @jax.jit
    def train_step(params, stats, opt):
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, stats)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_stats, opt, total

    first = None
    for i in range(20):
        params, stats, opt, total = train_step(params, stats, opt)
        if first is None:
            first = float(total)
    assert np.isfinite(float(total))
    assert float(total) < first


def test_nms_2d():
    boxes = jnp.asarray([
        [0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 10, 10],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.1])
    valid = jnp.asarray([True, True, True, False])
    keep = np.asarray(nms_2d(boxes, scores, valid, 0.5))
    assert keep.tolist() == [True, False, True, False]


def test_extract_and_imvotenet_wiring(setup2d):
    """extract_bboxes_2d output drives the ImVoteNet stage-2 forward —
    the full two-stage path without externally supplied boxes."""
    model, variables, _, (imgs, *_)= setup2d
    boxes2d, valid2d = extract_bboxes_2d(
        model, variables, imgs, rng=jax.random.PRNGKey(1), train=True,
        topk=16, max_det=8, score_thr=0.0)
    assert boxes2d.shape == (1, 8, 6)
    assert np.isfinite(np.asarray(boxes2d)).all()

    from fcaf3d_tpu.models.imvotenet import ImVoteNet

    rng = np.random.RandomState(1)
    s = 256
    pts = jnp.asarray(rng.uniform(0, 3, (1, s * 4, 4)).astype(np.float32))
    img_np = jnp.asarray(np.asarray(imgs[0]))
    calib = jnp.eye(3)[None] * jnp.asarray([[200.0, 200.0, 1.0]])
    net = ImVoteNet(
        n_classes=4, num_proposal=16,
        backbone_num_points=(128, 64, 32, 16), num_sampled_seed=64,
    )
    vs = jax.jit(lambda k, p, i, b, v, c: net.init(
        k, p, i, b, v, depth2img=c, train=False))(
        jax.random.PRNGKey(0), pts, img_np[None], boxes2d, valid2d, calib)
    preds = jax.jit(lambda vv, p, i, b, v, c: net.apply(
        vv, p, i, b, v, depth2img=c, train=False))(
        vs, pts, img_np[None], boxes2d, valid2d, calib)
    leaf = jax.tree_util.tree_leaves(preds)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaf
               if jnp.issubdtype(l.dtype, jnp.floating))
