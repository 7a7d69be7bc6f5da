"""VoteNet-v2 smoke tests: forward shapes, loss finiteness/grads, NMS."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcaf3d_tpu.configs.votenet import votenet_tiny
from fcaf3d_tpu.models.votenet import (
    VoteNet,
    decode_vote_bbox,
    votenet_get_bboxes,
    votenet_loss,
    votenet_targets,
)

pytestmark = pytest.mark.slow  # model/engine compile-heavy (two-lane suite)


def synth(rng, cfg, b=2):
    p = cfg.num_points
    pts = np.zeros((b, p, 3 + cfg.in_feat_dims), np.float32)
    pts[..., :3] = rng.uniform(0, 3.0, (b, p, 3))
    pts[..., 3] = pts[..., 2] * 0.5  # fake height feature
    g = cfg.max_gt_boxes
    boxes = np.zeros((b, g, 7), np.float32)
    boxes[..., :3] = rng.uniform(0.5, 2.5, (b, g, 3))
    boxes[..., 2] = 0.0
    boxes[..., 3:6] = rng.uniform(0.4, 1.0, (b, g, 3))
    boxes[..., 6] = rng.uniform(-1, 1, (b, g))
    labels = rng.randint(0, cfg.n_classes, (b, g)).astype(np.int32)
    gt_valid = np.ones((b, g), bool)
    gt_valid[:, -3:] = False
    return (jnp.asarray(pts), jnp.asarray(boxes), jnp.asarray(labels),
            jnp.asarray(gt_valid))


@pytest.fixture(scope="module")
def setup():
    cfg = votenet_tiny()
    rng = np.random.RandomState(0)
    pts, boxes, labels, gt_valid = synth(rng, cfg)
    model = VoteNet(
        n_classes=cfg.n_classes,
        num_proposal=cfg.num_proposal,
        backbone_num_points=cfg.backbone_num_points,
    )
    variables = jax.jit(lambda k, p: model.init(k, p, train=False))(
        jax.random.PRNGKey(0), pts
    )
    preds = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, pts)
    return cfg, model, variables, preds, (pts, boxes, labels, gt_valid)


def test_votenet_forward_shapes(setup):
    cfg, _, _, preds, (pts, *_ ) = setup
    b = pts.shape[0]
    assert preds["bbox_preds"].shape == (b, cfg.num_proposal, 7)
    assert preds["obj_scores"].shape == (b, cfg.num_proposal, 2)
    assert preds["sem_scores"].shape == (b, cfg.num_proposal, cfg.n_classes)
    assert np.all(np.isfinite(np.asarray(preds["bbox_preds"])))
    # dims positive
    assert np.all(np.asarray(preds["bbox_preds"])[..., 3:6] > 0)


def test_votenet_targets(setup):
    cfg, _, _, preds, (pts, boxes, labels, gt_valid) = setup
    t = votenet_targets(pts[..., :3], boxes, labels, gt_valid,
                        preds["aggregated_points"])
    assert t.vote_mask.shape == pts.shape[:2]
    assert t.objectness.shape == (2, cfg.num_proposal)
    assert np.all((np.asarray(t.objectness) == 0) | (np.asarray(t.objectness) == 1))
    # points inside some box -> vote target points at its gravity center
    vm = np.asarray(t.vote_mask)
    assert vm.sum() > 0


def test_votenet_loss_and_grads(setup):
    cfg, model, variables, _, (pts, boxes, labels, gt_valid) = setup

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            pts, train=True, mutable=["batch_stats"],
        )
        losses = votenet_loss(preds, pts, boxes, labels, gt_valid,
                              n_classes=cfg.n_classes)
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0


def test_votenet_get_bboxes(setup):
    cfg, _, _, preds, (pts, *_rest) = setup
    dets = votenet_get_bboxes(preds, pts, cfg.n_classes,
                              nms_thr=cfg.nms_thr, score_thr=0.0)
    b, d = dets.scores.shape
    assert dets.boxes.shape == (b, d, 7)
    assert d == cfg.n_classes * cfg.num_proposal  # per-class proposals
    assert np.all(np.isfinite(np.asarray(dets.boxes)))


def test_decode_vote_bbox_mobius():
    agg = jnp.asarray([[0.0, 0.0, 0.0]])
    # ln scale = ln 2, ln h = 0, angle channels 0 -> q=1, square w=l=1
    pred = jnp.asarray([[0.1, 0.2, 0.3, np.log(2.0), 0.0, 0.0, 0.0]])
    out = np.asarray(decode_vote_bbox(agg, pred))
    np.testing.assert_allclose(out[0], [0.1, 0.2, 0.3, 1.0, 1.0, 1.0, 0.0], atol=1e-5)


def test_votenet_train_step_decreases_loss():
    import jax.numpy as jnp

    from fcaf3d_tpu.train.optim import make_optimizer
    from fcaf3d_tpu.train.trainer import TrainState, make_votenet_train_step

    cfg = votenet_tiny()
    rng = np.random.RandomState(1)
    pts, boxes, labels, gt_valid = synth(rng, cfg)
    model = VoteNet(
        n_classes=cfg.n_classes, num_proposal=cfg.num_proposal,
        backbone_num_points=cfg.backbone_num_points,
    )
    variables = jax.jit(lambda k, p: model.init(k, p, train=False))(
        jax.random.PRNGKey(0), pts)
    tx = make_optimizer(lr=1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    step = make_votenet_train_step(model, cfg, tx)
    batch = {"points": pts, "gt_boxes": boxes, "gt_labels": labels,
             "gt_valid": gt_valid}
    state, m0 = step(state, batch)
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    # tiny-synthetic VoteNet training is noisy (batch-2 BN, FPS sampling);
    # require improvement somewhere along the trajectory, not monotonicity
    assert min(losses) < float(m0["loss"])
    assert int(state.step) == 9
