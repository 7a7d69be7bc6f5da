"""2D-branch accuracy number: train Detector2D to overfit a small painted
synthetic set and measure VOC-style 2D mAP@0.5 through the full decode +
NMS path — the accuracy evidence the stage-1 image branch lacked
(the reference uses a COCO-pretrained Faster R-CNN it never evaluates
in-repo; ImVoteNet's +3 mAP@0.5 headline rides on 2D quality)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow

from fcaf3d_tpu.core.eval2d import eval_det_2d, iou_xyxy
from fcaf3d_tpu.models.detector2d import (
    Detector2D,
    detector2d_get_bboxes,
    detector2d_loss,
)
def synth_labeled(rng, b=4, hw=(96, 128), g=3, n_classes=4):
    """Painted boxes whose intensity encodes the LABEL (learnable classes;
    tests.test_detector2d.synth paints by box index, which makes the class
    unlearnable across images)."""
    imgs = rng.uniform(0, 20, (b, hw[0], hw[1], 3)).astype(np.float32)
    boxes = np.zeros((b, g, 4), np.float32)
    labels = rng.randint(0, n_classes, (b, g)).astype(np.int32)
    # non-overlapping grid cells so every box's appearance is unoccluded
    cells = [(0, 0), (0, 1), (1, 0), (1, 1)]
    ch, cw = hw[0] // 2, hw[1] // 2
    for i in range(b):
        for j in range(g):
            cy, cx = cells[j % 4]
            x1 = cx * cw + rng.uniform(2, 10)
            y1 = cy * ch + rng.uniform(2, 10)
            w, h = rng.uniform(20, cw - 14), rng.uniform(20, ch - 14)
            boxes[i, j] = [x1, y1, x1 + w, y1 + h]
            xa, ya, xb, yb = boxes[i, j].astype(int)
            imgs[i, ya:yb, xa:xb] = (labels[i, j] + 1) * 55.0
    valid = np.ones((b, g), bool)
    return (jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(labels),
            jnp.asarray(valid))


def test_iou_xyxy():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    got = iou_xyxy(a, b)[0]
    np.testing.assert_allclose(got, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_eval_det_2d_perfect_and_miss():
    gt = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]]),
           "labels": np.array([0, 1])}]
    dt_perfect = [{"boxes": gt[0]["boxes"], "scores": np.array([0.9, 0.8]),
                   "labels": gt[0]["labels"]}]
    m = eval_det_2d(gt, dt_perfect)
    assert m["mAP"] == 1.0
    dt_wrong = [{"boxes": np.array([[100, 100, 110, 110]]),
                 "scores": np.array([0.9]), "labels": np.array([0])}]
    m2 = eval_det_2d(gt, dt_wrong)
    assert m2["mAP"] == 0.0


def test_detector2d_overfit_2d_map():
    rng = np.random.RandomState(0)
    imgs, boxes, labels, valid = synth_labeled(rng, b=4, hw=(96, 128), g=3,
                                               n_classes=4)
    model = Detector2D(n_classes=4, width=16, fpn_ch=32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), imgs)
    tx = optax.adam(3e-3)

    def loss_fn(params, stats):
        outs, mut = model.apply(
            {"params": params, "batch_stats": stats}, imgs, train=True,
            mutable=["batch_stats"])
        losses = detector2d_loss(outs, boxes, labels, valid)
        return sum(losses.values()), mut.get("batch_stats", {})

    params, stats = variables["params"], variables.get("batch_stats", {})
    opt = tx.init(params)

    @jax.jit
    def train_step(params, stats, opt):
        (total, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, stats)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_stats, opt, total

    best = 0.0
    for i in range(400):
        params, stats, opt, total = train_step(params, stats, opt)
        if (i + 1) % 100 == 0:
            outs = jax.jit(
                lambda v, x: model.apply(v, x, train=False)
            )({"params": params, "batch_stats": stats}, imgs)
            dets = detector2d_get_bboxes(
                outs, 4, score_thr=0.05, image_hw=imgs.shape[1:3])
            dt, gt = [], []
            for j in range(imgs.shape[0]):
                keep = np.asarray(dets.valid[j])
                d = np.asarray(dets.boxes[j])[keep]
                dt.append({"boxes": d[:, :4], "scores": d[:, 4],
                           "labels": d[:, 5].astype(int)})
                gt.append({"boxes": np.asarray(boxes[j]),
                           "labels": np.asarray(labels[j])})
            m = eval_det_2d(gt, dt)
            best = max(best, m["mAP"])
            print(f"[2d overfit] step {i + 1}: loss={float(total):.4f} "
                  f"mAP@0.5={m['mAP']:.4f}")
            if best >= 0.99:
                break
    assert best >= 0.8, best
