"""ImVoteNet stage-2 sensitivity to 2D quality (the reference's ablation
axis: its +3 mAP@0.5 over VoteNet rides on the image branch).

Trains a tiny ImVoteNet on the real SUN RGB-D fixture scene (cloud
re-densified from the real GT boxes; real image + calib K) twice —
with ground-truth 2D boxes vs with NO 2D boxes — and measures the IMG
tower's mAP@0.25. The img tower sees only image-derived cues
(`imvotenet.py` tower ablation), so its accuracy is a direct probe of how
2D quality gates the fused detector: with GT boxes the geometric/semantic
cues localize objects; with none the cue tensor is zeros.
"""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fcaf3d_tpu.core.eval import indoor_eval
from fcaf3d_tpu.data.synth import densify
from fcaf3d_tpu.models.imvotenet import ImVoteNet, imvotenet_loss
from fcaf3d_tpu.models.votenet import votenet_get_bboxes

REF = "/root/reference/tests/data/sunrgbd"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)]

IMG_HW = (96, 128)
N_POINTS = 1024


def load_fixture_scene():
    from PIL import Image

    with open(os.path.join(REF, "sunrgbd_infos.pkl"), "rb") as f:
        info = pickle.load(f)[0]
    annos = info["annos"]
    boxes3d = annos["gt_boxes_upright_depth"].astype(np.float32)
    labels = annos["class"].astype(np.int32)
    # bottom-centered box7 (gt_boxes_upright_depth is gravity-centered z)
    boxes = boxes3d.copy()
    boxes[:, 2] -= boxes[:, 5] / 2.0
    rng = np.random.default_rng(0)
    scene = densify({"gt_boxes": boxes, "gt_labels": labels},
                    pts_per_box=256, n_floor=256, rng=rng)
    pts = scene["points"][:, :3]
    im = Image.open(os.path.join(
        REF, "sunrgbd_trainval", info["image"]["image_path"])).convert("RGB")
    w0, h0 = im.size
    img = np.asarray(im.resize((IMG_HW[1], IMG_HW[0])), np.float32)
    sx, sy = IMG_HW[1] / w0, IMG_HW[0] / h0
    from fcaf3d_tpu.data.datasets import sunrgbd_depth2img

    k = sunrgbd_depth2img(info["calib"], sx, sy)
    gt2d = annos["bbox"].astype(np.float32) * np.asarray(
        [sx, sy, sx, sy], np.float32)
    return pts, img, k, boxes, labels, gt2d


def run_case(use_gt_2d: bool, steps: int = 300):
    pts, img, k, boxes, labels, gt2d = load_fixture_scene()
    rng = np.random.default_rng(1)
    sel = rng.choice(len(pts), N_POINTS, replace=len(pts) < N_POINTS)
    cloud = pts[sel].astype(np.float32)
    # xyz + height feature (ShiftHeight analog, flat floor at z min)
    height = (cloud[:, 2] - cloud[:, 2].min())[:, None]
    cloud = np.concatenate([cloud, height], axis=1)

    d = 8  # 2D box slots
    boxes2d = np.zeros((1, d, 6), np.float32)
    valid2d = np.zeros((1, d), bool)
    if use_gt_2d:
        n = min(d, len(gt2d))
        boxes2d[0, :n, :4] = gt2d[:n]
        boxes2d[0, :n, 4] = 1.0
        boxes2d[0, :n, 5] = labels[:n]
        valid2d[0, :n] = True

    model = ImVoteNet(
        n_classes=10, num_proposal=32, num_sampled_seed=128, max_imvote=3,
        backbone_num_points=(128, 64, 32, 16),
    )
    jpts = jnp.asarray(cloud[None])
    jimg = jnp.asarray(img[None])
    jb2 = jnp.asarray(boxes2d)
    jv2 = jnp.asarray(valid2d)
    jk = jnp.asarray(k[None])
    init = jax.jit(lambda key: model.init(
        key, jpts, jimg, jb2, jv2, depth2img=jk, train=False))
    variables = init(jax.random.PRNGKey(0))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    gt_boxes = jnp.asarray(boxes[None])
    gt_labels = jnp.asarray(labels[None].astype(np.int32))
    gt_valid = jnp.ones((1, len(boxes)), bool)

    def loss_fn(p, stats):
        outs, mut = model.apply(
            {"params": p, "batch_stats": stats}, jpts, jimg, jb2, jv2,
            depth2img=jk, train=True, mutable=["batch_stats"])
        losses = imvotenet_loss(
            outs, jpts, gt_boxes, gt_labels, gt_valid, n_classes=10)
        return sum(losses.values()), mut.get("batch_stats", {})

    @jax.jit
    def train_step(p, stats, opt):
        (total, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, stats)
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), new_stats, opt, total

    infer = jax.jit(lambda v: model.apply(
        v, jpts, jimg, jb2, jv2, depth2img=jk, train=False,
        sample_mod="seed"))

    def eval_map(params, stats):
        outs = infer({"params": params, "batch_stats": stats})
        dets = votenet_get_bboxes(
            outs["img"], jpts, n_classes=10, score_thr=0.01)
        keep = np.asarray(dets.valid[0])
        dt = [{
            "boxes_3d": np.asarray(dets.boxes[0])[keep],
            "scores_3d": np.asarray(dets.scores[0])[keep],
            "labels_3d": np.asarray(dets.labels[0])[keep],
        }]
        gt = [{"gt_boxes_3d": boxes, "gt_labels_3d": labels}]
        m = indoor_eval(gt, dt, (0.25,), {i: str(i) for i in range(10)})
        return m["mAP_0.25"]

    best = 0.0
    for i in range(steps):
        params, stats, opt, total = train_step(params, stats, opt)
        if (i + 1) % 100 == 0:
            best = max(best, eval_map(params, stats))
    return best, float(total)


def test_img_tower_gated_by_2d_quality():
    map_gt, loss_gt = run_case(use_gt_2d=True)
    map_none, loss_none = run_case(use_gt_2d=False)
    print(f"[imvotenet sensitivity] img-tower mAP@0.25: "
          f"GT-2D={map_gt:.4f} vs no-2D={map_none:.4f} "
          f"(losses {loss_gt:.3f} / {loss_none:.3f})")
    # image cues must carry signal: the img tower with GT 2D boxes beats
    # the same tower trained with an empty 2D detector
    assert map_gt > map_none + 0.1, (map_gt, map_none)
