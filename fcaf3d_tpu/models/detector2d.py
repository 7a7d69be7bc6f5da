"""Compact anchor-free 2D detector: ImVoteNet's stage-1 image branch.

The reference uses a frozen pretrained Faster R-CNN (ResNet50-caffe + FPN
+ RPN + RoI head, `/root/reference/configs/_base_/models/imvotenet_image.py`,
`mmdet3d/models/detectors/imvotenet.py:169-215,308-365`) purely as a 2D
box source for `VoteFusion`. A two-stage RoI pipeline is a poor fit for
XLA (dynamic proposal counts, RoIAlign); the TPU-native replacement is a
compact FCOS-style single-stage detector — anchor-free like FCAF3D itself,
static shapes end to end — trained on SUN RGB-D's 2D annotations (the
converter extracts `annos['bbox']`). Its `extract_bboxes_2d` emits exactly
the [D, 6] (x1, y1, x2, y2, conf, cls) interface `models/imvotenet.py`
consumes, including the reference's train-time random half-drop
(`imvotenet.py:349-354`).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LEVEL_STRIDES = (8, 16, 32)
# FCOS regression range limits per level (max l/t/r/b in pixels)
LEVEL_RANGES = ((0, 64), (64, 160), (160, 1e8))


def _gn(ch):
    """GroupNorm: no train/eval statistics gap. Detection-size batches make
    BatchNorm running averages diverge badly from batch statistics (the
    measured train-IoU-0.96 / eval-IoU-0.31 gap); the reference sidesteps
    this by FREEZING its 2D backbone's BN (`imvotenet.py:169-215` +
    caffe-norm config) — a from-scratch branch needs batch-independent
    normalization instead (FCOS heads use GroupNorm for the same reason)."""
    return nn.GroupNorm(num_groups=math.gcd(32, ch))


class ConvBNRelu(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False)(x)
        x = _gn(self.ch)(x)
        return nn.relu(x)


class ResBlock2D(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        r = x
        y = ConvBNRelu(self.ch, self.stride)(x, train)
        y = nn.Conv(self.ch, (3, 3), use_bias=False)(y)
        y = _gn(self.ch)(y)
        if self.stride != 1 or x.shape[-1] != self.ch:
            r = nn.Conv(self.ch, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False)(x)
            r = _gn(self.ch)(r)
        return nn.relu(y + r)


class Detector2D(nn.Module):
    """ResNet-lite + FPN + FCOS head. Input images [B, H, W, 3] float32
    (0-255, caffe-style mean handled internally); H, W multiples of 32."""

    n_classes: int = 10
    width: int = 64
    fpn_ch: int = 128

    @nn.compact
    def __call__(self, images, train: bool = False):
        x = (images - jnp.asarray([123.675, 116.28, 103.53])) / 58.0
        w = self.width
        x = ConvBNRelu(w // 2, 2, name="stem1")(x, train)  # /2
        x = ConvBNRelu(w // 2, 1, name="stem2")(x, train)
        c2 = ResBlock2D(w, 2, name="layer1")(x, train)  # /4
        c3 = ResBlock2D(w * 2, 2, name="layer2")(c2, train)  # /8
        c4 = ResBlock2D(w * 4, 2, name="layer3")(c3, train)  # /16
        c5 = ResBlock2D(w * 8, 2, name="layer4")(c4, train)  # /32

        # FPN top-down
        p5 = nn.Conv(self.fpn_ch, (1, 1), name="lat5")(c5)
        p4 = nn.Conv(self.fpn_ch, (1, 1), name="lat4")(c4) + jax.image.resize(
            p5, (p5.shape[0], c4.shape[1], c4.shape[2], self.fpn_ch), "nearest")
        p3 = nn.Conv(self.fpn_ch, (1, 1), name="lat3")(c3) + jax.image.resize(
            p4, (p4.shape[0], c3.shape[1], c3.shape[2], self.fpn_ch), "nearest")
        feats = [nn.Conv(self.fpn_ch, (3, 3), name=f"smooth{i}")(p)
                 for i, p in enumerate((p3, p4, p5))]

        # shared FCOS head
        cls_tower = [ConvBNRelu(self.fpn_ch, name=f"cls_tower{i}")
                     for i in range(2)]
        reg_tower = [ConvBNRelu(self.fpn_ch, name=f"reg_tower{i}")
                     for i in range(2)]
        cls_out = nn.Conv(
            self.n_classes, (3, 3), name="cls_pred",
            bias_init=nn.initializers.constant(-4.0))
        ctr_out = nn.Conv(1, (3, 3), name="ctr_pred")
        reg_out = nn.Conv(4, (3, 3), name="reg_pred")

        outs = []
        for lvl, f in enumerate(feats):
            c = f
            for t in cls_tower:
                c = t(c, train)
            r = f
            for t in reg_tower:
                r = t(r, train)
            scale = self.param(f"scale{lvl}", nn.initializers.ones, ())
            reg = jnp.exp(reg_out(r) * scale) * LEVEL_STRIDES[lvl]
            outs.append({
                "cls": cls_out(c),  # [B, h, w, C] logits
                "ctr": ctr_out(c)[..., 0],  # [B, h, w]
                "reg": reg,  # [B, h, w, 4] ltrb pixels
            })
        return outs


def level_points(h, w, stride):
    """Pixel-center coordinates [h, w, 2] of a stride-s level."""
    ys = (jnp.arange(h) + 0.5) * stride
    xs = (jnp.arange(w) + 0.5) * stride
    return jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # [h,w,2]


def fcos_targets(outs, gt_boxes, gt_labels, gt_valid):
    """FCOS target assignment (per-pixel: inside box + level range; min-area
    tie-break). gt_boxes [B, G, 4] xyxy; returns per-level dicts with
    labels [-1=bg], ltrb targets and centerness."""
    targets = []
    areas = (gt_boxes[..., 2] - gt_boxes[..., 0]) * (
        gt_boxes[..., 3] - gt_boxes[..., 1])
    areas = jnp.where(gt_valid, areas, 1e18)
    for lvl, o in enumerate(outs):
        b, h, w = o["ctr"].shape
        pts = level_points(h, w, LEVEL_STRIDES[lvl]).reshape(1, h * w, 1, 2)
        x, y = pts[..., 0], pts[..., 1]  # [1, hw, 1]
        l = x - gt_boxes[:, None, :, 0]
        t = y - gt_boxes[:, None, :, 1]
        r = gt_boxes[:, None, :, 2] - x
        btm = gt_boxes[:, None, :, 3] - y
        ltrb = jnp.stack([l, t, r, btm], axis=-1)  # [B, hw, G, 4]
        inside = jnp.min(ltrb, -1) > 0
        mx = jnp.max(ltrb, -1)
        lo, hi = LEVEL_RANGES[lvl]
        in_range = (mx >= lo) & (mx <= hi)
        cand = inside & in_range & gt_valid[:, None, :]
        a = jnp.where(cand, areas[:, None, :], 1e18)
        gi = jnp.argmin(a, axis=-1)  # [B, hw]
        pos = jnp.any(cand, axis=-1)
        lab = jnp.where(pos, jnp.take_along_axis(gt_labels, gi, 1), -1)
        tl = jnp.take_along_axis(ltrb, gi[..., None, None].repeat(4, -1),
                                 axis=2)[:, :, 0, :]
        lr = jnp.stack([tl[..., 0], tl[..., 2]], -1)
        tb = jnp.stack([tl[..., 1], tl[..., 3]], -1)
        ctr = jnp.sqrt(jnp.clip(
            (jnp.min(lr, -1) / jnp.clip(jnp.max(lr, -1), 1e-6))
            * (jnp.min(tb, -1) / jnp.clip(jnp.max(tb, -1), 1e-6)), 0, None))
        targets.append({"labels": lab, "ltrb": tl, "ctr": ctr, "pos": pos})
    return targets


def _iou_xyxy(a, b):
    """IoU of aligned xyxy boxes [..., 4]."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0) * jnp.clip(a[..., 3] - a[..., 1], 0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)
    return inter / jnp.clip(area_a + area_b - inter, 1e-6)


def detector2d_loss(outs, gt_boxes, gt_labels, gt_valid):
    """Focal cls + IoU reg + BCE centerness (FCOS losses)."""
    targets = fcos_targets(outs, gt_boxes, gt_labels, gt_valid)
    n_pos = sum(jnp.sum(t["pos"]) for t in targets)
    norm = jnp.maximum(n_pos.astype(jnp.float32), 1.0)
    cls_loss = reg_loss = ctr_loss = 0.0
    for lvl, (o, t) in enumerate(zip(outs, targets)):
        b, h, w, c = o["cls"].shape
        logits = o["cls"].reshape(b, h * w, c)
        onehot = jax.nn.one_hot(t["labels"], c) * (t["labels"] >= 0)[..., None]
        p = jax.nn.sigmoid(logits)
        pt = onehot * p + (1 - onehot) * (1 - p)
        alpha = onehot * 0.25 + (1 - onehot) * 0.75
        ce = -jnp.log(jnp.clip(pt, 1e-8))
        cls_loss += jnp.sum(alpha * (1 - pt) ** 2 * ce)

        pos = t["pos"]
        pts = level_points(h, w, LEVEL_STRIDES[lvl]).reshape(1, h * w, 2)
        reg = o["reg"].reshape(b, h * w, 4)
        pred_box = jnp.stack([
            pts[..., 0] - reg[..., 0], pts[..., 1] - reg[..., 1],
            pts[..., 0] + reg[..., 2], pts[..., 1] + reg[..., 3]], -1)
        tgt = t["ltrb"]
        tgt_box = jnp.stack([
            pts[..., 0] - tgt[..., 0], pts[..., 1] - tgt[..., 1],
            pts[..., 0] + tgt[..., 2], pts[..., 1] + tgt[..., 3]], -1)
        iou = _iou_xyxy(pred_box, tgt_box)
        reg_loss += jnp.sum(jnp.where(pos, (1 - iou) * t["ctr"], 0.0))

        ctr_logit = o["ctr"].reshape(b, h * w)
        bce = jnp.maximum(ctr_logit, 0) - ctr_logit * t["ctr"] + jnp.log1p(
            jnp.exp(-jnp.abs(ctr_logit)))
        ctr_loss += jnp.sum(jnp.where(pos, bce, 0.0))

    ctr_sum = sum(jnp.sum(jnp.where(t["pos"], t["ctr"], 0.0)) for t in targets)
    return {
        "cls_loss": cls_loss / norm,
        "reg_loss": reg_loss / jnp.maximum(ctr_sum, 1e-6),
        "ctr_loss": ctr_loss / norm,
    }


def nms_2d(boxes, scores, valid, iou_thr: float = 0.5):
    """Static-shape greedy NMS over xyxy boxes [N, 4]; returns keep mask."""
    n = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b = boxes[order]
    iou = _iou_xyxy(b[:, None, :], b[None, :, :])
    tri = jnp.tril(jnp.ones((n, n), bool), -1)  # j < i: higher-scored

    def body(i, keep):
        sup = jnp.any(keep & tri[i] & (iou[i] > iou_thr))
        return keep.at[i].set(keep[i] & ~sup)

    keep0 = valid[order]
    keep = jax.lax.fori_loop(0, n, body, keep0)
    inv = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n))
    return keep[inv]


class Detections2D(NamedTuple):
    boxes: jnp.ndarray  # [B, D, 6] x1, y1, x2, y2, conf, cls
    valid: jnp.ndarray  # [B, D]


def detector2d_get_bboxes(
    outs, n_classes: int, topk: int = 64, max_det: int = 64,
    score_thr: float = 0.1, iou_thr: float = 0.5, image_hw=None,
):
    """Decode + per-class NMS into the [D, 6] ImVoteNet interface."""
    per_level = []
    for lvl, o in enumerate(outs):
        b, h, w, c = o["cls"].shape
        pts = level_points(h, w, LEVEL_STRIDES[lvl]).reshape(1, h * w, 2)
        score = jax.nn.sigmoid(o["cls"]).reshape(b, h * w, c) * jax.nn.sigmoid(
            o["ctr"]).reshape(b, h * w, 1)
        reg = o["reg"].reshape(b, h * w, 4)
        boxes = jnp.stack([
            pts[..., 0] - reg[..., 0], pts[..., 1] - reg[..., 1],
            pts[..., 0] + reg[..., 2], pts[..., 1] + reg[..., 3]], -1)
        best = jnp.max(score, -1)
        cls = jnp.argmax(score, -1)
        k = min(topk, h * w)
        val, idx = jax.lax.top_k(best, k)
        per_level.append((
            jnp.take_along_axis(boxes, idx[..., None], 1),
            val,
            jnp.take_along_axis(cls, idx, 1),
        ))
    boxes = jnp.concatenate([p[0] for p in per_level], 1)
    scores = jnp.concatenate([p[1] for p in per_level], 1)
    cls = jnp.concatenate([p[2] for p in per_level], 1)
    if image_hw is not None:
        hh, ww = image_hw
        boxes = jnp.stack([
            jnp.clip(boxes[..., 0], 0, ww), jnp.clip(boxes[..., 1], 0, hh),
            jnp.clip(boxes[..., 2], 0, ww), jnp.clip(boxes[..., 3], 0, hh)], -1)

    def single(bx, sc, cl):
        ok = sc > score_thr
        # class-offset trick: one NMS call suppresses within-class only
        off = cl.astype(bx.dtype)[:, None] * 1e4
        keep = nms_2d(bx + off, sc, ok, iou_thr)
        n = bx.shape[0]
        rank = jnp.argsort(-jnp.where(keep, sc, -jnp.inf))[:max_det]
        out = jnp.concatenate(
            [bx[rank], sc[rank, None], cl[rank, None].astype(bx.dtype)], -1)
        return out, keep[rank]

    out, valid = jax.vmap(single)(boxes, scores, cls)
    return Detections2D(boxes=out, valid=valid)


def extract_bboxes_2d(
    model: Detector2D, variables, images, rng=None, train: bool = False,
    **decode_kw,
):
    """The reference's `extract_bboxes_2d` (`imvotenet.py:308-365`): run the
    (frozen) 2D branch, sort by confidence, and during training randomly
    drop half the boxes for generalization. Returns ([B, D, 6], valid)."""
    outs = model.apply(variables, images, train=False)
    dets = detector2d_get_bboxes(
        outs, model.n_classes, image_hw=images.shape[1:3], **decode_kw)
    valid = dets.valid
    if train and rng is not None:
        drop = jax.random.bernoulli(rng, 0.5, valid.shape)
        valid = valid & drop
    boxes = jnp.where(valid[..., None], dets.boxes, 0.0)
    return boxes, valid
