"""Single-cloud inference API (`init_model`/`inference_detector` analog,
`/root/reference/mmdet3d/apis/inference.py:35-118`)."""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.fcaf3d import FCAF3DConfig
from ..models.detector import FCAF3D, infer_config
from ..models.fcaf3d_head import fcaf3d_get_bboxes
from .test import detections_to_numpy


def init_detector(cfg: FCAF3DConfig, work_dir: Optional[str] = None, seed: int = 0,
                  params_file: Optional[str] = None):
    """Build a detector and (optionally) load trained weights from work_dir
    or a converted-checkpoint pickle (`tools/convert_checkpoint.py`)."""
    model = FCAF3D(cfg)
    b, p = 1, cfg.num_points
    zeros = jnp.zeros((b, p, 3), jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(seed), zeros, zeros, jnp.ones((b, p), bool)
    )
    if params_file is not None:
        import pickle

        with open(params_file, "rb") as f:
            loaded = pickle.load(f)
        import numpy as _np

        want = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
        got = jax.tree_util.tree_map(lambda x: _np.asarray(x).shape,
                                     loaded["params"])
        assert want == got, "converted params tree does not match the model"
        return model, {
            "params": jax.tree_util.tree_map(jnp.asarray, loaded["params"]),
            "batch_stats": jax.tree_util.tree_map(
                jnp.asarray, loaded.get("batch_stats", {})),
        }
    if work_dir is not None:
        from ..train.checkpoint import restore_checkpoint
        from ..train.optim import make_optimizer
        from ..train.trainer import TrainState

        tx = make_optimizer()
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        )
        state, _ = restore_checkpoint(work_dir, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    return model, variables


def inference_detector(
    model: FCAF3D, variables, points: np.ndarray, cfg: FCAF3DConfig, seed: int = 0
):
    """Detect objects in one point cloud [N, >=6] (xyz + rgb).

    Samples/pads to the model's static point budget, runs the jitted
    forward + NMS, returns {boxes_3d, scores_3d, labels_3d} numpy arrays
    (boxes are bottom-centered box7).
    """
    rng = np.random.default_rng(seed)
    n = len(points)
    idx = rng.choice(n, cfg.num_points, replace=n < cfg.num_points)
    pts = points[idx]
    batch_pts = jnp.asarray(pts[None, :, :3].astype(np.float32))
    batch_col = jnp.asarray(pts[None, :, 3:6].astype(np.float32))
    valid = jnp.ones((1, cfg.num_points), bool)

    tcfg = infer_config(cfg)

    @jax.jit
    def run(variables, p, c, v):
        outs = model.apply(variables, p, c, v, train=False)
        return fcaf3d_get_bboxes(outs, tcfg)

    dets = run(variables, batch_pts, batch_col, valid)
    return detections_to_numpy(dets, 0)


def inference_imvotenet(
    net,
    variables,
    points: np.ndarray,
    image: np.ndarray,
    boxes_2d: np.ndarray,
    depth2img: np.ndarray,
    num_points: int = 20000,
    n_classes: int = 10,
    nms_thr: float = 0.25,
    score_thr: float = 0.05,
    seed: int = 0,
):
    """Multi-modality (points + image) single-sample inference — the
    `inference_multi_modality_detector` analog (reference
    `mmdet3d/apis/inference.py:121-170`).

    Args:
        net: `ImVoteNet` module; variables: its params/batch_stats.
        points: [N, >=3] depth-frame cloud (xyz first; height is re-derived
            like the training pipeline's ShiftHeight).
        image: [H, W, 3] float RGB at the net's input size.
        boxes_2d: [D, 6] (x1, y1, x2, y2, conf, cls) in the image frame —
            from `extract_bboxes_2d` or GT.
        depth2img: [3, 3] projection
            (`fcaf3d_tpu.data.datasets.sunrgbd_depth2img`).

    Returns {boxes_3d, scores_3d, labels_3d} numpy arrays (joint tower,
    bottom-centered box7) with padding stripped.
    """
    from ..data.pipelines import ShiftHeight
    from ..models.votenet import votenet_get_bboxes

    rng = np.random.default_rng(seed)
    pts = np.asarray(points, np.float32)[:, :3]
    pts = ShiftHeight()({"points": pts}, rng)["points"]  # [N, 4]
    sel = rng.choice(len(pts), num_points, replace=len(pts) < num_points)
    pts = pts[sel]

    d = max(len(boxes_2d), 1)
    b2 = np.zeros((d, 6), np.float32)
    bv = np.zeros((d,), bool)
    if len(boxes_2d):
        b2[: len(boxes_2d)] = np.asarray(boxes_2d, np.float32)
        bv[: len(boxes_2d)] = True

    @jax.jit
    def run(v, p, im, bx, bvv, c):
        outs = net.apply(
            v, p, im, bx, bvv, depth2img=c, train=False, towers=("joint",)
        )
        return votenet_get_bboxes(
            outs["joint"], p, n_classes, nms_thr=nms_thr, score_thr=score_thr
        )

    dets = run(
        variables,
        jnp.asarray(pts[None]),
        jnp.asarray(np.asarray(image, np.float32)[None]),
        jnp.asarray(b2[None]),
        jnp.asarray(bv[None]),
        jnp.asarray(np.asarray(depth2img, np.float32)[None]),
    )
    return detections_to_numpy(dets, 0)
