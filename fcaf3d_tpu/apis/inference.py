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


def init_detector(cfg: FCAF3DConfig, work_dir: Optional[str] = None, seed: int = 0):
    """Build a detector and (optionally) load trained weights from work_dir."""
    model = FCAF3D(cfg)
    b, p = 1, cfg.num_points
    zeros = jnp.zeros((b, p, 3), jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(seed), zeros, zeros, jnp.ones((b, p), bool)
    )
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
