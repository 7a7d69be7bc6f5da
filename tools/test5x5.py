#!/usr/bin/env python
"""Paper evaluation protocol: 5 checkpoints x 5 test seeds
(reference `tools/test5x5.py:31-61`): evaluates the last 5 epoch checkpoints
under 5 point-sampling seeds each and reports min/mean/max of
mAP@0.25 / mAP@0.50.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["scannet", "sunrgbd", "s3dis"], required=True)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--n-ckpts", type=int, default=5)
    ap.add_argument("--n-seeds", type=int, default=5)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--max-scenes", type=int, default=None)
    args = ap.parse_args()

    import orbax.checkpoint as ocp

    from fcaf3d_tpu.apis.inference import init_detector
    from fcaf3d_tpu.apis.test import evaluate_dataset, make_test_pipeline
    from fcaf3d_tpu.configs import fcaf3d_s3dis, fcaf3d_scannet, fcaf3d_sunrgbd
    from fcaf3d_tpu.data import (
        IndoorDetDataset, S3DIS_CLASSES, SCANNET_CLASSES, SUNRGBD_CLASSES)
    from fcaf3d_tpu.train.checkpoint import restore_checkpoint
    from fcaf3d_tpu.train.optim import make_optimizer
    from fcaf3d_tpu.train.trainer import TrainState

    cfgs = {
        "scannet": (fcaf3d_scannet(), SCANNET_CLASSES, "scannet_infos_val.pkl", True),
        "sunrgbd": (fcaf3d_sunrgbd(), SUNRGBD_CLASSES, "sunrgbd_infos_val.pkl", False),
        "s3dis": (fcaf3d_s3dis(), S3DIS_CLASSES, "s3dis_infos_Area_5.pkl", False),
    }
    cfg, classes, ann, align = cfgs[args.dataset]
    val = IndoorDetDataset(
        args.data_root, os.path.join(args.data_root, ann), classes,
        make_test_pipeline(cfg, align=align), test_mode=True,
    )

    mngr = ocp.CheckpointManager(
        os.path.abspath(os.path.join(args.work_dir, "ckpts")))
    epochs = sorted(mngr.all_steps())[-args.n_ckpts:]
    mngr.close()

    model, variables = init_detector(cfg)
    import jax
    import jax.numpy as jnp

    tx = make_optimizer()
    maps25, maps50 = [], []
    for ep in epochs:
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        )
        state, _ = restore_checkpoint(args.work_dir, state, epoch=ep)
        vars_ep = {"params": state.params, "batch_stats": state.batch_stats}
        for seed in range(args.n_seeds):
            m = evaluate_dataset(
                model, vars_ep, val, cfg, batch_size=args.batch, seed=seed,
                max_scenes=args.max_scenes,
            )
            maps25.append(m["mAP_0.25"])
            maps50.append(m["mAP_0.50"])
            print(f"epoch {ep} seed {seed}: mAP25={m['mAP_0.25']:.4f} "
                  f"mAP50={m['mAP_0.50']:.4f}", flush=True)

    result = {
        "mAP_0.25": dict(min=float(np.min(maps25)), mean=float(np.mean(maps25)),
                         max=float(np.max(maps25))),
        "mAP_0.50": dict(min=float(np.min(maps50)), mean=float(np.mean(maps50)),
                         max=float(np.max(maps50))),
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
