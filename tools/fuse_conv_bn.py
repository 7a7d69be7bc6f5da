#!/usr/bin/env python
"""Fold BN multiplies into conv kernels for a saved checkpoint
(reference `tools/misc/fuse_conv_bn.py` analog; see
`fcaf3d_tpu/utils/fuse_bn.py` for the parameter-tree semantics)."""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", required=True,
                    help="dir containing ckpts/ and config.json")
    ap.add_argument("--out-dir", required=True)
    args = ap.parse_args()

    import jax.numpy as jnp

    from fcaf3d_tpu.apis.inference import init_detector
    from fcaf3d_tpu.configs.fcaf3d import FCAF3DConfig
    from fcaf3d_tpu.train.checkpoint import latest_epoch, save_checkpoint
    from fcaf3d_tpu.train.optim import make_optimizer
    from fcaf3d_tpu.train.trainer import TrainState
    from fcaf3d_tpu.utils.fuse_bn import fuse_conv_bn

    with open(os.path.join(args.work_dir, "config.json")) as f:
        cfg = FCAF3DConfig(**json.load(f))
    model, variables = init_detector(cfg, args.work_dir)
    fused, n = fuse_conv_bn(variables)
    tx = make_optimizer()
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=fused["params"],
        batch_stats=fused["batch_stats"],
        opt_state=tx.init(fused["params"]),
    )
    epoch = latest_epoch(args.work_dir) or 0
    os.makedirs(args.out_dir, exist_ok=True)
    save_checkpoint(args.out_dir, epoch, state)
    with open(os.path.join(args.out_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    print(f"fused {n} conv+BN pairs from epoch {epoch} -> {args.out_dir}")


if __name__ == "__main__":
    main()
