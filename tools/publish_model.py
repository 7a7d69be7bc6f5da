#!/usr/bin/env python
"""Strip a training checkpoint to inference weights + content hash
(reference `tools/model_converters/publish_model.py`): drops the optimizer
state, saves {params, batch_stats} as a pickle named with a sha256 prefix.
"""
import argparse
import hashlib
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--out", required=True, help="output prefix (no ext)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(
        os.path.abspath(os.path.join(args.work_dir, "ckpts")))
    step = mngr.latest_step()
    raw = mngr.restore(step)
    mngr.close()
    out = {
        "params": jax.tree_util.tree_map(np.asarray, raw["params"]),
        "batch_stats": jax.tree_util.tree_map(np.asarray, raw["batch_stats"]),
        "epoch": int(step),
    }
    blob = pickle.dumps(out)
    sha = hashlib.sha256(blob).hexdigest()[:8]
    path = f"{args.out}-{sha}.pkl"
    with open(path, "wb") as f:
        f.write(blob)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
