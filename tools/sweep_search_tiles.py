#!/usr/bin/env python
"""Sweep FCAF3D_SEARCH_T / FCAF3D_SEARCH_L on representative kernel-map
builds and report per-config device time of `_searchsorted_pallas`.

The search kernel walks each query chunk's key range in L-key rows inside a
fori_loop; per-iteration overhead (dynamic-slice load + compares + MXU count
dot + carry) dominates at L=128, so larger L trades a few more VPU compares
for far fewer loop iterations. Wall-clock through the tunneled chip is
unreliable, so this uses jax.profiler device durations (the repo's standard
measurement discipline, see STATUS.md).

Usage: python tools/sweep_search_tiles.py [--t 512,1024] [--l 128,256,512]
Each (T, L) runs in a subprocess (the tile sizes are module constants read
at import).
"""
import argparse
import json
import os
import subprocess
import sys

_CHILD = """
import glob, gzip, json, os, sys
sys.path.insert(0, %(repo)r)
import numpy as np
import jax, jax.numpy as jnp
from fcaf3d_tpu.utils import setup_compilation_cache
setup_compilation_cache()
from fcaf3d_tpu.configs import fcaf3d_scannet
from fcaf3d_tpu.data.pipelines import voxelize
from fcaf3d_tpu.ops.sparse.tensor import SparseTensor, downsample_coords
from fcaf3d_tpu.ops.sparse.conv import (
    build_kernel_map, build_kernel_map_self, kernel_offsets)
from bench import synth_scene

cfg = fcaf3d_scannet()
rng = np.random.RandomState(0)
pts, _ = synth_scene(rng, cfg.num_points)
pts = jnp.asarray(pts[None])
cols = jnp.ones((1, cfg.num_points, 3), jnp.float32)
valid = jnp.ones((1, cfg.num_points), bool)
st = voxelize(pts, cols, valid, cfg.voxel_size, cfg.input_budget)

def maps(st):
    outs = []
    cur = st
    for lvl, budget in enumerate(cfg.backbone_budgets[:4]):
        # strided map (27-offset downsample search) + self map (13-offset)
        oc, ok, dropped = downsample_coords(cur, 2, budget)
        idx_s = build_kernel_map(cur.keys, oc, kernel_offsets(3, cur.stride))
        cur = SparseTensor(coords=oc, feats=jnp.zeros((1, budget, 1), jnp.bfloat16),
                           keys=ok, shift=cur.shift, stride=cur.stride * 2)
        idx_self = build_kernel_map_self(cur.keys, cur.coords, cur.stride)
        outs.append((idx_s.sum(), idx_self.sum()))
    return outs

fn = jax.jit(lambda s: maps(s))
out = fn(st)
jax.block_until_ready(out)
tdir = %(tdir)r
with jax.profiler.trace(tdir, create_perfetto_trace=True):
    for _ in range(5):
        out = fn(st)
    jax.block_until_ready(out)

files = sorted(glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True))
with gzip.open(files[-1], "rt") as f:
    data = json.load(f)
events = data["traceEvents"] if isinstance(data, dict) else data
pids = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
dev = {p for p, n in pids.items() if "TPU" in n or "Device" in n or "/device" in n}
search = total = 0.0
for e in events:
    if e.get("ph") != "X" or e.get("pid") not in dev:
        continue
    name = e.get("name", "")
    if name.startswith("jit_"):
        continue
    d = e.get("dur", 0) / 1000.0
    total += d
    if name.startswith("_searchsorted_pallas"):
        search += d
print(json.dumps({"search_ms": search / 5, "total_ms": total / 5}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", default="512,1024")
    ap.add_argument("--l", default="128,256,512")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for t in args.t.split(","):
        for l in args.l.split(","):
            env = dict(os.environ)
            env["FCAF3D_SEARCH_T"] = t
            env["FCAF3D_SEARCH_L"] = l
            tdir = f"/tmp/search_sweep_{t}_{l}"
            child = _CHILD % {"repo": repo, "tdir": tdir}
            r = subprocess.run(
                [sys.executable, "-c", child], env=env, capture_output=True,
                text=True, timeout=900,
            )
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            try:
                rec = json.loads(line)
            except ValueError:
                print(f"T={t} L={l}: FAILED\n{r.stderr[-2000:]}")
                continue
            results[(t, l)] = rec
            print(f"T={t} L={l}: search {rec['search_ms']:.3f} ms  "
                  f"total {rec['total_ms']:.3f} ms")
    if results:
        best = min(results.items(), key=lambda kv: kv[1]["search_ms"])
        print(f"best: T={best[0][0]} L={best[0][1]}  {best[1]}")


if __name__ == "__main__":
    main()
