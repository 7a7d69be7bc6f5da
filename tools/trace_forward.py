#!/usr/bin/env python
"""Trace the FCAF3D forward with jax.profiler and print per-op device time.

Writes a perfetto trace and aggregates device-track slice durations by HLO
op-name prefix, the measurement discipline behind all perf claims in
STATUS.md (wall-clock micro-benchmarks are unreliable on the tunneled TPU).
"""
import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def summarize(trace_dir, top=40, min_ms=0.02):
    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not files:
        print("no perfetto trace found under", trace_dir)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    # find device-track pids (TPU / device XLA ops)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Device" in n or "/device" in n}
    agg = defaultdict(float)
    count = defaultdict(int)
    solo = defaultdict(float)  # per exact op instance (merged across iters)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1000.0  # us -> ms
        # the jit_<fn> module envelope CONTAINS every child op slice —
        # counting it would double the total (and halve computed MFU)
        if name.startswith("jit_"):
            continue
        # strip trailing .N / digits to merge fusion instances
        base = re.sub(r"\.?\d+$", "", name)
        agg[base] += dur
        count[base] += 1
        solo[name] += dur
        total += dur
    print(f"device total: {total:.2f} ms  ({trace_dir})")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        if ms < min_ms:
            break
        print(f"{ms:9.3f} ms  x{count[name]:<5d} {name[:90]}")
    print("-- top individual ops --")
    for name, ms in sorted(solo.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{ms:9.3f} ms  {name[:90]}")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dir", default="/tmp/fcaf3d_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--summarize-only", action="store_true",
                    help="just re-summarize an existing trace dir")
    ap.add_argument("--train", action="store_true",
                    help="trace a train step instead of inference")
    args = ap.parse_args()

    if args.summarize_only:
        summarize(args.dir, args.top)
        return

    import numpy as np
    import jax
    import jax.numpy as jnp

    from fcaf3d_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    from fcaf3d_tpu.configs import fcaf3d_scannet
    from fcaf3d_tpu.models import FCAF3D, fcaf3d_get_bboxes, infer_config

    cfg = fcaf3d_scannet()
    model = FCAF3D(cfg)
    rng = np.random.RandomState(0)
    b, p = args.batch, cfg.num_points
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import synth_scene

    pts = jnp.asarray(np.stack([synth_scene(rng, p)[0] for _ in range(b)]))
    cols = jnp.asarray(rng.uniform(0, 255, (b, p, 3)).astype(np.float32))
    valid = jnp.ones((b, p), bool)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts, cols, valid)
    tcfg = infer_config(cfg)

    if args.train:
        from fcaf3d_tpu.train.trainer import make_train_state, train_step_fn

        raise SystemExit("--train tracing: use tools/bench_train.py")

    def run(v, a, c, m):
        outs = model.apply(v, a, c, m, train=False)
        return fcaf3d_get_bboxes(outs, tcfg)

    fwd = jax.jit(run)
    # FLOP count (XLA cost analysis + analytic Pallas-kernel FLOPs) -> MFU
    # at the measured device time
    flops = mxu_flops = None
    try:
        from fcaf3d_tpu.utils import flop_counter

        with flop_counter() as fc:
            lowered = fwd.lower(variables, pts, cols, valid)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        xla = float(cost.get("flops", 0.0))
        flops = (xla + fc.model) or None
        mxu_flops = (xla + fc.mxu) or None
    except Exception:
        pass
    out = fwd(variables, pts, cols, valid)
    jax.block_until_ready(out)
    with jax.profiler.trace(args.dir, create_perfetto_trace=True):
        for _ in range(args.iters):
            out = fwd(variables, pts, cols, valid)
        jax.block_until_ready(out)
    total_ms = summarize(args.dir, args.top)
    print(f"(durations cover {args.iters} iterations)")
    if flops and total_ms:
        from bench import V5E_PEAK_FLOPS

        per_fwd_ms = total_ms / args.iters
        mfu = flops / (per_fwd_ms / 1e3) / V5E_PEAK_FLOPS
        print(f"flops/forward: {flops / 1e12:.4f} TF  "
              f"device {per_fwd_ms:.2f} ms/fwd  "
              f"MFU {mfu * 100:.2f}% (v5e bf16 peak {V5E_PEAK_FLOPS:.3g})")
        if mxu_flops:
            util = mxu_flops / (per_fwd_ms / 1e3) / V5E_PEAK_FLOPS
            print(f"mxu work/forward: {mxu_flops / 1e12:.4f} TF  "
                  f"(incl. one-hot selects)  MXU util {util * 100:.2f}%")


if __name__ == "__main__":
    main()
