#!/usr/bin/env python
"""Autotune the fused gather-GEMM tile geometry on REAL kernel maps.

Captures every `fused_gather_gemm` call of one eager FCAF3D forward on a
realistic synthetic scene (shapes + actual index arrays, so window spans
match production), then times each distinct call signature across a grid
of (T_ROWS, W_SUB, W_BIG) with `jax.profiler` device-time aggregation
(wall-clock micro-benchmarks are unreliable on the tunneled TPU — see
STATUS.md "measurement").

Usage:
  python tools/autotune_tiles.py                 # capture + sweep
  python tools/autotune_tiles.py --grid small    # quicker sweep
Prints a per-callsite table and the best (T, W_SUB, W_BIG) overall, to be
set via FCAF3D_GATHER_T / FCAF3D_GATHER_W / FCAF3D_GATHER_WBIG.
"""
import argparse
import glob
import gzip
import itertools
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def device_ms(trace_dir):
    """Total device-track ms in the newest perfetto trace under trace_dir."""
    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        return float("nan")
    with gzip.open(sorted(files, key=os.path.getmtime)[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Device" in n or "/device" in n}
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "")
            # count only the fused kernel itself, not copies from input setup
            if "fused" in name or "custom-call" in name or "pallas" in name:
                total += e.get("dur", 0) / 1000.0
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--grid", choices=("small", "full"), default="small")
    ap.add_argument("--config", default="fcaf3d_scannet")
    ap.add_argument("--dir", default="/tmp/fcaf3d_autotune")
    ap.add_argument("--emit", default=None,
                    help="output path for the per-signature tuning JSON "
                         "(default: fcaf3d_tpu/ops/sparse/gather_tuning.json)")
    args = ap.parse_args()

    # disable remat BEFORE model import: remat traces its body even under
    # disable_jit, hiding every block conv from the eager capture (round-3's
    # first table covered only the stem + neck interps for this reason)
    os.environ["FCAF3D_NO_REMAT"] = "1"

    import numpy as np
    import jax
    import jax.numpy as jnp

    from fcaf3d_tpu.utils import setup_compilation_cache
    setup_compilation_cache()
    from fcaf3d_tpu import configs
    from fcaf3d_tpu.models import FCAF3D
    from fcaf3d_tpu.ops.sparse import gather_kernel
    from bench import synth_scene

    cfg = getattr(configs, args.config)()
    model = FCAF3D(cfg)
    rng = np.random.RandomState(0)
    b, p = args.batch, cfg.num_points
    pts = jnp.asarray(np.stack([synth_scene(rng, p)[0] for _ in range(b)]))
    cols = jnp.asarray(rng.uniform(0, 255, (b, p, 3)).astype(np.float32))
    valid = jnp.ones((b, p), bool)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts, cols, valid)

    # ---- capture: run ONE forward eagerly with a recording wrapper ----
    captured = []  # (feats, idx, weight) as device arrays
    orig = gather_kernel.fused_gather_gemm

    def recording(feats, idx, weight, **kw):
        if not isinstance(feats, jax.core.Tracer):
            captured.append((feats, idx, weight))
        return orig(feats, idx, weight, **kw)

    gather_kernel.fused_gather_gemm = recording
    try:
        with jax.disable_jit():
            model.apply(variables, pts, cols, valid, train=False)
    finally:
        gather_kernel.fused_gather_gemm = orig
    # dedupe by the TABLE key (Cin, Cout, K, M-bucket) — exact-shape
    # signatures that share a tuning-table entry don't need separate sweeps;
    # keep the largest-M example per key, weight by total multiplicity
    def table_key(feats, idx, weight):
        (_, _, c), (_, m, k), (_, _, e) = (
            feats.shape, idx.shape, weight.shape)
        mb = 1 << max(0, int(m) - 1).bit_length()
        return (int(c), int(e), int(k), mb)

    sigs = defaultdict(int)
    examples = {}
    for feats, idx, weight in captured:
        sig = table_key(feats, idx, weight)
        sigs[sig] += 1
        if sig not in examples or idx.shape[1] > examples[sig][1].shape[1]:
            examples[sig] = (feats, idx, weight)
    print(f"captured {len(captured)} fused calls, "
          f"{len(sigs)} distinct table keys")

    # the one-hot select costs T*W_SUB MACs/offset/tile and spans scale
    # ~linearly with T, so small (T, W) pairs are the high-upside corner
    if args.grid == "small":
        grid = [(256, 384, 2048), (256, 512, 2048), (128, 256, 1024),
                (128, 192, 1024), (64, 128, 1024), (192, 256, 1536),
                (256, 384, 4096), (512, 640, 4096), (512, 512, 2048),
                (128, 384, 2048)]
    else:
        grid = list(itertools.product(
            (64, 128, 192, 256, 512), (128, 192, 256, 384, 512, 640),
            (1024, 1536, 2048, 4096)))
        grid = [(t, w, wb) for (t, w, wb) in grid if w < wb]

    def time_setting(sig, t, w, wb):
        feats, idx, weight = examples[sig]
        fn = jax.jit(lambda f, i, ww: orig(
            f, i, ww, t_rows=t, w_sub=w, w_big=wb))
        try:
            out = fn(feats, idx, weight)
            jax.block_until_ready(out)
        except Exception as exc:  # VMEM OOM at large (w, wb, C)
            print(f"    ({t},{w},{wb}) failed: {str(exc)[:80]}")
            return float("inf")
        d = os.path.join(args.dir, f"{t}_{w}_{wb}_{abs(hash(sig)) % 99999}")
        with jax.profiler.trace(d, create_perfetto_trace=True):
            for _ in range(args.iters):
                out = fn(feats, idx, weight)
            jax.block_until_ready(out)
        return device_ms(d) / args.iters

    totals = defaultdict(float)
    per_sig = {}
    for sig, mult in sorted(sigs.items(), key=lambda kv: -kv[1]):
        c, e, k, mb = sig
        print(f"\ntable key Cin={c} Cout={e} K={k} M<={mb} x{mult}")
        best_sig = (float("inf"), None)
        for (t, w, wb) in grid:
            ms = time_setting(sig, t, w, wb)
            totals[(t, w, wb)] += ms * mult
            best_sig = min(best_sig, (ms, (t, w, wb)))
            print(f"    T={t:4d} W={w:4d} WB={wb:5d}  {ms:8.3f} ms/call")
        per_sig[sig] = best_sig

    print("\nweighted totals per setting (lower is better):")
    for (t, w, wb), ms in sorted(totals.items(), key=lambda kv: kv[1]):
        print(f"  T={t:4d} W={w:4d} WB={wb:5d}  {ms:8.3f} ms/fwd (fused only)")
    best = min(totals, key=totals.get)
    print(f"\nbest: FCAF3D_GATHER_T={best[0]} FCAF3D_GATHER_W={best[1]} "
          f"FCAF3D_GATHER_WBIG={best[2]}")

    # per-signature table consumed by gather_kernel._tuned_params: key is
    # "Cin,Cout,K,M-bucket" (M rounded up to a power of two)
    table = {}
    for (c, e, k, mb), (ms, setting) in per_sig.items():
        if setting is None:
            continue
        key = f"{c},{e},{k},{mb}"
        if key not in table or ms < table[key][1]:
            table[key] = (setting, ms)
    out_path = args.emit or os.path.join(
        os.path.dirname(__file__), "..", "fcaf3d_tpu", "ops", "sparse",
        "gather_tuning.json")
    with open(out_path, "w") as f:
        json.dump({k: list(v[0]) for k, v in sorted(table.items())}, f,
                  indent=1)
    print(f"wrote per-signature table -> {out_path}")


if __name__ == "__main__":
    main()
