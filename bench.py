"""Benchmark: FCAF3D ScanNet inference throughput (scenes/sec) on one chip.

Mirrors the reference's `tools/analysis_tools/benchmark.py` protocol
(warmup then synchronized timing) on synthetic room-scale scenes. Baseline:
8.0 scenes/s for the 4-scale HDResNet34 ScanNet model on a GTX1080Ti
(reference README.md:91); north-star target is >= 2x on one TPU chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import argparse
import json
import time

import numpy as np

BASELINE_SCENES_PER_SEC = 8.0


def synth_scene(rng, n_points, extent=(6.0, 6.0, 2.8)):
    """Room-like synthetic scene: points concentrated on walls/floor planes
    plus furniture blobs, so voxel occupancy resembles real scans."""
    n_planes = int(n_points * 0.6)
    n_blobs = n_points - n_planes
    pts = np.empty((n_points, 3), np.float32)
    # floor + 4 walls
    k = n_planes // 5
    e = np.asarray(extent)
    pts[:k] = rng.uniform(0, 1, (k, 3)) * [e[0], e[1], 0.02]
    pts[k:2 * k] = rng.uniform(0, 1, (k, 3)) * [e[0], 0.02, e[2]]
    pts[2 * k:3 * k] = rng.uniform(0, 1, (k, 3)) * [0.02, e[1], e[2]] + [e[0] - 0.02, 0, 0]
    pts[3 * k:4 * k] = rng.uniform(0, 1, (k, 3)) * [e[0], 0.02, e[2]] + [0, e[1] - 0.02, 0]
    pts[4 * k:n_planes] = rng.uniform(0, 1, (n_planes - 4 * k, 3)) * [0.02, e[1], e[2]]
    # furniture blobs
    centers = rng.uniform(0.5, 1, (12, 3)) * (e - 1.0)
    blob = rng.randint(0, 12, n_blobs)
    pts[n_planes:] = centers[blob] + rng.normal(0, 0.25, (n_blobs, 3))
    colors = rng.uniform(0, 255, (n_points, 3)).astype(np.float32)
    return pts, colors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--config", default="fcaf3d_scannet",
                    help="config factory name from fcaf3d_tpu.configs "
                         "(e.g. fcaf3d_scannet_3scales, fcaf3d_sunrgbd)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fcaf3d_tpu.utils import setup_compilation_cache
    setup_compilation_cache()

    from fcaf3d_tpu import configs
    from fcaf3d_tpu.models import FCAF3D

    cfg = getattr(configs, args.config)()
    model = FCAF3D(cfg)
    rng = np.random.RandomState(0)
    b, p = args.batch, cfg.num_points
    pts = np.stack([synth_scene(rng, p)[0] for _ in range(b)])
    colors = rng.uniform(0, 255, (b, p, 3)).astype(np.float32)
    pts, colors = jnp.asarray(pts), jnp.asarray(colors)
    valid = jnp.ones((b, p), bool)

    from fcaf3d_tpu.models import fcaf3d_get_bboxes, infer_config

    tcfg = infer_config(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts, colors, valid)

    # full inference pipeline incl. NMS, matching the reference's
    # tools/analysis_tools/benchmark.py protocol (model(return_loss=False))
    def run(v, a, c, m):
        outs = model.apply(v, a, c, m, train=False)
        return fcaf3d_get_bboxes(outs, tcfg)

    fwd = jax.jit(run)

    # serialized timing: run `iters` inferences inside one lax.scan with a
    # data dependency between iterations — immune to async-dispatch and
    # loop-invariant hoisting artifacts on the tunneled TPU backend
    def many(v, a, c, m):
        def body(carry, _):
            dets = run(v, a + carry * 1e-30, c, m)
            return carry + jnp.sum(dets.scores), None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=args.iters)
        return out

    jmany = jax.jit(many)
    float(jmany(variables, pts, colors, valid))  # compile + warm
    t0 = time.perf_counter()
    float(jmany(variables, pts, colors, valid))
    dt = time.perf_counter() - t0

    scenes_per_sec = args.iters * b / dt
    print(
        json.dumps(
            {
                "metric": "scannet_fcaf3d_inference",
                "value": round(scenes_per_sec, 3),
                "unit": "scenes/sec",
                "vs_baseline": round(scenes_per_sec / BASELINE_SCENES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
