#!/usr/bin/env python
"""Per-stage timing of the FCAF3D forward (serialized scan timing).

Each stage is timed as `lax.scan` of `iters` applications inside one jit,
with results folded into a scalar carry — immune to async-dispatch
mismeasurement on remote backends.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from fcaf3d_tpu.utils import setup_compilation_cache

    setup_compilation_cache()

    from fcaf3d_tpu.configs import fcaf3d_scannet
    from fcaf3d_tpu.models.detector import infer_config
    from fcaf3d_tpu.models.fcaf3d_head import Fcaf3DNeckWithHead, fcaf3d_get_bboxes
    from fcaf3d_tpu.models.me_resnet import MEResNet3D
    from fcaf3d_tpu.ops.sparse import voxelize

    cfg = fcaf3d_scannet()
    rng = np.random.RandomState(0)
    b, p = 1, cfg.num_points
    pts = jnp.asarray(rng.uniform(0, 6.0, (b, p, 3)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, 1, (b, p, 3)).astype(np.float32))
    valid = jnp.ones((b, p), bool)

    def bench(name, fn, *args, iters=10):
        def many(*a):
            def body(c, _):
                r = fn(*a)
                leaves = jax.tree_util.tree_leaves(r)
                s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
                return c + s, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c
        jm = jax.jit(many)
        float(jm(*args))
        t0 = time.perf_counter()
        float(jm(*args))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:36s} {dt * 1000:9.2f} ms", flush=True)

    # warm D2H path early
    float(jnp.sum(pts))

    from fcaf3d_tpu.models import FCAF3D

    model = FCAF3D(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts, cols, valid)
    bench("FULL forward (no NMS)",
          lambda v, a, c, m: model.apply(v, a, c, m, train=False),
          variables, pts, cols, valid)

    vox = lambda a, c, v: voxelize(a, c, v, cfg.voxel_size, cfg.input_budget)
    bench("voxelize", vox, pts, cols, valid)
    st = jax.jit(vox)(pts, cols, valid)
    st = st.with_feats(st.feats.astype(cfg.compute_dtype))

    backbone = MEResNet3D(depth=cfg.depth, n_outs=cfg.n_outs, budgets=cfg.backbone_budgets)
    vars_b = jax.jit(backbone.init)(jax.random.PRNGKey(0), st)
    bench("backbone (all)", backbone.apply, vars_b, st)
    outs = jax.jit(backbone.apply)(vars_b, st)

    head = Fcaf3DNeckWithHead(
        n_classes=cfg.n_classes, n_reg_outs=cfg.n_reg_outs,
        voxel_size=cfg.voxel_size, neck_budgets=cfg.neck_budgets,
    )
    vars_h = jax.jit(head.init)(jax.random.PRNGKey(0), outs)
    bench("neck+head (all)", head.apply, vars_h, outs)
    ho = jax.jit(head.apply)(vars_h, outs)

    tcfg = infer_config(cfg)
    bench("get_bboxes (NMS)", lambda o: fcaf3d_get_bboxes(o, tcfg), ho, iters=3)

    from fcaf3d_tpu.ops.sparse import (
        build_kernel_map, generative_transpose_conv2x2, interpolate_at,
        kernel_offsets, sparse_conv, sparse_max_pool, sparse_prune,
        sparse_union_add,
    )

    w1 = jnp.asarray(rng.randn(27, 3, 64).astype(np.float32) * 0.1)
    bench("conv1 k3s2 (3->64, 98k->64k)",
          lambda s, w: sparse_conv(s, w, 3, 2, out_budget=cfg.backbone_budgets[0]), st, w1)
    st2 = jax.jit(lambda s, w: sparse_conv(s, w, 3, 2, out_budget=cfg.backbone_budgets[0]))(st, w1)
    bench("maxpool k2s2 (64k->32k)",
          lambda s: sparse_max_pool(s, 2, 2, out_budget=cfg.backbone_budgets[1]), st2)
    st4 = jax.jit(lambda s: sparse_max_pool(s, 2, 2, out_budget=cfg.backbone_budgets[1]))(st2)
    w2 = jnp.asarray(rng.randn(27, 64, 64).astype(np.float32) * 0.05)
    bench("conv k3s2 (64ch, 32k->24k)",
          lambda s, w: sparse_conv(s, w, 3, 2, out_budget=cfg.backbone_budgets[2]), st4, w2)
    st8 = jax.jit(lambda s, w: sparse_conv(s, w, 3, 2, out_budget=cfg.backbone_budgets[2]))(st4, w2)
    bench("conv k3s1 (64ch, 24k rows)", lambda s, w: sparse_conv(s, w, 3, 1), st8, w2)
    bench("kmap only (24k x 27)",
          lambda s: build_kernel_map(s.keys, s.coords, kernel_offsets(3, s.stride)), st8)

    w16 = jnp.asarray(rng.randn(27, 64, 128).astype(np.float32) * 0.05)
    st16 = jax.jit(lambda s, w: sparse_conv(s, w, 3, 2, out_budget=cfg.backbone_budgets[3]))(st8, w16)
    wt = jnp.asarray(rng.randn(8, 128, 64).astype(np.float32) * 0.05)
    bench("gen transpose (8k->65k)", generative_transpose_conv2x2, st16, wt)
    gen = jax.jit(generative_transpose_conv2x2)(st16, wt)
    w3 = jnp.asarray(rng.randn(27, 64, 64).astype(np.float32) * 0.05)
    bench("conv k3s1 (64ch, 65k rows)", lambda s, w: sparse_conv(s, w, 3, 1), gen, w3)
    bench("union add (65k+24k)", sparse_union_add, gen, st8)
    added = jax.jit(sparse_union_add)(gen, st8)
    sc = jnp.asarray(rng.randn(1, st16.capacity, 1).astype(np.float32))
    bench("interp+prune (89k->32k)",
          lambda a, s16, s: sparse_prune(
              a, interpolate_at(s16.with_feats(s), a.coords.astype(jnp.float32))[..., 0],
              cfg.neck_budgets[0]), added, st16, sc)


if __name__ == "__main__":
    main()
