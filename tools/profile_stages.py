#!/usr/bin/env python
"""Per-stage timing of the FCAF3D forward (hoisting-proof chained timing).

Each stage runs `iters` times inside one jitted lax.scan where the carry
perturbs the next iteration's *input* (x + carry*1e-30), so XLA cannot
hoist the body out of the loop, and async dispatch cannot skew wall time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from fcaf3d_tpu.utils import setup_compilation_cache

    setup_compilation_cache()

    from fcaf3d_tpu.configs import fcaf3d_scannet
    from fcaf3d_tpu.models import FCAF3D
    from fcaf3d_tpu.models.detector import infer_config
    from fcaf3d_tpu.models.fcaf3d_head import Fcaf3DNeckWithHead, fcaf3d_get_bboxes
    from fcaf3d_tpu.models.me_resnet import MEResNet3D
    from fcaf3d_tpu.ops.sparse import voxelize

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--full-only", action="store_true",
                    help="only the two FULL-forward lines (fast compile)")
    args = ap.parse_args()

    cfg = fcaf3d_scannet()
    rng = np.random.RandomState(0)
    b, p = args.batch, cfg.num_points
    pts = jnp.asarray(rng.uniform(0, 6.0, (b, p, 3)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, 1, (b, p, 3)).astype(np.float32))
    valid = jnp.ones((b, p), bool)

    def bench(name, fn, *args, iters=8):
        """fn's FIRST arg must be a float array (or SparseTensor) that the
        chained carry can perturb."""
        def perturb(x, c):
            return jax.tree_util.tree_map(
                lambda l: l + c.astype(l.dtype) * 1e-30
                if jnp.issubdtype(l.dtype, jnp.floating)
                else l,
                x,
            )

        def many(*a):
            def body(c, _):
                r = fn(perturb(a[0], c), *a[1:])
                leaves = jax.tree_util.tree_leaves(r)
                s = sum(
                    jnp.sum(l).astype(jnp.float32)
                    for l in leaves
                    if jnp.issubdtype(l.dtype, jnp.floating)
                )
                return c + s * 1e-30 + 1e-6, None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c

        jm = jax.jit(many)
        float(jm(*args))
        t0 = time.perf_counter()
        float(jm(*args))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:36s} {dt * 1000:9.2f} ms", flush=True)

    float(jnp.sum(pts))  # warm the D2H path

    model = FCAF3D(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts, cols, valid)
    bench("FULL forward (no NMS)",
          lambda a, v, c, m: model.apply(v, a, c, m, train=False),
          pts, variables, cols, valid)

    tcfg = infer_config(cfg)
    bench("FULL forward + NMS",
          lambda a, v, c, m: fcaf3d_get_bboxes(
              model.apply(v, a, c, m, train=False), tcfg),
          pts, variables, cols, valid)
    if args.full_only:
        return

    vox = lambda a, c, v: voxelize(a, c, v, cfg.voxel_size, cfg.input_budget)
    bench("voxelize", vox, pts, cols, valid)
    st = jax.jit(vox)(pts, cols, valid)
    st = st.with_feats(st.feats.astype(cfg.compute_dtype))

    backbone = MEResNet3D(depth=cfg.depth, n_outs=cfg.n_outs, budgets=cfg.backbone_budgets)
    vars_b = jax.jit(backbone.init)(jax.random.PRNGKey(0), st)
    bench("backbone (all)", lambda s, v: backbone.apply(v, s), st, vars_b)
    outs = jax.jit(backbone.apply)(vars_b, st)

    head = Fcaf3DNeckWithHead(
        n_classes=cfg.n_classes, n_reg_outs=cfg.n_reg_outs,
        voxel_size=cfg.voxel_size, neck_budgets=cfg.neck_budgets,
    )
    vars_h = jax.jit(head.init)(jax.random.PRNGKey(0), outs)
    bench("neck+head (all)", lambda s4, v, rest: head.apply(v, (rest[0], rest[1], rest[2], s4)),
          outs[3], vars_h, outs[:3])
    ho = jax.jit(head.apply)(vars_h, outs)

    bench("get_bboxes (NMS)", lambda o: fcaf3d_get_bboxes(o, tcfg), ho)

    from fcaf3d_tpu.ops.sparse import (
        build_kernel_map, conv_plan, gen_conv_plan,
        generative_transpose_conv2x2, interpolate_at, kernel_offsets,
        sparse_conv, sparse_max_pool, sparse_prune, sparse_union_add,
    )

    dt = cfg.compute_dtype
    w1 = jnp.asarray(rng.randn(27, 3, 64).astype(np.float32) * 0.1, dt)
    bench("conv1 k3s2 (3->64, 98k->64k)",
          lambda s, w: sparse_conv(s, w, 3, 2, out_budget=cfg.backbone_budgets[0]), st, w1)
    st2 = jax.jit(lambda s, w: sparse_conv(s, w, 3, 2, out_budget=cfg.backbone_budgets[0]))(st, w1)
    bench("maxpool k2s2 (64k->32k)",
          lambda s: sparse_max_pool(s, 2, 2, out_budget=cfg.backbone_budgets[1]), st2)
    st4 = jax.jit(lambda s: sparse_max_pool(s, 2, 2, out_budget=cfg.backbone_budgets[1]))(st2)
    w2 = jnp.asarray(rng.randn(27, 64, 64).astype(np.float32) * 0.05, dt)
    bench("conv k3s2 (64ch, 32k->24k)",
          lambda s, w: sparse_conv(s, w, 3, 2, out_budget=cfg.backbone_budgets[2]), st4, w2)
    st8 = jax.jit(lambda s, w: sparse_conv(s, w, 3, 2, out_budget=cfg.backbone_budgets[2]))(st4, w2)
    bench("conv k3s1 (64ch, 24k rows)", lambda s, w: sparse_conv(s, w, 3, 1), st8, w2)
    plan8 = jax.jit(lambda s: conv_plan(s, 3, 1))(st8)
    bench("conv k3s1 24k with plan",
          lambda s, w, pl: sparse_conv(s, w, 3, 1, plan=pl), st8, w2, plan8)
    bench("kmap only (24k x 27)",
          lambda s: build_kernel_map(s.keys, s.coords, kernel_offsets(3, s.stride)), st8)

    w16 = jnp.asarray(rng.randn(27, 64, 128).astype(np.float32) * 0.05, dt)
    st16 = jax.jit(lambda s, w: sparse_conv(s, w, 3, 2, out_budget=cfg.backbone_budgets[3]))(st8, w16)
    wt = jnp.asarray(rng.randn(8, 128, 64).astype(np.float32) * 0.05, dt)
    bench("gen transpose (8k->65k)",
          lambda s, w: generative_transpose_conv2x2(s, w, sort_output=False), st16, wt)
    gen = jax.jit(lambda s, w: generative_transpose_conv2x2(s, w, sort_output=False))(st16, wt)
    w3 = jnp.asarray(rng.randn(27, 64, 64).astype(np.float32) * 0.05, dt)
    genplan = jax.jit(gen_conv_plan)(st16, gen)
    bench("conv k3s1 65k ANALYTIC plan",
          lambda s, w, pl: sparse_conv(s, w, 3, 1, plan=pl), gen, w3, genplan)
    gen_sorted = jax.jit(lambda s, w: generative_transpose_conv2x2(s, w, sort_output=True))(st16, wt)
    bench("conv k3s1 65k generic kmap", lambda s, w: sparse_conv(s, w, 3, 1), gen_sorted, w3)
    bench("union add (65k+24k)", sparse_union_add, gen_sorted, st8)
    added = jax.jit(sparse_union_add)(gen_sorted, st8)
    sc = jnp.asarray(rng.randn(b, st16.capacity, 1).astype(np.float32))
    bench("interp+prune (89k->32k)",
          lambda a, s16, s: sparse_prune(
              a, interpolate_at(s16.with_feats(s), a.coords.astype(jnp.float32))[..., 0],
              cfg.neck_budgets[0]), added, st16, sc)


if __name__ == "__main__":
    main()
