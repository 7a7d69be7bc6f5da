#!/usr/bin/env python
"""Micro-benchmark: fused Pallas gather-GEMM vs XLA gather+GEMM on
realistic submanifold-conv kernel maps (hoisting-proof chained timing)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def realistic_idx(rng, n, m, k=27, miss=0.45):
    """Monotonic-per-offset index map like a sorted-coord kernel map."""
    idx = np.zeros((1, m, k), np.int32)
    for o in range(k):
        # monotone map out->in with jitter, ~miss fraction of misses
        base = np.sort(rng.randint(0, n, m))
        is_miss = rng.rand(m) < miss
        idx[0, :, o] = np.where(is_miss, n, base)
    return idx


def main():
    import jax
    import jax.numpy as jnp

    from fcaf3d_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    from fcaf3d_tpu.ops.sparse.conv import _gather_gemm_fwd_impl
    from fcaf3d_tpu.ops.sparse.gather_kernel import fused_gather_gemm

    rng = np.random.RandomState(0)

    def bench(fn, feats, idx, w, iters=20):
        def many(feats, idx, w):
            def body(c, _):
                out = fn(feats + c * 1e-30, idx, w)
                return c + jnp.sum(out).astype(jnp.float32) * 1e-30 + 1e-6, None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c

        jm = jax.jit(many)
        r = jm(feats, idx, w)
        r.block_until_ready()
        t0 = time.perf_counter()
        r = jm(feats, idx, w)
        r.block_until_ready()
        return (time.perf_counter() - t0) / iters * 1e3

    shapes = [
        ("conv1 98k->64k C3->64", 98304, 65536, 3, 64),
        ("stage  24k C64", 24576, 24576, 64, 64),
        ("stage  32k C64", 32768, 32768, 64, 64),
        ("neck   65k C128->64", 65536, 65536, 128, 64),
        ("stage   8k C128", 8192, 8192, 128, 128),
    ]
    for name, n, m, cin, cout in shapes:
        feats = jnp.asarray(rng.randn(1, n, cin).astype(np.float32)).astype(jnp.bfloat16)
        idx = jnp.asarray(realistic_idx(rng, n, m))
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1).astype(jnp.bfloat16)
        txla = bench(lambda f, i, ww: _gather_gemm_fwd_impl(f, i, ww, 3), feats, idx, w)
        tpal = bench(lambda f, i, ww: fused_gather_gemm(f, i, ww), feats, idx, w)
        # correctness spot check
        o1 = np.asarray(_gather_gemm_fwd_impl(feats, idx, w, 3), np.float32)
        o2 = np.asarray(fused_gather_gemm(feats, idx, w), np.float32)
        err = np.max(np.abs(o1 - o2)) / (np.max(np.abs(o1)) + 1e-9)
        print(f"{name:26s} xla {txla:7.2f} ms   pallas {tpal:7.2f} ms   "
              f"speedup {txla / tpal:5.2f}x   relerr {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
