"""Fused conv-epilogue (folded BN affine + activation + residual) vs the
unfused XLA formulation, kernel-level, interpret mode (fast lane)."""
import jax.numpy as jnp
import numpy as np
import pytest

from fcaf3d_tpu.ops.sparse.gather_kernel import apply_epilogue, fused_gather_gemm


@pytest.mark.parametrize("act", [None, "relu", "elu"])
@pytest.mark.parametrize("with_add", [False, True])
def test_epilogue_kernel_matches_xla(act, with_add):
    rng = np.random.default_rng(0)
    b, n, m, k, c, e = 2, 600, 512, 9, 64, 128
    feats = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    idx = jnp.sort(
        jnp.asarray(rng.integers(0, n + 1, size=(b, m, k)).astype(np.int32)),
        axis=1,
    )  # near-monotone columns, misses included
    w = jnp.asarray(rng.normal(size=(k, c, e)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.normal(size=(e,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(e,)).astype(np.float32))
    vmask = jnp.asarray(rng.integers(0, 2, size=(b, m)).astype(bool))
    add = (
        jnp.asarray(rng.normal(size=(b, m, e)).astype(np.float32))
        if with_add
        else None
    )

    base = fused_gather_gemm(feats, idx, w, interpret=False)  # XLA fallback
    ref = apply_epilogue(base, scale, shift, act, vmask=vmask, add=add)
    got = fused_gather_gemm(
        feats, idx, w, interpret=True,
        scale=scale, shift=shift, act=act, vmask=vmask, add=add,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_epilogue_dead_tiles_get_shift():
    """A tile with zero kernel-map hits must still produce the folded-BN
    value act(shift) on valid rows (a real all-miss k1 strided-conv row),
    and zero on padding rows."""
    b, n, m, k, c, e = 1, 256, 256, 1, 64, 64
    feats = jnp.ones((b, n, c), jnp.float32)
    idx = jnp.full((b, m, k), n, jnp.int32)  # all miss
    w = jnp.ones((k, c, e), jnp.float32)
    scale = jnp.full((e,), 2.0, jnp.float32)
    shift = jnp.full((e,), -0.5, jnp.float32)
    vmask = jnp.asarray(np.arange(m) % 2 == 0).reshape(1, m)
    got = fused_gather_gemm(
        feats, idx, w, interpret=True,
        scale=scale, shift=shift, act="elu", vmask=vmask,
    )
    expect_valid = float(np.exp(-0.5) - 1.0)
    got = np.asarray(got)
    np.testing.assert_allclose(got[0, ::2], expect_valid, rtol=1e-5)
    np.testing.assert_allclose(got[0, 1::2], 0.0, atol=0)
