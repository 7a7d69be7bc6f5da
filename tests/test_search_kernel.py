"""Pallas searchsorted kernel vs jnp.searchsorted (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcaf3d_tpu.ops.sparse.search import T_QUERIES, searchsorted_segments

pytestmark = pytest.mark.slow  # model/engine compile-heavy (two-lane suite)


def oracle(keys, queries):
    return jax.vmap(lambda k, q: jnp.searchsorted(k, q, side="left"))(
        keys, queries.reshape(keys.shape[0], -1)
    ).reshape(queries.shape)


@pytest.mark.parametrize("n,m,segs", [(300, T_QUERIES, 2), (5000, 3 * T_QUERIES, 1)])
def test_searchsorted_kernel_interpret(n, m, segs):
    rng = np.random.RandomState(0)
    b = 2
    keys = np.sort(rng.randint(0, 2**31, (b, n)).astype(np.uint32), axis=1)
    # sorted segments with some sentinel padding (like kmap queries)
    q = np.sort(rng.randint(0, 2**31, (b, segs, m)).astype(np.uint32), axis=-1)
    q[:, :, -5:] = 0xFFFFFFFF

    got = np.asarray(searchsorted_segments(
        jnp.asarray(keys), jnp.asarray(q), interpret=True))
    expect = np.asarray(oracle(jnp.asarray(keys), jnp.asarray(q)))
    np.testing.assert_array_equal(got, expect)


def test_searchsorted_kernel_unsorted_segments_still_correct():
    rng = np.random.RandomState(1)
    b, n, m = 1, 2000, T_QUERIES
    keys = np.sort(rng.randint(0, 2**31, (b, n)).astype(np.uint32), axis=1)
    q = rng.randint(0, 2**31, (b, 1, m)).astype(np.uint32)  # NOT sorted
    got = np.asarray(searchsorted_segments(
        jnp.asarray(keys), jnp.asarray(q), interpret=True))
    expect = np.asarray(oracle(jnp.asarray(keys), jnp.asarray(q)))
    np.testing.assert_array_equal(got, expect)


def test_searchsorted_kernel_exact_hits_and_duplicates():
    b = 1
    keys = np.array([[1, 5, 5, 5, 9, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF]],
                    np.uint32)
    q = np.zeros((b, 1, T_QUERIES), np.uint32)
    q[0, 0, :6] = [0, 1, 5, 6, 9, 10]
    q[0, 0, 6:] = 0xFFFFFFFF
    got = np.asarray(searchsorted_segments(
        jnp.asarray(keys), jnp.asarray(q), interpret=True))[0, 0, :6]
    np.testing.assert_array_equal(got, [0, 0, 1, 4, 4, 5])


@pytest.mark.parametrize("n,m,segs", [(300, T_QUERIES, 2), (5000, 2 * T_QUERIES, 1)])
def test_searchsorted_kernel_with_miss(n, m, segs):
    """with_miss=True must equal searchsorted + hit-check (the old lookup)."""
    rng = np.random.RandomState(2)
    b = 2
    keys = np.sort(rng.randint(0, 2**31, (b, n)).astype(np.uint32), axis=1)
    # mix of guaranteed hits (drawn from keys) and random (mostly misses)
    q = np.sort(rng.randint(0, 2**31, (b, segs, m)).astype(np.uint32), axis=-1)
    hits = keys[:, rng.randint(0, n, m)].reshape(b, 1, m)
    take = rng.rand(b, segs, m) < 0.5
    q = np.where(take, np.broadcast_to(np.sort(hits, -1), q.shape), q)
    q[:, :, -5:] = 0xFFFFFFFF

    got = np.asarray(searchsorted_segments(
        jnp.asarray(keys), jnp.asarray(q), interpret=True, with_miss=True))
    pos = np.asarray(oracle(jnp.asarray(keys), jnp.asarray(q)))
    safe = np.minimum(pos, n - 1)
    hit = (np.take_along_axis(keys[:, None, :].repeat(segs, 1).reshape(b, segs, n),
                              safe, axis=2) == q) & (q != 0xFFFFFFFF)
    expect = np.where(hit, safe, n)
    np.testing.assert_array_equal(got, expect)


def test_fused_gather_gemm_interpret():
    """Fused conv kernel == XLA gather+GEMM (interpret mode)."""
    from fcaf3d_tpu.ops.sparse.conv import gather_gemm
    from fcaf3d_tpu.ops.sparse.gather_kernel import fused_gather_gemm

    rng = np.random.RandomState(0)
    b, n, m, k, c, e = 2, 700, 300, 27, 64, 32
    feats = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    base = np.sort(rng.randint(0, n, (b, m)), axis=1)
    idx = np.stack(
        [np.clip(base + rng.randint(-3, 4, (b, m)), 0, n - 1) for _ in range(k)],
        -1,
    )
    miss = rng.rand(b, m, k) < 0.2
    # all-miss tail: the padding rows past a scene's occupancy (budgets are
    # p95-calibrated) — whole tiles of these must be skipped AND zeroed
    miss[:, -120:, :] = True
    idx = jnp.asarray(np.where(miss, n, idx).astype(np.int32))
    w = jnp.asarray(rng.randn(k, c, e).astype(np.float32) * 0.1)

    ref = gather_gemm(feats, idx, w, 3)
    got = fused_gather_gemm(feats, idx, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)
    assert np.all(np.asarray(got)[:, -120:] == 0)


def test_fused_backward_matches_scatter_backward(monkeypatch):
    """dFeats via the inverted-map fused kernel == the XLA scatter-add
    backward, on a REAL conv kernel map (bijective per offset)."""
    import jax

    from fcaf3d_tpu.ops.sparse.conv import conv_plan, gather_gemm
    from fcaf3d_tpu.ops.sparse.tensor import SparseTensor, encode_coords, sort_rows

    rng = np.random.RandomState(2)
    # a sparse 10^3 occupancy -> sorted SparseTensor
    occ = np.argwhere(rng.rand(10, 10, 10) < 0.25).astype(np.int32) + 2
    n, cap, cin, cout = len(occ), 320, 8, 16
    coords = np.full((1, cap, 3), 2047, np.int32)
    coords[0, :n] = occ
    feats = np.zeros((1, cap, cin), np.float32)
    feats[0, :n] = rng.randn(n, cin)
    keys = np.asarray(encode_coords(jnp.asarray(coords)))
    c, f, k = sort_rows(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(keys))
    st = SparseTensor(coords=c, feats=f, keys=k,
                      shift=jnp.zeros((1, 3), jnp.int32))
    _, _, idx, _ = conv_plan(st, 3, 1)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    dout = jnp.asarray(rng.randn(1, cap, cout).astype(np.float32))

    def loss(feats_in, weight, sym=False):
        return jnp.sum(gather_gemm(feats_in, idx, weight, 3, True, sym) * dout)

    monkeypatch.setenv("FCAF3D_FUSED_BWD", "0")
    df_ref, dw_ref = jax.grad(loss, argnums=(0, 1))(st.feats, w)
    monkeypatch.setenv("FCAF3D_FUSED_BWD", "force")
    df_fus, dw_fus = jax.grad(loss, argnums=(0, 1))(st.feats, w)
    np.testing.assert_allclose(np.asarray(df_fus), np.asarray(df_ref),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dw_fus), np.asarray(dw_ref),
                               atol=2e-4, rtol=2e-4)
    # this IS a stride-1 self map, so the scatter-free offset-reversal
    # inverse (self_symmetric=True, what sparse_conv passes) must agree too
    df_sym, dw_sym = jax.grad(
        lambda f, ww: loss(f, ww, True), argnums=(0, 1))(st.feats, w)
    np.testing.assert_allclose(np.asarray(df_sym), np.asarray(df_ref),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dw_sym), np.asarray(dw_ref),
                               atol=2e-4, rtol=2e-4)


def test_gen_backward_adjoint_matches_scatter(monkeypatch):
    """gen_gather_gemm's adjoint backward (reversed offsets + transposed
    weights, no scatters) == the scatter backward, on a real symmetric
    parent self-map with padding parents and caller-style validity mask."""
    import jax

    from fcaf3d_tpu.ops.sparse.conv import (
        build_kernel_map,
        gen_gather_gemm,
        kernel_offsets,
    )
    from fcaf3d_tpu.ops.sparse.tensor import encode_coords, sort_rows

    rng = np.random.RandomState(4)
    occ = np.argwhere(rng.rand(6, 6, 6) < 0.3).astype(np.int32) * 2 + 4
    p_real, cap = len(occ), 96
    coords = np.full((1, cap, 3), 2047, np.int32)
    coords[0, :p_real] = occ
    keys = np.asarray(encode_coords(jnp.asarray(coords)))
    c_s, _, k_s = sort_rows(jnp.asarray(coords), None, jnp.asarray(keys))
    parent_idx = build_kernel_map(k_s, c_s, kernel_offsets(3, 2))  # [1, P, 27]

    cin, cout = 8, 16
    child_feats = jnp.asarray(rng.randn(1, 8 * cap, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    dout = rng.randn(1, 8 * cap, cout).astype(np.float32)
    # caller masks invalid children -> zero cotangents there
    valid_parent = np.asarray(k_s[0]) != np.uint32(0xFFFFFFFF)
    dout[0, ~np.repeat(valid_parent, 8)] = 0.0
    dout = jnp.asarray(dout)

    def loss(feats, weight):
        return jnp.sum(gen_gather_gemm(feats, parent_idx, weight) * dout)

    monkeypatch.setenv("FCAF3D_FUSED_BWD", "0")
    df_ref, dw_ref = jax.grad(loss, argnums=(0, 1))(child_feats, w)
    monkeypatch.setenv("FCAF3D_FUSED_BWD", "1")
    df_adj, dw_adj = jax.grad(loss, argnums=(0, 1))(child_feats, w)
    np.testing.assert_allclose(np.asarray(df_adj), np.asarray(df_ref),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dw_adj), np.asarray(dw_ref),
                               atol=2e-4, rtol=2e-4)


def test_gather_tuning_table(tmp_path, monkeypatch):
    """Per-signature tile table: exact-key hit, M power-of-two bucketing,
    env-var override precedence, and graceful fallback without a table."""
    import json

    from fcaf3d_tpu.ops.sparse import gather_kernel as gk

    table = {"64,64,27,32768": [128, 192, 1024]}
    path = tmp_path / "tune.json"
    path.write_text(json.dumps(table))
    monkeypatch.setenv("FCAF3D_GATHER_TUNE", str(path))
    monkeypatch.delenv("FCAF3D_GATHER_T", raising=False)
    monkeypatch.delenv("FCAF3D_GATHER_W", raising=False)
    gk._tuning_table.cache_clear()

    # M=27648 buckets up to 32768 -> table hit
    assert gk._tuned_params(64, 64, 27, 27648) == (128, 192, 1024)
    assert gk._tuned_params(64, 64, 27, 32768) == (128, 192, 1024)
    # different signature -> module defaults
    assert gk._tuned_params(128, 128, 27, 27648) == (
        gk.T_ROWS, gk.W_SUB, gk.W_BIG)
    # explicit env experiment beats the table
    monkeypatch.setenv("FCAF3D_GATHER_T", "512")
    assert gk._tuned_params(64, 64, 27, 27648) == (
        gk.T_ROWS, gk.W_SUB, gk.W_BIG)
    monkeypatch.delenv("FCAF3D_GATHER_T")

    # missing/corrupt table -> defaults, no crash
    monkeypatch.setenv("FCAF3D_GATHER_TUNE", str(tmp_path / "absent.json"))
    gk._tuning_table.cache_clear()
    assert gk._tuned_params(64, 64, 27, 27648) == (
        gk.T_ROWS, gk.W_SUB, gk.W_BIG)
    gk._tuning_table.cache_clear()


def test_fused_gather_dw_direct():
    """fused_gather_dw (interpret) == dense einsum oracle: multi-batch,
    channel/e padding, miss rows, non-divisor k_chunk forcing, random
    (non-monotone) maps (correctness never depends on span heuristics)."""
    from fcaf3d_tpu.ops.sparse.gather_kernel import fused_gather_dw

    rng = np.random.RandomState(11)
    b, n, m, k, cin, cout = 2, 200, 96, 9, 24, 40
    feats = jnp.asarray(rng.randn(b, n, cin).astype(np.float32))
    idx = rng.randint(0, n + 1, (b, m, k)).astype(np.int32)  # incl. misses
    idx.sort(axis=1)  # near-monotone columns like real maps
    idx = jnp.asarray(idx)
    dout = jnp.asarray(rng.randn(b, m, cout).astype(np.float32))

    fpad = jnp.concatenate([feats, jnp.zeros_like(feats[:, :1])], axis=1)
    g = jnp.take_along_axis(
        fpad, idx.reshape(b, -1)[..., None], axis=1).reshape(b, m, k, cin)
    ref = jnp.einsum("bmkc,bme->kce", g, dout)

    got = fused_gather_dw(feats, idx, dout, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
