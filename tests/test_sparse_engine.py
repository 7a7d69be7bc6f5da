"""Sparse engine correctness vs a dense-convolution oracle on small grids."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcaf3d_tpu.ops.sparse import (
    SENTINEL,
    SparseTensor,
    encode_coords,
    generative_transpose_conv2x2,
    interpolate_at,
    lookup,
    sparse_add_into,
    sparse_conv,
    sparse_max_pool,
    sparse_prune,
    voxelize,
    voxelize_reduce,
)

pytestmark = pytest.mark.slow  # model/engine compile-heavy (two-lane suite)


def make_sparse(occ_list, feats_list, capacity, stride=1, channels=2):
    """Build a SparseTensor from per-sample lists of (coords [n,3], feats [n,C])."""
    b = len(occ_list)
    coords = np.full((b, capacity, 3), 2047, np.int32)
    feats = np.zeros((b, capacity, channels), np.float32)
    for i, (cc, ff) in enumerate(zip(occ_list, feats_list)):
        n = len(cc)
        coords[i, :n] = cc
        feats[i, :n] = ff
    coords = jnp.asarray(coords)
    feats = jnp.asarray(feats)
    keys = encode_coords(coords)
    order = jnp.argsort(keys, axis=-1, stable=True)
    coords = jnp.take_along_axis(coords, order[..., None], axis=1)
    feats = jnp.take_along_axis(feats, order[..., None], axis=1)
    keys = jnp.take_along_axis(keys, order, axis=1)
    return SparseTensor(
        coords=coords,
        feats=feats,
        keys=keys,
        shift=jnp.zeros((b, 3), jnp.int32),
        stride=stride,
    )


def to_dense(st, size, channels):
    """Scatter a (stride-1 lattice) sparse tensor into [B, size, size, size, C]."""
    out = np.zeros((st.batch_size, size, size, size, channels), np.float32)
    coords = np.asarray(st.coords)
    feats = np.asarray(st.feats)
    valid = np.asarray(st.valid)
    for b in range(st.batch_size):
        for i in range(st.capacity):
            if valid[b, i]:
                x, y, z = coords[b, i] // st.stride
                out[b, x, y, z] = feats[b, i]
    return out


def rand_occupancy(rng, size, p=0.4):
    grid = rng.rand(size, size, size) < p
    coords = np.argwhere(grid).astype(np.int32)
    return coords


def dense_conv_oracle(dense, w_dense, stride=1):
    """lax 3D conv with SAME-style padding 1, kernel 3."""
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense),
        jnp.asarray(w_dense),  # [3,3,3,Cin,Cout]
        window_strides=(stride, stride, stride),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
    )
    return np.asarray(out)


def test_voxelize_dedup_first_and_positions():
    pts = np.array(
        [
            [
                [0.005, 0.005, 0.005],  # voxel (0,0,0)
                [0.009, 0.001, 0.002],  # duplicate of voxel (0,0,0)
                [0.015, 0.0, 0.0],  # voxel (1,0,0)
                [-0.02, 0.0, 0.0],  # voxel (-2,0,0)
            ]
        ],
        np.float32,
    )
    feats = np.arange(8, dtype=np.float32).reshape(1, 4, 2)
    valid = np.ones((1, 4), bool)
    st = voxelize(jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(valid), 0.01, 8)
    assert int(st.num_valid()[0]) == 3
    # first occurrence kept for the duplicated voxel
    got = np.asarray(st.feats)[0][np.asarray(st.valid)[0]]
    rows = {tuple(r) for r in got.tolist()}
    assert (0.0, 1.0) in rows and (2.0, 3.0) not in rows
    # positions round-trip to the quantized corners
    pos = np.asarray(st.positions(0.01))[0][np.asarray(st.valid)[0]]
    expect = {(-0.02, 0.0, 0.0), (0.0, 0.0, 0.0), (0.01, 0.0, 0.0)}
    got_pos = {tuple(round(float(v), 6) for v in p) for p in pos}
    assert got_pos == expect


@pytest.mark.parametrize("reduce", ["mean", "max"])
def test_voxelize_reduce_matches_numpy_oracle(reduce):
    """dynamic_scatter semantics (reference `ops/voxel/scatter_points.py`):
    every valid point contributes; voxel feature = mean/max over its points."""
    rng = np.random.RandomState(3)
    pts = rng.uniform(-0.5, 0.5, (2, 64, 3)).astype(np.float32)
    feats = rng.randn(2, 64, 4).astype(np.float32)
    valid = rng.rand(2, 64) < 0.8
    st = voxelize_reduce(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(valid), 0.05, 256,
        reduce=reduce)
    for b in range(2):
        vox = np.floor(pts[b] / 0.05).astype(np.int64)
        groups = {}
        for i in range(64):
            if valid[b, i]:
                groups.setdefault(tuple(vox[i]), []).append(feats[b, i])
        assert int(st.num_valid()[b]) == len(groups)
        pos = np.asarray(st.positions(0.05))[b]
        got = np.asarray(st.feats)[b]
        ok = np.asarray(st.valid)[b]
        for r in np.where(ok)[0]:
            key = tuple(np.round(pos[r] / 0.05).astype(np.int64))
            members = np.stack(groups[key])
            want = members.mean(0) if reduce == "mean" else members.max(0)
            np.testing.assert_allclose(got[r], want, rtol=1e-5, atol=1e-5)


def test_voxelize_reduce_overflow_telemetry():
    pts = np.linspace(0, 1, 32).reshape(1, 32, 1) * np.ones((1, 32, 3), np.float32)
    st = voxelize_reduce(
        jnp.asarray(pts, jnp.float32), jnp.ones((1, 32, 2), jnp.float32),
        jnp.ones((1, 32), bool), 0.01, budget=8, reduce="mean")
    assert int(st.dropped[0]) > 0
    assert int(st.num_valid()[0]) == 8


def test_lookup_hits_and_misses():
    st = make_sparse([np.array([[1, 2, 3], [4, 5, 6]])], [np.zeros((2, 2))], 4)
    q = encode_coords(jnp.asarray([[[1, 2, 3], [9, 9, 9], [4, 5, 6]]]))
    idx = np.asarray(lookup(st.keys, q))[0]
    keys = np.asarray(st.keys[0])
    assert keys[idx[0]] == np.asarray(encode_coords(jnp.asarray([1, 2, 3])))
    assert idx[1] == 4  # miss -> capacity
    assert keys[idx[2]] == np.asarray(encode_coords(jnp.asarray([4, 5, 6])))


@pytest.mark.parametrize("seed", [0, 1])
def test_sparse_conv_s1_matches_dense(seed):
    rng = np.random.RandomState(seed)
    size, cin, cout = 6, 3, 4
    occ = rand_occupancy(rng, size)
    feats = rng.randn(len(occ), cin).astype(np.float32)
    st = make_sparse([occ], [feats], capacity=len(occ) + 5, channels=cin)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.2

    out = sparse_conv(st, jnp.asarray(w), kernel_size=3, stride=1)
    dense_in = to_dense(st, size, cin)
    # kernel_offsets order: itertools.product over (x,y,z) -> reshape (3,3,3)
    w_dense = w.reshape(3, 3, 3, cin, cout)
    oracle = dense_conv_oracle(dense_in, w_dense)

    got = to_dense(out, size, cout)
    mask = np.abs(dense_in).sum(-1, keepdims=True) > 0  # occupied voxels only
    np.testing.assert_allclose(got, oracle * mask, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_sparse_conv_s2_matches_dense(seed):
    rng = np.random.RandomState(seed)
    size, cin, cout = 6, 2, 3
    occ = rand_occupancy(rng, size)
    feats = rng.randn(len(occ), cin).astype(np.float32)
    st = make_sparse([occ], [feats], capacity=len(occ) + 5, channels=cin)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.2

    out = sparse_conv(st, jnp.asarray(w), kernel_size=3, stride=2, out_budget=64)
    assert out.stride == 2
    dense_in = to_dense(st, size, cin)
    oracle = dense_conv_oracle(dense_in, w.reshape(3, 3, 3, cin, cout), stride=2)

    # occupied output coords = unique(floor(c/2)) over occupied inputs
    occ_down = np.unique(occ // 2, axis=0)
    got = to_dense(out, size // 2, cout)
    assert int(out.num_valid()[0]) == len(occ_down)
    for c in occ_down:
        np.testing.assert_allclose(
            got[0, c[0], c[1], c[2]], oracle[0, c[0], c[1], c[2]], atol=1e-4
        )


def test_sparse_conv_k1_is_linear():
    rng = np.random.RandomState(0)
    occ = np.array([[0, 0, 0], [2, 3, 1]], np.int32)
    feats = rng.randn(2, 3).astype(np.float32)
    st = make_sparse([occ], [feats], 4, channels=3)
    w = rng.randn(1, 3, 5).astype(np.float32)
    out = sparse_conv(st, jnp.asarray(w), kernel_size=1)
    got = np.asarray(out.feats)[0][np.asarray(out.valid)[0]]
    expect = feats @ w[0]
    # rows sorted by key; sort both by sum for comparison
    np.testing.assert_allclose(
        sorted(got.sum(1)), sorted(expect.sum(1)), atol=1e-5
    )


def test_max_pool_matches_dense():
    rng = np.random.RandomState(3)
    size, c = 4, 2
    occ = rand_occupancy(rng, size, p=0.6)
    feats = rng.randn(len(occ), c).astype(np.float32)
    st = make_sparse([occ], [feats], capacity=len(occ) + 3, channels=c)
    out = sparse_max_pool(st, 2, 2, out_budget=32)

    dense = to_dense(st, size, c)
    occ_mask = (np.abs(dense).sum(-1, keepdims=True) > 0).astype(np.float32)
    dense = np.where(occ_mask > 0, dense, -np.inf)
    got = to_dense(out, size // 2, c)
    occ_down = np.unique(occ // 2, axis=0)
    for cd in occ_down:
        window = dense[0, 2 * cd[0] : 2 * cd[0] + 2, 2 * cd[1] : 2 * cd[1] + 2,
                       2 * cd[2] : 2 * cd[2] + 2].reshape(-1, c)
        np.testing.assert_allclose(
            got[0, cd[0], cd[1], cd[2]], window.max(0), atol=1e-6
        )


def test_generative_transpose():
    rng = np.random.RandomState(0)
    occ = np.array([[0, 0, 0], [2, 2, 2]], np.int32) * 2  # stride-2 lattice
    feats = rng.randn(2, 3).astype(np.float32)
    st = make_sparse([occ], [feats], 4, stride=2, channels=3)
    w = rng.randn(8, 3, 4).astype(np.float32)
    out = generative_transpose_conv2x2(st, jnp.asarray(w))
    assert out.stride == 1
    assert int(out.num_valid()[0]) == 16  # 8 children per parent
    coords = np.asarray(out.coords)[0][np.asarray(out.valid)[0]]
    feats_out = np.asarray(out.feats)[0][np.asarray(out.valid)[0]]
    # each child of parent p at offset o has feats[p] @ w[o]
    for cc, ff in zip(coords, feats_out):
        parent = (cc // 2) * 2
        pi = 0 if (parent == 0).all() else 1
        off = cc - parent
        k = off[0] * 4 + off[1] * 2 + off[2]
        np.testing.assert_allclose(ff, feats[pi] @ w[k], atol=1e-5)


def test_sparse_add_into():
    occ_a = np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2]], np.int32)
    occ_b = np.array([[1, 1, 1]], np.int32)
    a = make_sparse([occ_a], [np.ones((3, 2))], 4)
    bb = make_sparse([occ_b], [np.full((1, 2), 5.0)], 2)
    out = sparse_add_into(a, bb)
    feats = np.asarray(out.feats)[0]
    coords = np.asarray(out.coords)[0]
    for cc, ff in zip(coords, feats):
        if (cc == 1).all():
            np.testing.assert_allclose(ff, [6.0, 6.0])
        elif (cc < 2047).all():
            np.testing.assert_allclose(ff, [1.0, 1.0])


def test_sparse_prune_topk():
    occ = np.array([[i, 0, 0] for i in range(6)], np.int32)
    feats = np.arange(12, dtype=np.float32).reshape(6, 2)
    st = make_sparse([occ], [feats], 8)
    scores = jnp.asarray(np.array([[0.1, 0.9, 0.5, 0.8, 0.2, 0.3, -1, -1]]))
    # NOTE: scores align with sorted rows: coords sorted by key = x ascending
    out = sparse_prune(st, scores, budget=3)
    assert int(out.num_valid()[0]) == 3
    kept_x = sorted(np.asarray(out.coords)[0][np.asarray(out.valid)[0]][:, 0].tolist())
    assert kept_x == [1, 2, 3]  # top-3 scores at x=1,3,2 -> sorted by key


def test_interpolate_at_trilinear():
    # stride-2 lattice with two occupied voxels along x
    occ = np.array([[0, 0, 0], [2, 0, 0]], np.int32)
    feats = np.array([[1.0, 0.0], [3.0, 0.0]], np.float32)
    st = make_sparse([occ], [feats], 4, stride=2)
    q = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [3.0, 0.0, 0.0]]])
    out = np.asarray(interpolate_at(st, q))[0]
    np.testing.assert_allclose(out[0, 0], 2.0, atol=1e-5)  # midpoint
    np.testing.assert_allclose(out[1, 0], 1.0, atol=1e-5)  # exact hit
    np.testing.assert_allclose(out[2, 0], 1.5, atol=1e-5)  # half toward missing


def test_gather_gemm_gradients():
    rng = np.random.RandomState(0)
    occ = rand_occupancy(rng, 4, p=0.5)
    cin, cout = 2, 3
    feats = rng.randn(len(occ), cin).astype(np.float32)
    st = make_sparse([occ], [feats], len(occ) + 2, channels=cin)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.3)

    def loss_fn(w_, f_):
        stl = st.with_feats(f_)
        out = sparse_conv(stl, w_, 3)
        return jnp.sum(out.feats ** 2)

    g_w, g_f = jax.grad(loss_fn, argnums=(0, 1))(w, st.feats)
    # compare with numerical gradient on a few entries
    eps = 1e-3
    for idx in [(0, 0, 0), (13, 1, 2), (26, 0, 1)]:
        w_p = w.at[idx].add(eps)
        w_m = w.at[idx].add(-eps)
        num = (loss_fn(w_p, st.feats) - loss_fn(w_m, st.feats)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g_w[idx]), np.asarray(num), rtol=2e-2, atol=1e-3)
    f = st.feats
    for idx in [(0, 0, 0), (0, 1, 1)]:
        f_p = f.at[idx].add(eps)
        f_m = f.at[idx].add(-eps)
        num = (loss_fn(w, f_p) - loss_fn(w, f_m)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g_f[idx]), np.asarray(num), rtol=2e-2, atol=1e-3)


def test_gen_conv_plan_matches_generic_kmap():
    """conv3 on a parent-major generated map with the analytic kernel map
    must equal conv3 on the sorted generated map with the generic kmap."""
    from fcaf3d_tpu.ops.sparse import gen_conv_plan
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    parents = rng.choice(5 * 5 * 5, size=12, replace=False)
    pc = np.stack(np.unravel_index(parents, (5, 5, 5)), 1).astype(np.int32) * 2
    pf = rng.randn(12, 3).astype(np.float32)
    parent = make_sparse([pc], [pf], capacity=16, stride=2, channels=3)

    wt = jnp.asarray(rng.randn(8, 3, 4).astype(np.float32))
    gen_unsorted = generative_transpose_conv2x2(parent, wt, sort_output=False)
    gen_sorted = generative_transpose_conv2x2(parent, wt, sort_output=True)

    w3 = jnp.asarray(rng.randn(27, 4, 5).astype(np.float32) * 0.2)
    plan = gen_conv_plan(parent, gen_unsorted)
    out_a = sparse_conv(gen_unsorted, w3, 3, plan=plan)
    out_b = sparse_conv(gen_sorted, w3, 3)

    # compare by coordinate
    def collect(stl):
        coords = np.asarray(stl.coords)[0][np.asarray(stl.valid)[0]]
        feats = np.asarray(stl.feats)[0][np.asarray(stl.valid)[0]]
        return {tuple(c): f for c, f in zip(coords.tolist(), feats)}

    da, db = collect(out_a), collect(out_b)
    assert set(da) == set(db) and len(da) == 12 * 8
    for k in da:
        np.testing.assert_allclose(da[k], db[k], atol=1e-4)


def test_gen_gather_gemm_matches_plan_conv():
    """Block-gather gen conv == analytic-plan conv, values and gradients."""
    from fcaf3d_tpu.ops.sparse import gen_conv_plan
    from fcaf3d_tpu.ops.sparse.conv import (
        build_kernel_map, gen_gather_gemm, kernel_offsets)
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    parents = rng.choice(6 * 6 * 6, size=20, replace=False)
    pc = np.stack(np.unravel_index(parents, (6, 6, 6)), 1).astype(np.int32) * 2
    pf = rng.randn(20, 4).astype(np.float32)
    parent = make_sparse([pc], [pf], capacity=24, stride=2, channels=4)
    wt = jnp.asarray(rng.randn(8, 4, 4).astype(np.float32))
    gen = generative_transpose_conv2x2(parent, wt, sort_output=False)
    w3 = jnp.asarray(rng.randn(27, 4, 5).astype(np.float32) * 0.2)

    plan = gen_conv_plan(parent, gen)
    ref_out = sparse_conv(gen, w3, 3, plan=plan)
    pk = build_kernel_map(parent.keys, parent.coords, kernel_offsets(3, parent.stride))
    got = gen_gather_gemm(gen.feats, pk, w3, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_out.feats),
                               atol=1e-4)

    # gradients agree with autodiff through the plan path
    def loss_a(f, w):
        return jnp.sum(gen_gather_gemm(f, pk, w, 8) ** 2)

    def loss_b(f, w):
        from fcaf3d_tpu.ops.sparse.conv import gather_gemm
        return jnp.sum(gather_gemm(f, plan[2], w, 3) ** 2)

    ga = jax.grad(loss_a, argnums=(0, 1))(gen.feats, w3)
    gb = jax.grad(loss_b, argnums=(0, 1))(gen.feats, w3)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]), atol=1e-3)


def test_overflow_telemetry():
    """Budget overflow is observable: voxelize/downsample report dropped
    counts (the reference's dynamic maps never drop — nonzero flags a
    miscalibrated budget; VERDICT r1 'silent capacity overflow')."""
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(0, 0.1, (1, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, 64, 2).astype(np.float32))
    valid = jnp.ones((1, 64), bool)
    # 0.01 voxels over a 0.1m cube: ~50+ unique voxels, budget 16 -> drops
    st_small = voxelize(pts, feats, valid, 0.01, 16)
    st_big = voxelize(pts, feats, valid, 0.01, 64)
    n_unique = int(st_big.num_valid()[0])
    assert int(st_small.dropped[0]) == n_unique - 16 > 0
    assert int(st_big.dropped[0]) == 0

    # strided conv overflow propagates to the output tensor
    w = jnp.asarray(rng.randn(27, 2, 2).astype(np.float32) * 0.1)
    out = sparse_conv(st_big, w, 3, stride=2, out_budget=4)
    assert int(out.dropped[0]) > 0
    out_ok = sparse_conv(st_big, w, 3, stride=2, out_budget=64)
    assert int(out_ok.dropped[0]) == 0


def test_overflow_reaches_train_metrics():
    """overflow_max surfaces in train-step metrics via the 'overflow' sow."""
    from fcaf3d_tpu.configs import fcaf3d_tiny
    from fcaf3d_tpu.train import create_train_state, make_optimizer, make_train_step
    import dataclasses
    from tests.test_fcaf3d_model import synth_batch

    cfg = dataclasses.replace(fcaf3d_tiny(), input_budget=32)  # force overflow
    tx = make_optimizer(lr=1e-3, steps_per_epoch=10)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx)
    step = make_train_step(model, cfg, tx)
    pts, colors, valid, boxes, labels, gt_valid = synth_batch(np.random.RandomState(0))
    batch = {"points": pts, "colors": colors, "valid": valid,
             "gt_boxes": boxes, "gt_labels": labels, "gt_valid": gt_valid}
    _, metrics = step(state, batch)
    assert int(metrics["overflow_max"]) > 0
