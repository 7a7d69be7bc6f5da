"""PointNet++ op tests vs numpy brute-force oracles."""
import jax.numpy as jnp
import numpy as np

from fcaf3d_tpu.ops.pointnet import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    knn,
    three_interpolate,
    three_nn,
)


def test_fps_spreads_points():
    # two well-separated clusters: FPS with k=2 must pick one from each
    rng = np.random.RandomState(0)
    a = rng.randn(10, 3) * 0.1
    b = rng.randn(10, 3) * 0.1 + 10.0
    pts = jnp.asarray(np.concatenate([a, b])[None].astype(np.float32))
    idx = np.asarray(furthest_point_sample(pts, 2))[0]
    assert (idx[0] < 10) != (idx[1] < 10)


def test_fps_starts_at_first_valid():
    pts = jnp.asarray(np.random.RandomState(0).randn(1, 8, 3).astype(np.float32))
    valid = jnp.asarray(np.array([[False, False, True, True, True, True, True, True]]))
    idx = np.asarray(furthest_point_sample(pts, 4, valid))[0]
    assert idx[0] == 2
    assert all(i >= 2 for i in idx)


def test_ball_query_radius_and_padding():
    pts = jnp.asarray(
        np.array([[[0, 0, 0], [0.1, 0, 0], [5, 5, 5], [0.05, 0.05, 0]]], np.float32)
    )
    centers = jnp.asarray(np.array([[[0, 0, 0]]], np.float32))
    idx = np.asarray(ball_query(centers, pts, radius=0.3, nsample=4))[0, 0]
    # neighbors are 0, 1, 3 (ascending index), padded with first (0)
    assert idx.tolist() == [0, 1, 3, 0]


def test_group_and_gather():
    feats = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    idx = jnp.asarray(np.array([[2, 0]], np.int32))
    g = np.asarray(gather_points(feats, idx))
    np.testing.assert_array_equal(g[0, 0], [6, 7, 8])
    idx2 = jnp.asarray(np.array([[[1, 1], [3, 0]]], np.int32))
    g2 = np.asarray(group_points(feats, idx2))
    np.testing.assert_array_equal(g2[0, 1, 0], [9, 10, 11])


def test_knn_and_three_nn():
    rng = np.random.RandomState(1)
    pts = rng.randn(1, 30, 3).astype(np.float32)
    q = rng.randn(1, 5, 3).astype(np.float32)
    idx = np.asarray(knn(jnp.asarray(q), jnp.asarray(pts), 3))
    d_all = np.linalg.norm(q[0][:, None] - pts[0][None], axis=-1)
    expect = np.argsort(d_all, axis=-1)[:, :3]
    np.testing.assert_array_equal(np.sort(idx[0]), np.sort(expect))

    dist, idx3 = three_nn(jnp.asarray(q), jnp.asarray(pts))
    np.testing.assert_allclose(
        np.asarray(dist)[0], np.sort(d_all, axis=-1)[:, :3], atol=1e-5
    )


def test_three_interpolate_exact_hit():
    pts = jnp.asarray(np.array([[[0, 0, 0], [1, 0, 0], [2, 0, 0]]], np.float32))
    feats = jnp.asarray(np.array([[[1.0], [2.0], [3.0]]], np.float32))
    q = jnp.asarray(np.array([[[1.0, 0, 0], [0.5, 0, 0]]], np.float32))
    dist, idx = three_nn(q, pts)
    out = np.asarray(three_interpolate(feats, idx, dist))
    np.testing.assert_allclose(out[0, 0, 0], 2.0, atol=1e-3)  # exact hit
    assert 1.0 < out[0, 1, 0] < 2.0  # between points 0 and 1


def test_fps_pallas_matches_xla_loop():
    """fps_kernel (interpret mode) selects the exact same indices as the
    XLA fori_loop formulation, including validity masking and the
    first-occurrence tie-break."""
    from fcaf3d_tpu.ops.pointnet.fps_kernel import fps_tpu

    rng = np.random.RandomState(7)
    b, n, s = 2, 300, 17
    pts = rng.randn(b, n, 3).astype(np.float32)
    pts[1, 5] = pts[1, 3]  # exact duplicate -> tie-break path
    valid = np.ones((b, n), bool)
    valid[0, :4] = False  # start index differs from 0
    valid[1, 150:] = False

    ref = np.asarray(furthest_point_sample(
        jnp.asarray(pts), s, jnp.asarray(valid)))
    got = np.asarray(fps_tpu(jnp.asarray(pts), s, jnp.asarray(valid),
                             interpret=True))
    np.testing.assert_array_equal(got, ref)


def _brute_ball_query_np(centers, pts, radius, nsample):
    """Numpy oracle with the reference CUDA semantics (exact d2, first
    nsample hits in ascending index order, pad with first, no-hit -> 0)."""
    b, m = centers.shape[:2]
    out = np.zeros((b, m, nsample), np.int32)
    for bi in range(b):
        for mi in range(m):
            d2 = ((pts[bi].astype(np.float64)
                   - centers[bi, mi].astype(np.float64)) ** 2).sum(-1)
            hits = np.where(d2 < radius * radius)[0][:nsample]
            if len(hits):
                row = np.full(nsample, hits[0], np.int32)
                row[:len(hits)] = hits
                out[bi, mi] = row
    return out


def test_ball_query_grid_matches_oracle():
    """Grid-bucketed path (XLA formulation off-TPU) == brute oracle, away
    from the r^2 floating-point boundary."""
    from fcaf3d_tpu.ops.pointnet.ballq_kernel import ball_query_grid

    rng = np.random.RandomState(0)
    pts = rng.uniform(0, 3, (2, 800, 3)).astype(np.float32)
    cent = pts[:, :96]
    idx, overflow = ball_query_grid(
        jnp.asarray(cent), jnp.asarray(pts), 0.35, 16)
    idx = np.asarray(idx)
    assert int(overflow) <= 0
    expect = _brute_ball_query_np(cent, pts, 0.35, 16)
    bad = 0
    for bi, mi in zip(*np.where((idx != expect).any(-1))):
        d2 = ((pts[bi].astype(np.float64)
               - cent[bi, mi].astype(np.float64)) ** 2).sum(-1)
        disputed = set(idx[bi, mi]) ^ set(expect[bi, mi])
        # only f32-boundary points may legitimately differ
        bad += any(abs(d2[i] - 0.35 ** 2) > 1e-5 for i in disputed)
    assert bad == 0


def test_ball_query_grid_respects_valid_mask():
    from fcaf3d_tpu.ops.pointnet.ballq_kernel import ball_query_grid

    rng = np.random.RandomState(1)
    pts = rng.uniform(0, 2, (1, 400, 3)).astype(np.float32)
    valid = rng.uniform(size=(1, 400)) < 0.5
    cent = pts[:, :32]
    idx, _ = ball_query_grid(
        jnp.asarray(cent), jnp.asarray(pts), 0.4, 8, jnp.asarray(valid))
    idx = np.asarray(idx)
    vmask = valid[0]
    for mi in range(32):
        d2 = ((pts[0] - cent[0, mi]) ** 2).sum(-1)
        hit_any = (d2 < 0.16) & vmask
        for j in idx[0, mi]:
            if hit_any.any():
                assert vmask[j], (mi, j)


def test_ball_query_grid_pallas_interpret_matches_xla():
    """The Pallas extraction kernel (interpret mode) reproduces the XLA
    formulation exactly on a small cloud."""
    from fcaf3d_tpu.ops.pointnet.ballq_kernel import ball_query_grid

    rng = np.random.RandomState(2)
    pts = jnp.asarray(rng.uniform(0, 2.5, (1, 600, 3)).astype(np.float32))
    cent = pts[:, :64]
    idx_xla, _ = ball_query_grid(cent, pts, 0.3, 8, interpret=False)
    idx_pl, _ = ball_query_grid(cent, pts, 0.3, 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_xla), np.asarray(idx_pl))
