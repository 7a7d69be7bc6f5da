"""PAConv assign_score_withk, anchor generators, hard voxelizer.

Golden values for assign_score_withk come from the reference's own op test
(`/root/reference/tests/test_models/test_common_modules/test_paconv_ops.py`
:10-114), parsed out of the file at runtime; an independent loop oracle
cross-checks random shapes including invalid neighbor indices.
"""
import ast
import os
import re

import numpy as np
import pytest

REF_PACONV_TEST = (
    "/root/reference/tests/test_models/test_common_modules/"
    "test_paconv_ops.py"
)


def _ref_literals(names):
    """Extract `<name> = torch.tensor([...])...` list literals."""
    with open(REF_PACONV_TEST) as f:
        src = f.read()
    out = {}
    for name in names:
        m = re.search(
            rf"{name} = torch\.tensor\(\s*(\[.*?\])\s*\)", src, re.DOTALL)
        assert m, name
        out[name] = np.asarray(ast.literal_eval(m.group(1)), np.float32)
    return out


def _assign_oracle(scores, points, centers, knn_idx):
    """Literal port of the CUDA forward semantics
    (`assign_score_withk_cuda.cu:48-79`)."""
    b, npoint, k, m = scores.shape
    n, o = points.shape[1], points.shape[3]
    out = np.zeros((b, o, npoint, k), np.float32)
    for bi in range(b):
        for ni in range(npoint):
            cn = knn_idx[bi, ni, 0]
            for ki in range(k):
                kn = knn_idx[bi, ni, ki]
                if kn < 0 or kn >= n:
                    continue
                for mi in range(m):
                    s = scores[bi, ni, ki, mi]
                    out[bi, :, ni, ki] += s * (
                        points[bi, kn, mi] - centers[bi, cn, mi])
    return out


@pytest.mark.skipif(not os.path.isfile(REF_PACONV_TEST),
                    reason="reference test not available")
def test_assign_score_withk_reference_golden():
    import jax.numpy as jnp

    from fcaf3d_tpu.ops.pointnet import assign_score_withk

    lits = _ref_literals(
        ["scores", "points", "centers", "knn_idx", "expected_output"])
    got = assign_score_withk(
        jnp.asarray(lits["scores"]), jnp.asarray(lits["points"]),
        jnp.asarray(lits["centers"]),
        jnp.asarray(lits["knn_idx"].astype(np.int32)))
    np.testing.assert_allclose(
        np.asarray(got), lits["expected_output"], atol=1e-6)


def test_assign_score_withk_oracle_and_grad():
    import jax
    import jax.numpy as jnp

    from fcaf3d_tpu.ops.pointnet import assign_score_withk

    rng = np.random.RandomState(3)
    b, n, npoint, k, m, o = 2, 9, 4, 5, 3, 6
    scores = rng.rand(b, npoint, k, m).astype(np.float32)
    points = rng.randn(b, n, m, o).astype(np.float32)
    centers = rng.randn(b, n, m, o).astype(np.float32)
    knn_idx = rng.randint(0, n, (b, npoint, k)).astype(np.int32)
    knn_idx[0, 1, 2] = n + 3  # out of range -> zero contribution
    knn_idx[1, 0, 4] = -1

    got = assign_score_withk(
        jnp.asarray(scores), jnp.asarray(points), jnp.asarray(centers),
        jnp.asarray(knn_idx))
    np.testing.assert_allclose(
        np.asarray(got), _assign_oracle(scores, points, centers, knn_idx),
        atol=1e-5)

    # autodiff replaces the reference's hand-written backward kernels
    grads = jax.grad(
        lambda s, p, c: jnp.sum(
            assign_score_withk(s, p, c, jnp.asarray(knn_idx)) ** 2),
        argnums=(0, 1, 2),
    )(jnp.asarray(scores), jnp.asarray(points), jnp.asarray(centers))
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


def test_anchor_3d_range_generator():
    """Shapes mirror the reference's own test
    (`tests/test_utils/test_anchors.py:12-43`)."""
    from fcaf3d_tpu.core.anchors import Anchor3DRangeGenerator

    gen = Anchor3DRangeGenerator(
        ranges=[[0, -39.68, -0.6, 70.4, 39.68, -0.6],
                [0, -39.68, -0.6, 70.4, 39.68, -0.6],
                [0, -39.68, -1.78, 70.4, 39.68, -1.78]],
        sizes=[[0.6, 0.8, 1.73], [0.6, 1.76, 1.73], [1.6, 3.9, 1.56]],
        rotations=[0, 1.57],
        reshape_out=False,
    )
    assert gen.num_levels == 1
    assert gen.num_base_anchors == 6
    a = gen.single_level_grid_anchors((256, 256), 1.1)
    assert a.shape == (1, 256, 256, 3, 2, 7)
    # linspace centers include both range ends
    assert np.isclose(a[0, 0, 0, 0, 0, 0], 0.0)
    assert np.isclose(a[0, 0, -1, 0, 0, 0], 70.4)
    assert np.isclose(a[0, -1, 0, 0, 0, 1], 39.68)
    # sizes are scaled, z comes from each size's own range
    np.testing.assert_allclose(
        a[0, 0, 0, 0, 0, 3:6], np.array([0.6, 0.8, 1.73]) * 1.1, rtol=1e-6)
    assert np.isclose(a[0, 0, 0, 2, 0, 2], -1.78)
    assert np.isclose(a[0, 0, 0, 0, 1, 6], 1.57)

    flat = Anchor3DRangeGenerator(
        ranges=[[0, -39.68, -0.6, 70.4, 39.68, -0.6]],
        sizes=[[1.6, 3.9, 1.56]], rotations=[0, 1.57],
    ).grid_anchors([(128, 128)])
    assert flat[0].shape == (128 * 128 * 2, 7)


def test_aligned_anchor_generator_cell_centers():
    from fcaf3d_tpu.core.anchors import AlignedAnchor3DRangeGenerator

    gen = AlignedAnchor3DRangeGenerator(
        ranges=[[-51.2, -51.2, -1.8, 51.2, 51.2, -1.8]],
        sizes=[[1.0, 1.0, 1.0]], rotations=[0.0], scales=[1],
        reshape_out=False,
    )
    a = gen.single_level_grid_anchors((4, 4), 1)
    assert a.shape == (1, 4, 4, 1, 1, 7)
    # 4 cells over [-51.2, 51.2]: centers at -38.4, -12.8, 12.8, 38.4
    np.testing.assert_allclose(
        a[0, 0, :, 0, 0, 0], [-38.4, -12.8, 12.8, 38.4], atol=1e-5)
    # z range is degenerate (min == max): one plane at the value
    assert np.isclose(a[0, 0, 0, 0, 0, 2], -1.8)


def test_points_to_voxel_semantics():
    from fcaf3d_tpu.core.voxel import VoxelGenerator, points_to_voxel

    # 5 points: two share a voxel, one out of range
    pts = np.array([
        [0.1, 0.1, 0.1, 7.0],   # voxel (0,0,0), first
        [1.1, 0.1, 0.1, 8.0],   # voxel (1,0,0)
        [0.2, 0.15, 0.1, 9.0],  # voxel (0,0,0) again
        [99.0, 0.1, 0.1, 1.0],  # out of range -> dropped
        [0.1, 1.2, 0.3, 2.0],   # voxel (0,1,0)
    ], np.float32)
    voxels, coors, num = points_to_voxel(
        pts, [1.0, 1.0, 1.0], [0, 0, 0, 4, 4, 4], max_points=2,
        max_voxels=20)
    assert voxels.shape == (3, 2, 4)
    # first-appearance voxel order; coors are (z, y, x)
    np.testing.assert_array_equal(
        coors, [[0, 0, 0], [0, 0, 1], [0, 1, 0]])
    np.testing.assert_array_equal(num, [2, 1, 1])
    np.testing.assert_allclose(voxels[0, 0], pts[0])
    np.testing.assert_allclose(voxels[0, 1], pts[2])
    np.testing.assert_allclose(voxels[1, 0], pts[1])
    np.testing.assert_allclose(voxels[2, 0], pts[4])

    # max_points truncation keeps stream order; extra points still counted
    # out of num? reference: num_points_per_voxel stops at max_points
    many = np.tile(np.array([[0.5, 0.5, 0.5, 1.0]], np.float32), (5, 1))
    v2, c2, n2 = points_to_voxel(
        many, [1, 1, 1], [0, 0, 0, 2, 2, 2], max_points=3, max_voxels=2)
    assert v2.shape[0] == 1 and n2[0] == 3

    # max_voxels drops later-appearing voxels
    spread = np.stack([np.arange(6) + 0.5, np.zeros(6) + 0.5,
                       np.zeros(6) + 0.5], axis=1).astype(np.float32)
    v3, c3, n3 = points_to_voxel(
        spread, [1, 1, 1], [0, 0, 0, 8, 8, 8], max_points=1, max_voxels=4)
    assert v3.shape[0] == 4
    np.testing.assert_array_equal(c3[:, 2], [0, 1, 2, 3])

    gen = VoxelGenerator([0.5, 0.5, 0.5], [0, 0, 0, 4, 4, 2], 5,
                         max_voxels=100)
    np.testing.assert_array_equal(gen.grid_size, [8, 8, 4])
    # pts[0] and pts[2] share voxel (0,0,0) at 0.5m resolution
    v, c, n = gen.generate(pts[:3])
    assert v.shape == (2, 5, 4) and c.shape == (2, 3)
    np.testing.assert_array_equal(n, [2, 1])


def test_flop_counter_records_fused_gather_gemm():
    """utils.flops: the fused gather-GEMM wrapper records its dense-
    equivalent GEMM FLOPs at trace/call time; nesting and no-counter
    paths are safe."""
    import jax.numpy as jnp
    import numpy as np

    from fcaf3d_tpu.ops.sparse.gather_kernel import fused_gather_gemm
    from fcaf3d_tpu.utils import flop_counter

    b, n, c, m, k, e = 2, 64, 8, 32, 3, 16
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n + 1, (b, m, k)).astype(np.int32))
    w = jnp.asarray(rng.randn(k, c, e).astype(np.float32))

    # no active counter: plain call works
    out = fused_gather_gemm(feats, idx, w, interpret=True)
    assert out.shape == (b, m, e)

    with flop_counter() as fc:
        fused_gather_gemm(feats, idx, w, interpret=True)
    assert fc.model == 2.0 * b * m * k * c * e
    assert fc.mxu > fc.model  # selects + padding make MXU work strictly larger

    # counters accumulate across calls and exit cleanly
    with flop_counter() as fc2:
        fused_gather_gemm(feats, idx, w, interpret=True)
        fused_gather_gemm(feats, idx, w, interpret=True)
    assert fc2.model == 2 * fc.model
