"""Prune-early neck ops: unit tests + reference-mode equivalence."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fcaf3d_tpu.ops.sparse import SENTINEL, encode_coords, sparse_conv
from fcaf3d_tpu.ops.sparse.conv import (
    build_kernel_map,
    build_kernel_map_self,
    kernel_offsets,
)
from fcaf3d_tpu.ops.sparse.neck_ops import (
    child_prune_scores,
    gen_children,
    lateral_child_rows,
    threshold_select,
)
from tests.test_sparse_engine import make_sparse
import pytest

pytestmark = pytest.mark.slow  # model/engine compile-heavy (two-lane suite)


def rand_map(rng, n, cap, grid=8, stride=2, channels=3):
    occ = rng.choice(grid ** 3, size=n, replace=False)
    cc = np.stack(np.unravel_index(occ, (grid,) * 3), 1).astype(np.int32) * stride
    ff = rng.randn(n, channels).astype(np.float32)
    return make_sparse([cc], [ff], capacity=cap, stride=stride, channels=channels)


def test_build_kernel_map_self_matches_generic():
    rng = np.random.RandomState(0)
    st = rand_map(rng, 40, 48)
    generic = build_kernel_map(st.keys, st.coords, kernel_offsets(3, st.stride))
    sym = build_kernel_map_self(st.keys, st.coords, st.stride)
    np.testing.assert_array_equal(np.asarray(sym), np.asarray(generic))


def test_threshold_select_matches_topk():
    rng = np.random.RandomState(1)
    for trial in range(5):
        n, budget = 200, 37
        s = jnp.asarray(rng.randn(2, n).astype(np.float32))
        valid = jnp.asarray(rng.rand(2, n) < 0.8)
        keep = threshold_select(s, valid, budget)
        for b in range(2):
            kb = np.asarray(keep[b])
            sb = np.asarray(jnp.where(valid[b], s[b], -np.inf))
            assert kb.sum() == min(budget, int(np.asarray(valid[b]).sum()))
            # kept scores dominate dropped scores
            dropped = sb[~kb & np.asarray(valid[b])]
            if len(dropped) and kb.sum():
                assert sb[kb].min() >= dropped.max() - 1e-5
            assert not np.any(kb & ~np.asarray(valid[b]))


def test_threshold_select_must_keep():
    rng = np.random.RandomState(2)
    s = jnp.asarray(rng.randn(1, 64).astype(np.float32))
    valid = jnp.ones((1, 64), bool)
    must = jnp.zeros((1, 64), bool).at[0, :10].set(True)  # lowest-score rows
    s = s.at[0, :10].set(-100.0)
    keep = threshold_select(s, valid, 16, must_keep=must)
    assert bool(jnp.all(keep[0, :10]))
    assert int(jnp.sum(keep)) == 16


def test_child_prune_scores_match_interpolate_at():
    """Static trilinear slot weights == interpolate_at on child coords."""
    from fcaf3d_tpu.ops.sparse import interpolate_at

    rng = np.random.RandomState(3)
    parent = rand_map(rng, 30, 36, grid=6, stride=4, channels=1)
    kmap = build_kernel_map_self(parent.keys, parent.coords, parent.stride)
    got = child_prune_scores(parent.feats, kmap)  # [1, 8P]

    wt = np.zeros((8, 1, 2), np.float32)  # dummy transpose to get child coords
    coords, keys, _ = gen_children(parent, jnp.asarray(wt))
    want = interpolate_at(parent, coords.astype(jnp.float32))[..., 0]
    valid = np.asarray(keys) != SENTINEL
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], atol=1e-5
    )


def test_lateral_child_rows():
    rng = np.random.RandomState(4)
    parent = rand_map(rng, 20, 24, grid=6, stride=4, channels=2)
    # lateral = all children of a few parents (guaranteed found)
    pc = np.asarray(parent.coords[0][np.asarray(parent.valid[0])])[:5]
    lat_cc = (pc[:, None, :] + np.array(
        [[0, 0, 0], [2, 0, 2], [2, 2, 2]])[None]).reshape(-1, 3)
    lat = make_sparse([lat_cc], [np.ones((15, 2), np.float32)], 16, stride=2)
    rows = np.asarray(lateral_child_rows(parent, lat))[0]
    coords, keys, _ = gen_children(parent, jnp.zeros((8, 2, 2)))
    lkeys = np.asarray(lat.keys[0])
    ckeys = np.asarray(keys[0])
    for i, r in enumerate(rows):
        if lkeys[i] != SENTINEL:
            assert ckeys[r] == lkeys[i]


def test_neck_modes_equivalent_when_nothing_pruned():
    """With budgets >= all generated children and no backbone overflow,
    prune_early == reference (identical maps, identical head outputs up to
    fp assoc). Points are snapped to a small voxel set so no budget can
    overflow anywhere (overflow orphans laterals, which only the
    reference's union-add can recover — that divergence is by design)."""
    from fcaf3d_tpu.configs import fcaf3d_tiny
    from fcaf3d_tpu.models import FCAF3D

    base = fcaf3d_tiny()
    # 3 levels; keep-all valid counts multiply by 8 per up level
    big = dataclasses.replace(
        base, n_outs=3,
        backbone_budgets=(64, 64, 64, 64, 64, 64),
        neck_budgets=(2560, 320, 64, 64),
    )
    rng = np.random.RandomState(0)
    # 40 distinct voxel centers on a 16^3 grid at 4x voxel_size spacing
    centers = rng.choice(16 ** 3, size=40, replace=False)
    cc = np.stack(np.unravel_index(centers, (16,) * 3), 1).astype(np.float32)
    pick = rng.randint(0, 40, base.num_points)
    pts = jnp.asarray((cc[pick] * 4 + 0.5) * base.voxel_size)[None]
    colors = jnp.asarray(rng.uniform(0, 255, (1, base.num_points, 3)).astype(np.float32))
    valid = jnp.ones((1, base.num_points), bool)

    outs = {}
    for mode in ("prune_early", "reference"):
        cfg = dataclasses.replace(big, neck_mode=mode)
        model = FCAF3D(cfg)
        variables = model.init(jax.random.PRNGKey(0), pts, colors, valid)
        outs[mode] = model.apply(variables, pts, colors, valid, train=False)

    for lvl, (a, b) in enumerate(zip(outs["prune_early"], outs["reference"])):
        va, vb = np.asarray(a.valid), np.asarray(b.valid)
        assert va.sum() == vb.sum(), f"level {lvl} row counts differ"
        # same sorted maps -> same row order
        np.testing.assert_array_equal(np.asarray(a.points)[va],
                                      np.asarray(b.points)[vb])
        np.testing.assert_allclose(np.asarray(a.cls_scores)[va],
                                   np.asarray(b.cls_scores)[vb],
                                   atol=2e-2, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(a.bbox_pred)[va],
                                   np.asarray(b.bbox_pred)[vb],
                                   atol=2e-2, rtol=1e-2)
