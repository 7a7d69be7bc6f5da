"""Rotating-calipers smallest enclosing box + GIoU3D tests
(reference `mmdet3d/ops/rotated_iou/min_enclosing_box.py:142`,
`oriented_iou_loss.py:112-130`)."""
import jax
import jax.numpy as jnp
import numpy as np

from fcaf3d_tpu.core.geometry import bev_corners
from fcaf3d_tpu.core.rotated_iou import giou_3d, min_enclosing_rect_area


def brute_force_min_area(pts, n_angles=3600):
    """Dense rotation search oracle."""
    best = np.inf
    for a in np.linspace(0, np.pi / 2, n_angles):
        c, s = np.cos(a), np.sin(a)
        r = pts @ np.array([[c, -s], [s, c]])
        area = (r[:, 0].max() - r[:, 0].min()) * (r[:, 1].max() - r[:, 1].min())
        best = min(best, area)
    return best


def test_min_enclosing_rect_matches_brute_force():
    rng = np.random.RandomState(0)
    for _ in range(30):
        # two random rotated rectangles' corners (the GIoU use case)
        boxes = np.stack([
            np.concatenate([rng.uniform(-1, 1, 2), rng.uniform(0.2, 2.0, 2),
                            rng.uniform(-np.pi, np.pi, 1)])
            for _ in range(2)
        ]).astype(np.float32)
        corners = np.asarray(bev_corners(jnp.asarray(boxes))).reshape(8, 2)
        got = float(min_enclosing_rect_area(jnp.asarray(corners[None]))[0])
        expect = brute_force_min_area(corners)
        # the dense-angle oracle can only overshoot the true minimum, so
        # the exact calipers answer may come in slightly below it
        assert got <= expect + 1e-4 * expect, (got, expect)
        np.testing.assert_allclose(got, expect, rtol=5e-4, atol=1e-5)


def test_min_enclosing_degenerate_points():
    # coincident points: no NaNs, area of the spread
    pts = jnp.asarray(np.array([[[0.0, 0.0]] * 4 + [[1.0, 0.0]] * 4]))
    a = min_enclosing_rect_area(pts)
    assert np.isfinite(float(a[0]))
    np.testing.assert_allclose(float(a[0]), 0.0, atol=1e-6)


def test_giou_smallest_tighter_than_aligned():
    rng = np.random.RandomState(1)
    b1 = np.concatenate([
        rng.uniform(-1, 1, (16, 3)), rng.uniform(0.3, 2, (16, 3)),
        rng.uniform(-np.pi, np.pi, (16, 1)),
    ], axis=1).astype(np.float32)
    b2 = np.concatenate([
        rng.uniform(-1, 1, (16, 3)), rng.uniform(0.3, 2, (16, 3)),
        rng.uniform(-np.pi, np.pi, (16, 1)),
    ], axis=1).astype(np.float32)
    loss_s, iou_s = giou_3d(jnp.asarray(b1), jnp.asarray(b2), "smallest")
    loss_a, iou_a = giou_3d(jnp.asarray(b1), jnp.asarray(b2), "aligned")
    np.testing.assert_allclose(np.asarray(iou_s), np.asarray(iou_a), rtol=1e-5)
    # smallest enclosure <= aligned enclosure => giou penalty no larger
    assert np.all(np.asarray(loss_s) <= np.asarray(loss_a) + 1e-5)
    # identical boxes: enclosure == union => loss == 1 - iou == 0
    loss_id, iou_id = giou_3d(jnp.asarray(b1), jnp.asarray(b1), "smallest")
    np.testing.assert_allclose(np.asarray(iou_id), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(loss_id), 0.0, atol=1e-3)


def test_giou_smallest_differentiable():
    b1 = jnp.asarray([[0.1, 0.0, 0.0, 1.0, 0.8, 0.5, 0.3]], jnp.float32)
    b2 = jnp.asarray([[0.4, 0.2, 0.1, 0.9, 1.1, 0.6, -0.5]], jnp.float32)
    g = jax.grad(lambda a: jnp.sum(giou_3d(a, b2, "smallest")[0]))(b1)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.sum(jnp.abs(g))) > 0
