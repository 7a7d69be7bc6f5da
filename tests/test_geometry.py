import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcaf3d_tpu.core import geometry as G
from fcaf3d_tpu.core import rotated_iou as RI
from fcaf3d_tpu.core.eval import pairwise_iou_3d_np


def test_limit_period():
    v = jnp.array([0.0, np.pi, -np.pi, 2.5 * np.pi])
    out = np.asarray(G.limit_period(v))
    assert np.all(out >= -np.pi / 2 - 1e-6)
    assert np.all(out < np.pi / 2 + 1e-6)


def test_rotate_points_z():
    # reference convention: +angle rotates clockwise, (1,0) -> (0,-1)
    pts = jnp.array([[[1.0, 0.0, 0.0]]])
    out = np.asarray(G.rotate_points_z(pts, jnp.array([np.pi / 2])))
    np.testing.assert_allclose(out[0, 0], [0.0, -1.0, 0.0], atol=1e-6)
    # round trip with the inverse angle
    back = np.asarray(G.rotate_points_z(G.rotate_points_z(pts, jnp.array([0.7])), jnp.array([-0.7])))
    np.testing.assert_allclose(back[0, 0], [1.0, 0.0, 0.0], atol=1e-6)


def test_gravity_center_and_volume():
    box = jnp.array([[1.0, 2.0, 0.0, 2.0, 4.0, 6.0, 0.3]])
    np.testing.assert_allclose(
        np.asarray(G.gravity_center(box))[0], [1.0, 2.0, 3.0], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(G.box_volume(box))[0], 48.0, atol=1e-5)


def test_corners_axis_aligned():
    box = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    corners = np.asarray(G.box7_corners(box))[0]
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners.min(axis=0), [-1, -1, 0], atol=1e-6)
    np.testing.assert_allclose(corners.max(axis=0), [1, 1, 2], atol=1e-6)


def test_points_in_boxes_rotated():
    # unit box rotated 45 deg: point on old corner now outside
    boxes = jnp.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, np.pi / 4]])
    pts = jnp.array(
        [
            [0.0, 0.0, 0.5],  # center: inside
            [0.45, 0.45, 0.5],  # corner of axis-aligned box: outside after rot
            [0.6, 0.0, 0.5],  # along rotated diagonal: inside (extent 0.707)
        ]
    )
    got = np.asarray(G.points_in_boxes(pts, boxes))[:, 0]
    assert got.tolist() == [True, False, True]


def test_axis_aligned_iou():
    a = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 0.0, 0.0, 2.0, 2.0, 2.0]])
    iou = float(RI.axis_aligned_iou(a, b)[0])
    # inter = 1*2*2 = 4, union = 8+8-4 = 12
    np.testing.assert_allclose(iou, 4 / 12, atol=1e-6)


def test_rotated_iou_identity():
    b = jnp.array([[[1.0, 2.0, 3.0, 2.0, 1.0, 0.7]]])  # x,y,dx,dy... wrong len
    box = jnp.array([[[1.0, 2.0, 3.0, 2.0, 0.7]]])
    iou = float(RI.rotated_iou_2d(box, box)[0, 0])
    np.testing.assert_allclose(iou, 1.0, atol=1e-4)


def test_rotated_iou_vs_axis_aligned():
    # yaw=0 rotated IoU must match axis-aligned BEV IoU
    b1 = jnp.array([[[0.0, 0.0, 2.0, 2.0, 0.0]]])
    b2 = jnp.array([[[1.0, 1.0, 2.0, 2.0, 0.0]]])
    iou = float(RI.rotated_iou_2d(b1, b2)[0, 0])
    np.testing.assert_allclose(iou, 1.0 / 7.0, atol=1e-5)


def test_rotated_iou_45deg():
    # square vs same square rotated 45deg: known IoU = 2(sqrt(2)-1)/(2-(2(sqrt2-1)))
    b1 = jnp.array([[[0.0, 0.0, 1.0, 1.0, 0.0]]])
    b2 = jnp.array([[[0.0, 0.0, 1.0, 1.0, np.pi / 4]]])
    iou = float(RI.rotated_iou_2d(b1, b2)[0, 0])
    inter = 4 * (np.sqrt(2) - 1) / 2  # octagon area = 2(sqrt2-1) ~ 0.8284
    expect = inter / (2 - inter)
    np.testing.assert_allclose(iou, expect, atol=1e-4)


def test_rotated_iou_disjoint():
    b1 = jnp.array([[[0.0, 0.0, 1.0, 1.0, 0.3]]])
    b2 = jnp.array([[[5.0, 5.0, 1.0, 1.0, 1.0]]])
    iou = float(RI.rotated_iou_2d(b1, b2)[0, 0])
    np.testing.assert_allclose(iou, 0.0, atol=1e-6)


def test_rotated_iou_contained():
    b1 = jnp.array([[[0.0, 0.0, 4.0, 4.0, 0.2]]])
    b2 = jnp.array([[[0.0, 0.0, 1.0, 1.0, 0.9]]])
    iou = float(RI.rotated_iou_2d(b1, b2)[0, 0])
    np.testing.assert_allclose(iou, 1.0 / 16.0, atol=1e-4)


def test_iou_3d_gradients_finite():
    def loss(p):
        t = jnp.array([[0.5, 0.2, 0.1, 1.0, 1.5, 1.0, 0.4]])
        return jnp.sum(1.0 - RI.iou_3d(p, t))

    p = jnp.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    g = jax.grad(loss)(p)
    assert np.all(np.isfinite(np.asarray(g)))
    # also at a degenerate disjoint configuration
    p2 = jnp.array([[10.0, 10.0, 10.0, 1.0, 1.0, 1.0, 0.0]])
    g2 = jax.grad(loss)(p2)
    assert np.all(np.isfinite(np.asarray(g2)))
    # and at the exactly-identical configuration (collinear edges)
    p3 = jnp.array([[0.5, 0.2, 0.1, 1.0, 1.5, 1.0, 0.4]])
    g3 = jax.grad(loss)(p3)
    assert np.all(np.isfinite(np.asarray(g3)))


def test_iou3d_jnp_vs_np_random():
    rng = np.random.RandomState(0)
    n, m = 12, 9
    def rand_boxes(k):
        b = np.zeros((k, 7))
        b[:, :3] = rng.uniform(-2, 2, (k, 3))
        b[:, 3:6] = rng.uniform(0.5, 3.0, (k, 3))
        b[:, 6] = rng.uniform(-np.pi, np.pi, k)
        return b

    b1, b2 = rand_boxes(n), rand_boxes(m)
    got_np = pairwise_iou_3d_np(b1, b2)
    # device path takes gravity-centered boxes
    g1 = b1.copy()
    g1[:, 2] += g1[:, 5] / 2
    g2 = b2.copy()
    g2[:, 2] += g2[:, 5] / 2
    got_jnp = np.asarray(RI.pairwise_iou_3d(jnp.asarray(g1), jnp.asarray(g2)))
    np.testing.assert_allclose(got_np, got_jnp, atol=2e-4)
