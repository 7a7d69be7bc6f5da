"""Box structure API: mode conversions and wrapper surface."""
import numpy as np
import pytest

from fcaf3d_tpu.core.boxes import Box3DMode, Boxes3D, convert_boxes, convert_points


def test_point_mode_roundtrips():
    rng = np.random.RandomState(0)
    pts = rng.randn(10, 5).astype(np.float32)
    for a in Box3DMode:
        for b in Box3DMode:
            if a == b:
                continue
            out = convert_points(convert_points(pts, a, b), b, a)
            np.testing.assert_allclose(out, pts, atol=1e-5)


def test_depth_to_cam_point_convention():
    # depth (x right, y front, z up) -> cam (x right, y down, z front)
    p = np.array([[1.0, 2.0, 3.0]], np.float32)
    out = convert_points(p, Box3DMode.DEPTH, Box3DMode.CAM)
    np.testing.assert_allclose(out[0], [1.0, -3.0, 2.0], atol=1e-6)


def test_lidar_to_depth_point_convention():
    # lidar (x front, y left, z up) -> depth (x right, y front, z up)
    p = np.array([[1.0, 2.0, 3.0]], np.float32)
    out = convert_points(p, Box3DMode.LIDAR, Box3DMode.DEPTH)
    np.testing.assert_allclose(out[0], [-2.0, 1.0, 3.0], atol=1e-6)


def test_box_mode_roundtrip():
    rng = np.random.RandomState(1)
    b = np.zeros((6, 7), np.float32)
    b[:, :3] = rng.randn(6, 3)
    b[:, 3:6] = rng.uniform(0.5, 2, (6, 3))
    b[:, 6] = rng.uniform(-1, 1, 6)
    for dst in (Box3DMode.CAM, Box3DMode.LIDAR):
        back = convert_boxes(convert_boxes(b, Box3DMode.DEPTH, dst),
                             dst, Box3DMode.DEPTH)
        np.testing.assert_allclose(back[:, :6], b[:, :6], atol=1e-5)


def test_boxes3d_wrapper_surface():
    # gravity-centered input via origin (.5, .5, .5), like dataset infos
    raw = np.array([[1.0, 2.0, 1.5, 2.0, 2.0, 1.0]], np.float32)
    boxes = Boxes3D(raw, box_dim=6, origin=(0.5, 0.5, 0.5))
    assert not boxes.with_yaw
    np.testing.assert_allclose(boxes.bottom_center[0], [1, 2, 1.0], atol=1e-6)
    np.testing.assert_allclose(boxes.gravity_center[0], [1, 2, 1.5], atol=1e-6)
    np.testing.assert_allclose(boxes.volume[0], 4.0, atol=1e-6)
    assert boxes.corners.shape == (1, 8, 3)
    assert len(boxes[0:1]) == 1

    pts = np.array([[1.0, 2.0, 1.4], [9, 9, 9]], np.float32)
    inside = boxes.points_in_boxes(pts)
    assert inside[0, 0] and not inside[1, 0]

    iou = boxes.overlaps(boxes)
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-4)

    flipped = boxes.flip("horizontal")
    np.testing.assert_allclose(flipped.tensor[0, 0], -1.0, atol=1e-6)
    scaled = boxes.scale(2.0)
    np.testing.assert_allclose(scaled.volume[0], 32.0, atol=1e-5)


def test_nearest_bev_swaps_dims():
    b = Boxes3D(np.array([[0, 0, 0, 2.0, 1.0, 1.0, np.pi / 2]], np.float32))
    bev = b.nearest_bev()
    # rotated 90 deg: dx/dy swap
    np.testing.assert_allclose(bev[0], [-0.5, -1.0, 0.5, 1.0], atol=1e-5)
