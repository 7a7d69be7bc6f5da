"""Golden-value tests for the `box_np_ops` converter-contract subset,
using the reference suite's expected outputs
(`/root/reference/tests/test_utils/test_box_np_ops.py`)."""
import numpy as np

from fcaf3d_tpu.core.box_np_ops import (
    box_camera_to_lidar,
    camera_to_lidar,
    center_to_corner_box2d,
    center_to_corner_box3d,
    corners_nd,
    points_cam2img,
    points_in_rbbox,
    rotation_2d,
)

RECT = np.array([
    [0.9999128, 0.01009263, -0.00851193, 0.0],
    [-0.01012729, 0.9999406, -0.00403767, 0.0],
    [0.00847068, 0.00412352, 0.9999556, 0.0],
    [0.0, 0.0, 0.0, 1.0],
])
TRV2C = np.array([
    [0.00692796, -0.9999722, -0.00275783, -0.02457729],
    [-0.00116298, 0.00274984, -0.9999955, -0.06127237],
    [0.9999753, 0.00693114, -0.0011439, -0.3321029],
    [0.0, 0.0, 0.0, 1.0],
])


def test_camera_to_lidar_golden():
    points = np.array([[1.84, 1.47, 8.41]])
    expected = np.array([[8.73138192, -1.85591746, -1.59969933]])
    assert np.allclose(camera_to_lidar(points, RECT, TRV2C), expected)


def test_box_camera_to_lidar_golden():
    box = np.array([[1.84, 1.47, 8.41, 1.2, 1.89, 0.48, 0.01]])
    expected = np.array(
        [[8.73138192, -1.85591746, -1.59969933, 0.48, 1.2, 1.89, 0.01]])
    assert np.allclose(box_camera_to_lidar(box, RECT, TRV2C), expected)


def test_corners_nd_golden():
    dims = np.array([[0.47, 0.98]])
    expected = np.array([[[-0.235, -0.49], [-0.235, 0.49],
                          [0.235, 0.49], [0.235, -0.49]]])
    assert np.allclose(corners_nd(dims), expected)


def test_rotation_2d_golden():
    angles = np.array([-3.14])
    corners = np.array([[[-0.235, -0.49], [-0.235, 0.49], [0.235, 0.49],
                         [0.235, -0.49]]])
    expected = np.array([[[0.2357801, 0.48962511],
                          [0.2342193, -0.49037365],
                          [-0.2357801, -0.48962511],
                          [-0.2342193, 0.49037365]]])
    assert np.allclose(rotation_2d(corners, angles), expected)


def test_center_to_corner_box2d_golden():
    center = np.array([[9.348705, -3.6271024]])
    dims = np.array([[0.47, 0.98]])
    angles = np.array([-3.14])
    expected = np.array([[[9.584485, -3.1374772], [9.582925, -4.117476],
                          [9.112926, -4.1167274], [9.114486, -3.1367288]]])
    assert np.allclose(center_to_corner_box2d(center, dims, angles), expected)


def test_center_to_corner_box3d_matches_boxes_api():
    """3D corners must agree with the framework's canonical corner op
    (core.boxes / geometry box corners) for bottom-centered yaw boxes."""
    from fcaf3d_tpu.core.geometry import box7_corners as box_corners

    rng = np.random.RandomState(0)
    boxes = np.zeros((5, 7), np.float32)
    boxes[:, :3] = rng.uniform(-2, 2, (5, 3))
    boxes[:, 3:6] = rng.uniform(0.5, 2, (5, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 5)
    got = center_to_corner_box3d(
        boxes[:, :3], boxes[:, 3:6], boxes[:, 6], origin=(0.5, 0.5, 0.0))
    want = np.asarray(box_corners(boxes))
    # same 8 corners regardless of ordering: compare as sorted point sets
    got_s = np.sort(got.reshape(5, -1), axis=1)
    want_s = np.sort(want.reshape(5, -1), axis=1)
    assert np.allclose(got_s, want_s, atol=1e-4)


def test_points_in_rbbox_matches_framework():
    from fcaf3d_tpu.core.geometry import points_in_boxes

    rng = np.random.RandomState(1)
    points = rng.uniform(-3, 3, (200, 3)).astype(np.float32)
    boxes = np.zeros((4, 7), np.float32)
    boxes[:, :3] = rng.uniform(-1, 1, (4, 3))
    boxes[:, 3:6] = rng.uniform(0.5, 2.5, (4, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 4)
    got = points_in_rbbox(points, boxes)
    want = np.asarray(points_in_boxes(points, boxes)) > 0
    assert got.shape == (200, 4)
    assert (got == want).mean() > 0.995  # boundary ties only


def test_points_cam2img_shapes_and_center():
    k = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    pts = np.array([[0.0, 0.0, 2.0], [1.0, 0.5, 5.0]])
    uv = points_cam2img(pts, k)
    assert np.allclose(uv[0], [320, 240])
    assert np.allclose(uv[1], [320 + 500 / 5, 240 + 250 / 5])
