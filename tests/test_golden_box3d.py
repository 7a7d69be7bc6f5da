"""Golden box-structure parity pack (VERDICT r4 item 6).

Exact expected values copied from the reference's own test suite —
`tests/test_utils/test_box3d.py::test_depth_boxes3d` (properties, flips,
rotations, no-yaw enclosing refit, corners), `::test_limit_period`,
`::test_boxes_conversion` — plus the SUN RGB-D ROTATED-pipeline golden
(`tests/test_data/test_pipelines/test_indoor_pipeline.py::
test_sunrgbd_pipeline`), the path SUN RGB-D mAP parity lives on.

Sign convention note (pinned by test_rotate_golden): the reference's
`DepthInstance3DBoxes.rotate(angle)` equals this framework's
`Boxes3D.rotate(-angle)` / `rotate_points_z(points, -angle)` — both
frameworks are internally consistent (points, boxes and yaw share the
convention on each side), the direction label is simply opposite.
"""
import os

import numpy as np
import pytest

from fcaf3d_tpu.core.boxes import Box3DMode, Boxes3D, convert_boxes

REF = "/root/reference/tests/data"

# reference test_depth_boxes3d boxes_1 / boxes_2 tensors
BOXES_1 = np.array(
    [[1.4856, 2.5299, -0.5570, 0.9385, 2.1404, 0.8954, 3.0601],
     [2.3262, 3.3065, 0.44255, 0.8234, 0.5325, 1.0099, 2.9971]], np.float32)
BOXES_2 = np.array(
    [[2.4593, 2.5870, -0.4321, 0.8597, 0.6193, 1.0204, 3.0693],
     [1.4856, 2.5299, -0.5570, 0.9385, 2.1404, 0.8954, 3.0601]], np.float32)


def test_depth_properties_golden():
    b = Boxes3D(BOXES_1)
    np.testing.assert_allclose(
        b.gravity_center,
        [[1.4856, 2.5299, -0.1093], [2.3262, 3.3065, 0.9475]], atol=1e-4)
    np.testing.assert_allclose(
        b.bev,
        [[1.4856, 2.5299, 0.9385, 2.1404, 3.0601],
         [2.3262, 3.3065, 0.8234, 0.5325, 2.9971]], atol=1e-4)
    np.testing.assert_allclose(
        b.nearest_bev(),
        [[1.0164, 1.4597, 1.9548, 3.6001],
         [1.9145, 3.0402, 2.7379, 3.5728]], atol=1e-4)
    assert b.volume.shape == (2,)
    np.testing.assert_allclose(b.bottom_center, BOXES_1[:, :3], atol=0)


def test_flip_golden():
    cat = np.concatenate([BOXES_1, BOXES_2])
    points = np.array([[0.6762, 1.2559, -1.4658, 2.5359],
                       [0.8784, 4.7814, -1.3857, 0.7167],
                       [-0.2517, 6.7053, -0.9697, 0.5599],
                       [0.5520, 0.6533, -0.5265, 1.0032],
                       [-0.5358, 4.5870, -1.4741, 0.0556]], np.float32)
    b = Boxes3D(cat).flip("horizontal")
    expected_h = np.array(
        [[-1.4856, 2.5299, -0.5570, 0.9385, 2.1404, 0.8954, 0.0815],
         [-2.3262, 3.3065, 0.4426, 0.8234, 0.5325, 1.0099, 0.1445],
         [-2.4593, 2.5870, -0.4321, 0.8597, 0.6193, 1.0204, 0.0723],
         [-1.4856, 2.5299, -0.5570, 0.9385, 2.1404, 0.8954, 0.0815]])
    np.testing.assert_allclose(b.tensor, expected_h, atol=1e-3)
    pts_h = points.copy()
    pts_h[:, 0] = -pts_h[:, 0]  # DepthInstance3DBoxes.flip(points): x = -x
    np.testing.assert_allclose(
        pts_h[:, :2], [[-0.6762, 1.2559], [-0.8784, 4.7814], [0.2517, 6.7053],
                       [-0.5520, 0.6533], [0.5358, 4.5870]], atol=1e-4)

    b = b.flip("vertical")
    expected_v = expected_h.copy()
    expected_v[:, 1] = -expected_v[:, 1]
    expected_v[:, 6] = -expected_v[:, 6]
    np.testing.assert_allclose(b.tensor, expected_v, atol=1e-3)


def test_rotate_golden():
    """Reference `rotate(-0.022998953275003075)` == ours rotate(+same)."""
    import jax.numpy as jnp

    from fcaf3d_tpu.core.geometry import rotate_points_z, rotation_matrix_z

    a = 0.022998953275003075
    start = np.array(
        [[-1.4856, -2.5299, -0.5570, 0.9385, 2.1404, 0.8954, -0.0815],
         [-2.3262, -3.3065, 0.4426, 0.8234, 0.5325, 1.0099, -0.1445],
         [-2.4593, -2.5870, -0.4321, 0.8597, 0.6193, 1.0204, -0.0723],
         [-1.4856, -2.5299, -0.5570, 0.9385, 2.1404, 0.8954, -0.0815]],
        np.float32)
    expected = np.array(
        [[-1.5434, -2.4951, -0.5570, 0.9385, 2.1404, 0.8954, -0.0585],
         [-2.4016, -3.2521, 0.4426, 0.8234, 0.5325, 1.0099, -0.1215],
         [-2.5181, -2.5298, -0.4321, 0.8597, 0.6193, 1.0204, -0.0493],
         [-1.5434, -2.4951, -0.5570, 0.9385, 2.1404, 0.8954, -0.0585]])
    got = Boxes3D(start).rotate(a)
    np.testing.assert_allclose(got.tensor, expected, atol=1e-3)

    points = np.array([[-0.6762, -1.2559, -1.4658],
                       [-0.8784, -4.7814, -1.3857],
                       [0.2517, -6.7053, -0.9697],
                       [-0.5520, -0.6533, -0.5265],
                       [0.5358, -4.5870, -1.4741]], np.float32)
    expected_pts = np.array([[-0.7049, -1.2400, -1.4658],
                             [-0.9881, -4.7599, -1.3857],
                             [0.0974, -6.7093, -0.9697],
                             [-0.5669, -0.6404, -0.5265],
                             [0.4302, -4.5981, -1.4741]])
    got_pts = np.asarray(rotate_points_z(jnp.asarray(points), jnp.float32(a)))
    np.testing.assert_allclose(got_pts, expected_pts, atol=1e-3)
    # the reference's expected rot_mat_T for its angle -a IS our R_T(+a)
    np.testing.assert_allclose(
        np.asarray(rotation_matrix_z(jnp.float32(a))),
        [[0.9997, -0.0230, 0.0], [0.0230, 0.9997, 0.0], [0.0, 0.0, 1.0]],
        atol=1e-4)


def test_rotate_noyaw_enclosing_golden():
    """with_yaw=False rotation = enclosing-box refit, yaw stays 0
    (reference `test_depth_boxes3d` box_dim=6 case, rotate(-0.0459979))."""
    from fcaf3d_tpu.data.pipelines import GlobalRotScaleTrans

    boxes6 = np.array(
        [[0.61211395, 0.8129094, 0.10563634, 1.497534, 0.16927195, 0.27956772],
         [1.430009, 0.49797538, 0.9382923, 0.07694054, 0.9312509, 1.8919173]],
        np.float32)
    expected = np.array(
        [[0.64884546, 0.78390356, 0.10563634, 1.50373348, 0.23795205,
          0.27956772, 0],
         [1.45139421, 0.43169443, 0.93829232, 0.11967964, 0.93380373,
          1.89191735, 0]])
    a = 0.04599790655000615
    t = GlobalRotScaleTrans(rot_range=(a, a), scale_range=(1.0, 1.0),
                            translation_std=(0, 0, 0), with_yaw=False)
    box7 = np.concatenate([boxes6, np.zeros((2, 1), np.float32)], axis=1)
    sample = {"points": np.zeros((1, 3), np.float32), "gt_boxes": box7}
    out = t(sample, np.random.default_rng(0))
    np.testing.assert_allclose(out["gt_boxes"], expected, atol=1e-5)


def test_corners_golden():
    """Corner VALUES from the reference no-yaw case; order mapping pinned:
    reference corner k == ours perm[k] (their z toggles at position 1-2,
    ours binary (x,y,z))."""
    boxes = np.array(
        [[0.64884546, 0.78390356, 0.10563634, 1.50373348, 0.23795205,
          0.27956772, 0],
         [1.45139421, 0.43169443, 0.93829232, 0.11967964, 0.93380373,
          1.89191735, 0]], np.float32)
    expected_ref_order = np.array(
        [[[-0.1030, 0.6649, 0.1056], [-0.1030, 0.6649, 0.3852],
          [-0.1030, 0.9029, 0.3852], [-0.1030, 0.9029, 0.1056],
          [1.4007, 0.6649, 0.1056], [1.4007, 0.6649, 0.3852],
          [1.4007, 0.9029, 0.3852], [1.4007, 0.9029, 0.1056]],
         [[1.3916, -0.0352, 0.9383], [1.3916, -0.0352, 2.8302],
          [1.3916, 0.8986, 2.8302], [1.3916, 0.8986, 0.9383],
          [1.5112, -0.0352, 0.9383], [1.5112, -0.0352, 2.8302],
          [1.5112, 0.8986, 2.8302], [1.5112, 0.8986, 0.9383]]])
    ours = Boxes3D(boxes).corners  # [2, 8, 3], binary (x, y, z) order
    perm = [0, 1, 3, 2, 4, 5, 7, 6]  # ref order -> ours
    np.testing.assert_allclose(ours[:, perm, :], expected_ref_order, atol=1e-3)


def test_limit_period_golden():
    import jax.numpy as jnp

    from fcaf3d_tpu.core.geometry import limit_period

    val = np.array([[0.4963], [0.7682], [0.0885], [0.1320], [0.3074]])
    np.testing.assert_allclose(
        np.asarray(limit_period(jnp.asarray(val))), val, atol=1e-4)
    # discriminating cases across period boundaries (formula-pinned:
    # val - floor(val / pi + 0.5) * pi)
    vals = np.array([-3.2, -1.6, 1.6, 3.2, 4.8, np.pi / 2])
    expect = vals - np.floor(vals / np.pi + 0.5) * np.pi
    np.testing.assert_allclose(
        np.asarray(limit_period(jnp.asarray(vals))), expect, atol=1e-6)
    # offset=0, period=2pi (the eval/TTA yaw normalization)
    vals2 = np.array([-7.0, -0.5, 0.5, 7.0])
    expect2 = vals2 - np.floor(vals2 / (2 * np.pi)) * (2 * np.pi)
    np.testing.assert_allclose(
        np.asarray(limit_period(jnp.asarray(vals2), 0.0, 2 * np.pi)),
        expect2, atol=1e-6)


def test_boxes_conversion_roundtrip_golden():
    """LIDAR -> CAM -> LIDAR and CAM -> DEPTH -> CAM exact roundtrips, with
    the reference's invariants (height preserved, volume preserved)."""
    lidar = np.array(
        [[1.7802081, 2.516249, -1.7501148, 1.75, 3.39, 1.65, 1.48],
         [8.959413, 2.4567227, -1.6357126, 1.54, 4.01, 1.57, 1.62],
         [28.2967, -0.5557558, -1.303325, 1.47, 2.23, 1.48, -1.57],
         [26.66902, 21.82302, -1.736057, 1.56, 3.48, 1.4, -1.69],
         [31.31978, 8.162144, -1.6217787, 1.74, 3.77, 1.48, 2.79]],
        np.float32)
    cam = convert_boxes(lidar, Box3DMode.LIDAR, Box3DMode.CAM)
    # heights: LIDAR dz (col 5) becomes CAM h (col 4)
    np.testing.assert_allclose(cam[:, 4], lidar[:, 5], atol=1e-6)
    np.testing.assert_allclose(np.prod(cam[:, 3:6], 1),
                               np.prod(lidar[:, 3:6], 1), rtol=1e-6)
    back = convert_boxes(cam, Box3DMode.CAM, Box3DMode.LIDAR)
    np.testing.assert_allclose(back, lidar, atol=1e-5)

    depth = convert_boxes(cam, Box3DMode.CAM, Box3DMode.DEPTH)
    cam2 = convert_boxes(depth, Box3DMode.DEPTH, Box3DMode.CAM)
    np.testing.assert_allclose(cam2, cam, atol=1e-5)
    same = convert_boxes(depth, Box3DMode.DEPTH, Box3DMode.DEPTH)
    np.testing.assert_array_equal(same, depth)


@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "sunrgbd")),
                    reason="reference fixtures absent")
def test_sunrgbd_rotated_pipeline_golden():
    """The SUN RGB-D ROTATED path: horizontal flip + GlobalRotScaleTrans
    with the exact parameters the reference drew under np.random.seed(0),
    pinned to its expected gt boxes (`test_indoor_pipeline.py::
    test_sunrgbd_pipeline`). The (flip, angle, scale) triple is RECOVERED
    from the reference's own expected output (box 0 yaw/dims deltas), so
    this is RNG-order independent; trans std is 0 in that config."""
    import pickle

    from fcaf3d_tpu.data.pipelines import GlobalRotScaleTrans

    with open(os.path.join(REF, "sunrgbd", "sunrgbd_infos.pkl"), "rb") as f:
        info = pickle.load(f)[0]
    gt = info["annos"]["gt_boxes_upright_depth"].astype(np.float32)
    assert len(gt) == 3

    expected = np.array(
        [[-1.2136, 4.0206, -0.2412, 2.2493, 1.8444, 1.9245, 1.3989],
         [-2.7420, 4.5777, -0.7686, 0.5718, 0.8629, 0.9510, 1.4446],
         [0.9729, 1.9087, -0.1443, 0.6965, 1.5273, 2.0563, 2.9924]],
        np.float32)

    # flip horizontal (ratio 1.0), then recover (angle, scale) from box 0
    flipped = gt.copy()
    flipped[:, 0] = -flipped[:, 0]
    flipped[:, 6] = np.pi - flipped[:, 6]
    scale = float(np.mean(expected[0, 3:6] / flipped[0, 3:6]))
    angle = float(expected[0, 6] - flipped[0, 6])
    assert abs(angle) < 0.523599 * 1.01 and 0.85 <= scale <= 1.15

    t = GlobalRotScaleTrans(rot_range=(angle, angle),
                            scale_range=(scale, scale),
                            translation_std=(0, 0, 0), with_yaw=True)
    sample = {"points": np.zeros((1, 4), np.float32), "gt_boxes": flipped}
    out = t(sample, np.random.default_rng(0))
    np.testing.assert_allclose(out["gt_boxes"], expected, atol=2e-3)
