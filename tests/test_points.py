"""Typed points structure (`core.points.Points3D`) — the `BasePoints`
parity surface (`/root/reference/mmdet3d/core/points/base_points.py`):
named attribute columns, geometric ops matching the box/pipeline
conventions, coordinate-mode conversion round-trips."""
import numpy as np

from fcaf3d_tpu.core.boxes import Box3DMode
from fcaf3d_tpu.core.points import Points3D, default_attribute_dims


def make_points(n=32, cols=6, seed=0):
    rng = np.random.RandomState(seed)
    arr = rng.uniform(-2, 2, (n, cols)).astype(np.float32)
    return Points3D(arr, default_attribute_dims(cols))


def test_attribute_map_layouts():
    # xyz+rgb
    assert default_attribute_dims(6) == {"color": [3, 4, 5]}
    # xyz+height+rgb
    assert default_attribute_dims(7, shift_height=True) == {
        "height": 3, "color": [4, 5, 6]}
    # xyz only
    assert default_attribute_dims(3) == {}
    p = make_points(cols=6)
    assert p.color.shape == (32, 3)
    assert p.height is None


def test_rotate_matches_pipeline_convention():
    # GlobalRotScaleTrans rotates points with the same transposed matrix;
    # the structures must agree with the dict pipeline.
    p = make_points()
    before = p.coord.copy()
    angle = 0.3
    p.rotate(angle)
    c, s = np.cos(angle), np.sin(angle)
    rot_t = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(p.coord, before @ rot_t, rtol=1e-6)
    # attributes untouched
    np.testing.assert_array_equal(p.arr[:, 3:], make_points().arr[:, 3:])


def test_flip_translate_scale_range():
    p = make_points()
    ref = p.arr.copy()
    p.flip("horizontal")
    np.testing.assert_array_equal(p.coord[:, 0], -ref[:, 0])
    p.flip("vertical")
    np.testing.assert_array_equal(p.coord[:, 1], -ref[:, 1])
    p.translate([1.0, 2.0, 3.0])
    p.scale(2.0)
    np.testing.assert_allclose(
        p.coord[:, 2], (ref[:, 2] + 3.0) * 2.0, rtol=1e-6)
    m = p.in_range_3d([-10, -10, -10, 10, 10, 10])
    assert m.all()
    m = p.in_range_3d([0, -10, -10, 10, 10, 10])
    assert (m == (p.coord[:, 0] >= 0)).all()


def test_shuffle_and_getitem_preserve_rows():
    p = make_points()
    rows = {tuple(r) for r in p.arr.tolist()}
    perm = p.shuffle(np.random.default_rng(0))
    assert {tuple(r) for r in p.arr.tolist()} == rows
    assert len(perm) == 32
    sub = p[:5]
    assert isinstance(sub, Points3D) and len(sub) == 5
    assert sub.attribute_dims == p.attribute_dims


def test_add_height_layout_and_values():
    p = make_points(cols=6)
    ph = p.add_height()
    assert ph.arr.shape == (32, 7)
    assert ph.attribute_dims == {"height": 3, "color": [4, 5, 6]}
    floor = np.percentile(p.coord[:, 2], 0.99)  # reference's literal 0.99
    np.testing.assert_allclose(ph.height, p.coord[:, 2] - floor, rtol=1e-5)
    np.testing.assert_array_equal(ph.color, p.color)


def test_convert_to_round_trip():
    p = make_points(cols=6)
    cam = p.convert_to(Box3DMode.CAM)
    # depth -> cam: (x, z, -y) per the reference Coord3DMode matrices
    np.testing.assert_allclose(cam.coord[:, 0], p.coord[:, 0], rtol=1e-6)
    np.testing.assert_allclose(cam.coord[:, 1], -p.coord[:, 2], rtol=1e-6)
    np.testing.assert_allclose(cam.coord[:, 2], p.coord[:, 1], rtol=1e-6)
    back = cam.convert_to(Box3DMode.DEPTH)
    np.testing.assert_allclose(back.arr, p.arr, rtol=1e-6)
    assert back.mode == Box3DMode.DEPTH
    np.testing.assert_array_equal(cam.color, p.color)


def test_pipeline_carries_attribute_dims():
    """ShiftHeight re-registers columns; RandomDropPointsColor zeroes the
    mapped color columns (not a hardcoded 3:6) after a height insert."""
    from fcaf3d_tpu.data.pipelines import RandomDropPointsColor, ShiftHeight

    rng = np.random.default_rng(0)
    sample = {"points": make_points(cols=6).arr,
              "attribute_dims": default_attribute_dims(6)}
    sample = ShiftHeight()(sample, rng)
    assert sample["points"].shape[1] == 7
    assert sample["attribute_dims"] == {"height": 3, "color": [4, 5, 6]}
    heights = sample["points"][:, 3].copy()
    sample = RandomDropPointsColor(drop_ratio=1.0)(sample, rng)
    assert (sample["points"][:, 4:7] == 0).all()
    np.testing.assert_array_equal(sample["points"][:, 3], heights)
