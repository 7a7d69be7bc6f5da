import jax.numpy as jnp
import numpy as np

from fcaf3d_tpu.core.eval import average_precision, indoor_eval
from fcaf3d_tpu.core.nms import aligned_3d_nms, nms_bev


def test_nms_bev_basic():
    boxes = jnp.array(
        [
            [0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0],
            [0.1, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0],  # heavy overlap with 0
            [5.0, 5.0, 0.0, 2.0, 2.0, 2.0, 0.0],  # far away
        ]
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    keep = np.asarray(nms_bev(boxes, scores, iou_thr=0.5))
    assert keep.tolist() == [True, False, True]


def test_nms_bev_respects_valid_mask():
    boxes = jnp.zeros((4, 7)).at[:, 3:6].set(1.0)
    scores = jnp.array([0.9, 0.8, 0.7, 0.6])
    valid = jnp.array([True, False, False, False])
    keep = np.asarray(nms_bev(boxes, scores, iou_thr=0.5, valid=valid))
    assert keep.tolist() == [True, False, False, False]


def test_nms_rotated_vs_normal():
    # two thin boxes crossing at 90 deg: rotated IoU small (no suppression),
    # axis-aligned (normal treats yaw=0 on dims) IoU of dims is 1 -> suppress.
    boxes = jnp.array(
        [
            [0.0, 0.0, 0.0, 4.0, 0.5, 1.0, 0.0],
            [0.0, 0.0, 0.0, 4.0, 0.5, 1.0, np.pi / 2],
        ]
    )
    scores = jnp.array([0.9, 0.8])
    keep_rot = np.asarray(nms_bev(boxes, scores, 0.5, rotated=True))
    keep_norm = np.asarray(nms_bev(boxes, scores, 0.5, rotated=False))
    assert keep_rot.tolist() == [True, True]
    assert keep_norm.tolist() == [True, False]


def test_aligned_3d_nms_classwise():
    boxes = jnp.array(
        [
            [0.0, 0.0, 0.0, 1.0, 1.0, 1.0],
            [0.05, 0.0, 0.0, 1.05, 1.0, 1.0],
        ]
    )
    scores = jnp.array([0.9, 0.8])
    same = np.asarray(aligned_3d_nms(boxes, scores, jnp.array([0, 0]), 0.25))
    diff = np.asarray(aligned_3d_nms(boxes, scores, jnp.array([0, 1]), 0.25))
    assert same.tolist() == [True, False]
    assert diff.tolist() == [True, True]


def test_average_precision_perfect():
    recalls = np.array([0.5, 1.0])
    precisions = np.array([1.0, 1.0])
    ap = average_precision(recalls, precisions)
    np.testing.assert_allclose(ap, [1.0], atol=1e-6)


def test_indoor_eval_perfect_detection():
    gt = [
        {
            "gt_boxes_3d": np.array([[0, 0, 0, 1, 1, 1, 0], [3, 3, 0, 1, 1, 1, 0]]),
            "gt_labels_3d": np.array([0, 1]),
        }
    ]
    dt = [
        {
            "boxes_3d": np.array([[0, 0, 0, 1, 1, 1, 0], [3, 3, 0, 1, 1, 1, 0]]),
            "scores_3d": np.array([0.9, 0.8]),
            "labels_3d": np.array([0, 1]),
        }
    ]
    ret = indoor_eval(gt, dt, (0.25, 0.5), {0: "chair", 1: "table"})
    assert ret["mAP_0.25"] == 1.0
    assert ret["mAP_0.50"] == 1.0
    assert ret["chair_AP_0.25"] == 1.0


def test_indoor_eval_false_positive_and_miss():
    gt = [
        {
            "gt_boxes_3d": np.array([[0, 0, 0, 1, 1, 1, 0], [5, 5, 0, 1, 1, 1, 0]]),
            "gt_labels_3d": np.array([0, 0]),
        }
    ]
    # one perfect match (higher score), one FP far from any gt
    dt = [
        {
            "boxes_3d": np.array([[0, 0, 0, 1, 1, 1, 0], [9, 9, 0, 1, 1, 1, 0]]),
            "scores_3d": np.array([0.9, 0.8]),
            "labels_3d": np.array([0, 0]),
        }
    ]
    ret = indoor_eval(gt, dt, (0.25,), {0: "chair"})
    # recall 0.5 with precision 1.0 then drop: area AP = 0.5
    np.testing.assert_allclose(ret["chair_AP_0.25"], 0.5, atol=1e-6)
    np.testing.assert_allclose(ret["mAR_0.25"], 0.5, atol=1e-6)


def test_indoor_eval_duplicate_detection_counts_fp():
    gt = [
        {
            "gt_boxes_3d": np.array([[0, 0, 0, 1, 1, 1, 0]]),
            "gt_labels_3d": np.array([0]),
        }
    ]
    dt = [
        {
            "boxes_3d": np.array([[0, 0, 0, 1, 1, 1, 0], [0, 0, 0, 1, 1, 1, 0]]),
            "scores_3d": np.array([0.9, 0.8]),
            "labels_3d": np.array([0, 0]),
        }
    ]
    ret = indoor_eval(gt, dt, (0.25,), {0: "chair"})
    # second detection of the same gt is an FP; AP stays 1.0 (recall hit at rank 1)
    np.testing.assert_allclose(ret["chair_AP_0.25"], 1.0, atol=1e-6)


def test_indoor_eval_golden_reference_values():
    """Golden values ported from the reference's
    `tests/test_metrics/test_indoor_eval.py:8-130` (same detections, same
    GT, same expected per-class AP / mAP / mAR)."""
    from fcaf3d_tpu.data.datasets import boxes_to_bottom_center

    det_boxes = np.array([
        [-2.4089e-03, -3.3174e+00, 4.9438e-01, 2.1668e+00, 2.8431e-01, 1.6506e+00, 0.0],
        [-3.4269e-01, -2.7565e+00, 2.8144e-02, 6.8554e-01, 9.6854e-01, 6.1755e-01, 0.0],
        [-3.8320e+00, -1.0646e+00, 1.7074e-01, 2.4981e-01, 4.4708e-01, 6.2538e-01, 0.0],
        [4.1073e-01, 3.3757e+00, 3.4311e-01, 8.0617e-01, 2.8679e-01, 1.6060e+00, 0.0],
        [6.1199e-01, -3.1041e+00, 4.1873e-01, 1.2310e+00, 4.0162e-01, 1.7303e+00, 0.0],
        [-5.9877e-01, -2.6011e+00, 1.1148e+00, 1.5704e-01, 7.5957e-01, 9.6930e-01, 0.0],
        [2.7462e-01, -3.0088e+00, 6.5231e-02, 8.1208e-01, 4.1861e-01, 3.7339e-01, 0.0],
        [-1.4704e+00, -2.0024e+00, 2.7479e-01, 1.7888e+00, 1.0566e+00, 1.3704e+00, 0.0],
        [8.2727e-02, -3.1160e+00, 2.5690e-01, 1.4054e+00, 2.0772e-01, 9.6792e-01, 0.0],
        [2.6896e+00, 1.9881e+00, 1.1566e+00, 9.9885e-02, 3.5713e-01, 4.5638e-01, 0.0],
    ])
    # det boxes in the reference test carry origin (.5, .5, 0): already
    # bottom-centered. GT goes through indoor_eval's origin (.5, .5, .5).
    gt_raw = det_boxes.copy()
    dt = [{
        "boxes_3d": det_boxes,
        "labels_3d": np.array([0, 1, 2, 2, 0, 3, 1, 2, 3, 2]),
        "scores_3d": np.array([
            1.7516e-05, 1.0167e-06, 8.4486e-07, 7.1048e-02, 6.4274e-05,
            1.5003e-07, 5.8102e-06, 1.9399e-08, 5.3126e-07, 1.8630e-09,
        ]),
    }]
    gt = [{
        "gt_boxes_3d": boxes_to_bottom_center(gt_raw),
        "gt_labels_3d": np.array([0, 1, 2, 0, 0, 3, 1, 3, 3, 2]),
    }]
    label2cat = {0: "cabinet", 1: "bed", 2: "chair", 3: "sofa"}
    ret = indoor_eval(gt, dt, (0.25, 0.5), label2cat)
    assert np.isclose(ret["cabinet_AP_0.25"], 0.666667, atol=1e-4)
    assert np.isclose(ret["bed_AP_0.25"], 1.0, atol=1e-4)
    assert np.isclose(ret["chair_AP_0.25"], 0.5, atol=1e-4)
    assert np.isclose(ret["mAP_0.25"], 0.708333, atol=1e-4)
    assert np.isclose(ret["mAR_0.25"], 0.833333, atol=1e-4)


def test_indoor_eval_less_classes_golden():
    """Second golden case (`test_indoor_eval_less_classes`, reference
    `:133-182`): classes present in GT but not in dets and vice versa."""
    from fcaf3d_tpu.data.datasets import boxes_to_bottom_center

    box = np.array([[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]])
    dt = [
        {"boxes_3d": box, "labels_3d": np.array([0]), "scores_3d": np.array([0.5])},
        {"boxes_3d": box, "labels_3d": np.array([1]), "scores_3d": np.array([0.5])},
    ]
    gt = [
        {"gt_boxes_3d": boxes_to_bottom_center(
            np.array([[0., 0., 0., 1., 1., 1., 1.], [1., 1., 1., 1., 1., 1., 1.]])),
         "gt_labels_3d": np.array([2, 0])},
        {"gt_boxes_3d": boxes_to_bottom_center(box),
         "gt_labels_3d": np.array([1])},
    ]
    ret = indoor_eval(gt, dt, (0.25, 0.5), {0: "cabinet", 1: "bed", 2: "chair"})
    assert np.isclose(ret["mAP_0.25"], 0.666667, atol=1e-4)
    assert np.isclose(ret["mAR_0.25"], 0.666667, atol=1e-4)


def test_native_iou_matches_numpy_reference():
    """The C++ eval kernel (fcaf3d_tpu.native, iou3d_cuda analog) must be
    numerically interchangeable with the numpy reference path."""
    from fcaf3d_tpu.core.eval import _pairwise_iou_3d_numpy
    from fcaf3d_tpu.native import pairwise_iou_3d

    nat_check = pairwise_iou_3d(np.zeros((1, 7), np.float32) + 1,
                                np.zeros((1, 7), np.float32) + 1)
    if nat_check is None:
        import pytest

        pytest.skip("native build unavailable")
    rng = np.random.RandomState(7)
    for _ in range(3):
        n, m = rng.randint(1, 60), rng.randint(1, 30)
        b1 = np.zeros((n, 7), np.float32)
        b1[:, :2] = rng.uniform(-3, 3, (n, 2))
        b1[:, 2] = rng.uniform(-1, 1, n)
        b1[:, 3:6] = rng.uniform(0.2, 2.0, (n, 3))
        b1[:, 6] = rng.uniform(-3.2, 3.2, n)
        b2 = np.zeros((m, 7), np.float32)
        b2[:, :2] = rng.uniform(-3, 3, (m, 2))
        b2[:, 2] = rng.uniform(-1, 1, m)
        b2[:, 3:6] = rng.uniform(0.2, 2.0, (m, 3))
        b2[:, 6] = rng.uniform(-3.2, 3.2, m)
        nat = pairwise_iou_3d(b1, b2)
        ref = _pairwise_iou_3d_numpy(b1, b2)
        np.testing.assert_allclose(nat, ref, atol=1e-5)
    # identical rotated boxes -> IoU 1
    np.testing.assert_allclose(
        pairwise_iou_3d(b1[:5], b1[:5]).diagonal(), 1.0, atol=1e-5)
