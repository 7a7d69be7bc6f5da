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
