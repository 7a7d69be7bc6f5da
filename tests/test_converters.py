"""Converter round-trip tests on synthetic raw data."""
import os
import pickle

import numpy as np
import pytest

from fcaf3d_tpu.data.converters import S3DISConverter, ScanNetConverter
from fcaf3d_tpu.data.datasets import IndoorDetDataset, SCANNET_CLASSES


def test_scannet_converter_roundtrip(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "meta_data"))
    os.makedirs(os.path.join(root, "scannet_instance_data"))
    rng = np.random.RandomState(0)
    scans = ["scene0000_00", "scene0001_00"]
    with open(os.path.join(root, "meta_data", "scannetv2_train.txt"), "w") as f:
        f.write("\n".join(scans))
    for s in scans:
        n = 300
        verts = rng.rand(n, 6).astype(np.float32)
        np.save(os.path.join(root, "scannet_instance_data", f"{s}_vert.npy"), verts)
        np.save(os.path.join(root, "scannet_instance_data", f"{s}_ins_label.npy"),
                rng.randint(0, 5, n))
        np.save(os.path.join(root, "scannet_instance_data", f"{s}_sem_label.npy"),
                rng.randint(0, 40, n))
        # boxes: [k, 7] = (x, y, z, dx, dy, dz, nyu40_class_id)
        boxes = np.zeros((2, 7))
        boxes[:, :6] = rng.rand(2, 6) + 0.5
        boxes[:, 6] = [4, 5]  # bed, chair nyu ids
        np.save(os.path.join(root, "scannet_instance_data", f"{s}_aligned_bbox.npy"), boxes)
        np.save(os.path.join(root, "scannet_instance_data", f"{s}_unaligned_bbox.npy"), boxes)
        np.save(os.path.join(root, "scannet_instance_data", f"{s}_axis_align_matrix.npy"),
                np.eye(4))

    infos = ScanNetConverter(root, "train").convert()
    assert len(infos) == 2
    assert infos[0]["annos"]["gt_num"] == 2
    # nyu ids 4, 5 -> classes bed(1), chair(2)
    np.testing.assert_array_equal(infos[0]["annos"]["class"], [1, 2])

    # the produced layout is loadable by the dataset
    ds = IndoorDetDataset(
        root, os.path.join(root, "scannet_infos_train.pkl"), SCANNET_CLASSES
    )
    sample = ds(0, np.random.default_rng(0))
    assert sample["points"].shape == (300, 6)
    assert sample["gt_boxes"].shape == (2, 7)
    assert sample["axis_align_matrix"].shape == (4, 4)


def test_s3dis_converter_boxes_from_instances(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "s3dis_data"))
    rng = np.random.RandomState(0)
    n = 400
    pts = rng.rand(n, 6).astype(np.float32) * 4
    ins = np.zeros(n, np.int64)
    sem = np.full(n, 0, np.int64)
    # instance 1: a "table" (sem 7) occupying known extent
    ins[:100] = 1
    sem[:100] = 7
    pts[:100, :3] = rng.rand(100, 3) * [2, 1, 0.5] + [1, 1, 0]
    # instance 2: clutter (sem 12) -> ignored
    ins[100:150] = 2
    sem[100:150] = 12
    # instance 3 exists so range(1, ins.max()) includes 1 and 2
    ins[150:160] = 3
    sem[150:160] = 0
    np.save(os.path.join(root, "s3dis_data", "Area_1_office_1_point.npy"), pts)
    np.save(os.path.join(root, "s3dis_data", "Area_1_office_1_ins_label.npy"), ins)
    np.save(os.path.join(root, "s3dis_data", "Area_1_office_1_sem_label.npy"), sem)

    infos = S3DISConverter(root, "Area_1").convert()
    assert len(infos) == 1
    annos = infos[0]["annos"]
    assert annos["gt_num"] == 1
    assert annos["class"][0] == 0  # table
    box = annos["gt_boxes_upright_depth"][0]
    expect_min = pts[:100, :3].min(0)
    expect_max = pts[:100, :3].max(0)
    np.testing.assert_allclose(box[:3], (expect_min + expect_max) / 2, atol=1e-5)
    np.testing.assert_allclose(box[3:6], expect_max - expect_min, atol=1e-5)
