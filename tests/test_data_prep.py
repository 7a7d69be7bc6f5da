"""Raw-data extractors (`tools/data_prep/`) on synthetic raw fixtures."""
import json
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools",
                                "data_prep"))

from plyio import read_mesh_vertices_rgb, read_ply_vertices  # noqa: E402


def write_ply(path, verts, binary=True):
    n = len(verts)
    header = [
        "ply",
        "format binary_little_endian 1.0" if binary else "format ascii 1.0",
        f"element vertex {n}",
        "property float x", "property float y", "property float z",
        "property uchar red", "property uchar green", "property uchar blue",
        "end_header",
    ]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if binary:
            rec = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                                     ("r", "u1"), ("g", "u1"), ("b", "u1")])
            for i, k in enumerate("xyz"):
                rec[k] = verts[:, i]
            for i, k in enumerate("rgb"):
                rec[k] = verts[:, 3 + i]
            f.write(rec.tobytes())
        else:
            for v in verts:
                f.write((f"{v[0]} {v[1]} {v[2]} "
                         f"{int(v[3])} {int(v[4])} {int(v[5])}\n").encode())


@pytest.mark.parametrize("binary", [True, False])
def test_ply_reader(tmp_path, binary):
    rng = np.random.RandomState(0)
    verts = np.concatenate(
        [rng.randn(50, 3), rng.randint(0, 256, (50, 3))], 1)
    p = str(tmp_path / "m.ply")
    write_ply(p, verts, binary)
    out = read_mesh_vertices_rgb(p)
    np.testing.assert_allclose(out[:, :3], verts[:, :3], atol=1e-5)
    np.testing.assert_array_equal(out[:, 3:], verts[:, 3:].astype(np.float32))


def test_scannet_export(tmp_path):
    from load_scannet_data import export_scene

    scene = "scene0042_00"
    sdir = tmp_path / "scans" / scene
    os.makedirs(sdir)
    rng = np.random.RandomState(1)
    n = 400
    verts = np.concatenate(
        [rng.uniform(0, 4, (n, 3)), rng.randint(0, 256, (n, 3))], 1)
    # two instances: chairs occupying known point ranges
    verts[:100, :3] = rng.uniform(0.0, 1.0, (100, 3))
    verts[100:200, :3] = rng.uniform(2.0, 3.0, (100, 3))
    write_ply(str(sdir / f"{scene}_vh_clean_2.ply"), verts)

    segs = np.zeros(n, int)
    segs[:100] = 7
    segs[100:200] = 9
    segs[200:] = 3
    with open(sdir / f"{scene}_vh_clean_2.0.010000.segs.json", "w") as f:
        json.dump({"segIndices": segs.tolist()}, f)
    with open(sdir / f"{scene}.aggregation.json", "w") as f:
        json.dump({"segGroups": [
            {"objectId": 0, "label": "chair", "segments": [7]},
            {"objectId": 1, "label": "chair", "segments": [9]},
        ]}, f)
    with open(sdir / f"{scene}.txt", "w") as f:
        f.write("axisAlignment = 1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1\n")
    with open(tmp_path / "labels.tsv", "w") as f:
        f.write("raw_category\tnyu40id\nchair\t5\n")

    mesh, sem, ins, unal, al, mat = export_scene(
        str(tmp_path / "scans"), scene, str(tmp_path / "labels.tsv"),
        output_prefix=str(tmp_path / scene), max_num_point=None)
    assert mesh.shape == (n, 6)
    assert (sem[:200] == 5).all() and (sem[200:] == 0).all()
    assert set(np.unique(ins[:100])) == {1}
    assert len(unal) == 2 and len(al) == 2
    # box 0 = min/max extents of the first instance, label nyu40=5
    np.testing.assert_allclose(
        unal[0, :3], (verts[:100, :3].min(0) + verts[:100, :3].max(0)) / 2,
        atol=1e-5)
    assert unal[0, 6] == 5
    assert os.path.isfile(str(tmp_path / f"{scene}_aligned_bbox.npy"))


def test_s3dis_export(tmp_path):
    from collect_s3dis_data import export_room

    anno = tmp_path / "office_1" / "Annotations"
    os.makedirs(anno)
    rng = np.random.RandomState(2)
    a = np.concatenate([rng.uniform(1, 2, (30, 3)), rng.randint(0, 256, (30, 3))], 1)
    b = np.concatenate([rng.uniform(3, 4, (20, 3)), rng.randint(0, 256, (20, 3))], 1)
    np.savetxt(anno / "chair_1.txt", a)
    np.savetxt(anno / "staris_7.txt", b)  # typo class -> clutter
    out = str(tmp_path / "Area_1_office_1")
    export_room(str(anno), out)
    pts = np.load(out + "_point.npy")
    sem = np.load(out + "_sem_label.npy")
    ins = np.load(out + "_ins_label.npy")
    assert len(pts) == 50
    assert pts[:, :3].min() >= 0  # shifted to origin
    assert (sem == 8).sum() == 30 and (sem == 12).sum() == 20  # chair, clutter
    assert set(np.unique(ins)) == {1, 2}


def test_sunrgbd_extract_roundtrip(tmp_path):
    """extract_one -> the trainval layout -> SUNRGBDConverter parses it."""
    from PIL import Image

    from extract_sunrgbd_data import extract_one, read_depth_points

    off = tmp_path / "OFFICIAL_SUNRGBD"
    os.makedirs(off / "raw")
    rng = np.random.RandomState(3)
    h, w = 30, 40
    depth_m = rng.uniform(0.5, 4.0, (h, w)).astype(np.float32)
    d16 = ((depth_m * 1000).astype(np.uint16) << 3)
    Image.fromarray(d16, mode="I;16").save(off / "raw" / "d.png")
    Image.fromarray(
        rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(
        off / "raw" / "r.jpg")

    k = np.array([[500.0, 0, 20], [0, 500.0, 15], [0, 0, 1]])
    # depth back-projection math matches the MATLAB read3dPoints
    pts, valid, _ = read_depth_points(str(off / "raw" / "d.png"), k)
    assert valid.all()
    np.testing.assert_allclose(
        pts.reshape(h, w, 3)[:, :, 1], depth_m, atol=2e-3)

    box3d = types.SimpleNamespace(
        classname="chair", centroid=np.array([1.0, 2.0, 0.5]),
        coeffs=np.array([0.4, 0.5, 0.45]),
        basis=np.array([[0.8, 0.6, 0], [-0.6, 0.8, 0], [0, 0, 1.0]]),
    )
    bb2 = types.SimpleNamespace(classname="chair",
                                gtBb2D=np.array([5.0, 6.0, 20.0, 15.0]))
    # depthpath/rgbpath: first 17 chars are stripped (the MATLAB prefix)
    prefix = "X" * 17
    meta = types.SimpleNamespace(
        depthpath=prefix + "raw/d.png", rgbpath=prefix + "raw/r.jpg",
        K=k, Rtilt=np.eye(3), groundtruth3DBB=np.array([box3d]),
    )
    meta2 = types.SimpleNamespace(groundtruth2DBB=np.array([bb2]))
    out = tmp_path / "trainval"
    for sub in ("depth", "image", "calib", "label"):
        os.makedirs(out / sub)
    extract_one([meta], [meta2], str(off), str(out), 1)

    # the framework converter must parse the produced layout
    from fcaf3d_tpu.data.converters import SUNRGBDConverter

    conv = SUNRGBDConverter.__new__(SUNRGBDConverter)
    conv.root = str(tmp_path)
    conv.split = "train"
    conv.split_dir = str(out)
    conv.label_dir = str(out / "label")
    conv.cat2label = {"chair": 3}
    info = conv._one(1)
    assert info["annos"]["gt_num"] == 1
    np.testing.assert_allclose(info["calib"]["K"], k, atol=1e-6)
    g = info["annos"]["gt_boxes_upright_depth"][0]
    np.testing.assert_allclose(g[:3], [1.0, 2.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(g[3:6], [1.0, 0.8, 0.9], atol=1e-6)  # 2*coeffs swapped l/w
    # heading from basis row: -atan2(b12, b11)
    np.testing.assert_allclose(g[6], -np.arctan2(0.6, 0.8), atol=1e-6)
    pc = np.fromfile(out.parent / "points" / "000001.bin", np.float32).reshape(-1, 6)
    assert len(pc) == h * w
