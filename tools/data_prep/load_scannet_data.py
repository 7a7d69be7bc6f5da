#!/usr/bin/env python
"""Raw ScanNet scene -> detection npy arrays.

Clean-room equivalent of the reference's raw extractors
(`/root/reference/data/scannet/load_scannet_data.py` +
`batch_load_scannet_data.py`, themselves from votenet): reads a scene's
`_vh_clean_2.ply` mesh, `.aggregation.json`, `_vh_clean_2.0.010000.segs.json`
and `.txt` meta, maps raw categories to nyu40 ids via
`scannetv2-labels.combined.tsv`, and writes
`{scene}_vert.npy / _sem_label.npy / _ins_label.npy / _aligned_bbox.npy /
_unaligned_bbox.npy / _axis_align_matrix.npy` — the inputs
`tools/create_data.py scannet` consumes. Detection uses
`--max-num-point 50000` downsampling like the reference batch script.

Usage:
    python tools/data_prep/load_scannet_data.py \
        --scannet-dir scans/ --output-dir scannet_instance_data/ \
        --label-map scannetv2-labels.combined.tsv \
        [--scene scene0000_00 | --scene-index train.txt] \
        [--max-num-point 50000]
"""
import argparse
import csv
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from plyio import read_mesh_vertices_rgb  # noqa: E402

# instances of these nyu40 classes get boxes (the 18 det classes + extras,
# reference `batch_load_scannet_data.py` OBJ_CLASS_IDS)
OBJ_CLASS_IDS = np.array(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39])


def read_label_mapping(path, label_from="raw_category", label_to="nyu40id"):
    mapping = {}
    with open(path) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            mapping[row[label_from]] = int(row[label_to])
    return mapping


def read_aggregation(path):
    with open(path) as f:
        data = json.load(f)
    object_id_to_segs, label_to_segs = {}, {}
    for grp in data["segGroups"]:
        oid = grp["objectId"] + 1  # 1-indexed instances
        object_id_to_segs[oid] = grp["segments"]
        label_to_segs.setdefault(grp["label"], []).extend(grp["segments"])
    return object_id_to_segs, label_to_segs


def read_segmentation(path):
    with open(path) as f:
        seg_indices = json.load(f)["segIndices"]
    seg_to_verts = {}
    for i, s in enumerate(seg_indices):
        seg_to_verts.setdefault(s, []).append(i)
    return seg_to_verts, len(seg_indices)


def read_axis_align_matrix(meta_path):
    mat = np.eye(4)
    with open(meta_path) as f:
        for line in f:
            if "axisAlignment" in line:
                vals = [float(x) for x in
                        line.rstrip().strip("axisAlignment = ").split(" ")]
                mat = np.array(vals).reshape(4, 4)
                break
    return mat


def instance_bboxes(verts, object_id_to_segs, object_id_to_label_id, inst_ids):
    """[num_instances, 7] (cx, cy, cz, dx, dy, dz, nyu40 label)."""
    n = len(object_id_to_segs)
    out = np.zeros((n, 7))
    for oid in object_id_to_segs:
        pc = verts[inst_ids == oid, :3]
        if len(pc) == 0:
            continue
        mn, mx = pc.min(0), pc.max(0)
        out[oid - 1] = np.concatenate(
            [(mn + mx) / 2, mx - mn, [object_id_to_label_id[oid]]])
    return out


def export_scene(scan_dir, scene, label_map_file, output_prefix=None,
                 max_num_point=None, test_mode=False, rng=None):
    mesh = read_mesh_vertices_rgb(
        os.path.join(scan_dir, scene, f"{scene}_vh_clean_2.ply"))
    axis_align = read_axis_align_matrix(
        os.path.join(scan_dir, scene, f"{scene}.txt"))

    if not test_mode:
        label_map = read_label_mapping(label_map_file)
        o2s, l2s = read_aggregation(
            os.path.join(scan_dir, scene, f"{scene}.aggregation.json"))
        s2v, nv = read_segmentation(os.path.join(
            scan_dir, scene, f"{scene}_vh_clean_2.0.010000.segs.json"))
        sem = np.zeros(nv, np.uint32)
        for label, segs in l2s.items():
            lid = label_map[label]
            for s in segs:
                sem[s2v[s]] = lid
        ins = np.zeros(nv, np.uint32)
        o2l = {}
        for oid, segs in o2s.items():
            for s in segs:
                ins[s2v[s]] = oid
                o2l.setdefault(oid, sem[s2v[s][0]])
        unaligned = instance_bboxes(mesh, o2s, o2l, ins)

        pts = np.concatenate(
            [mesh[:, :3], np.ones((len(mesh), 1))], 1) @ axis_align.T
        aligned_mesh = np.concatenate([pts[:, :3], mesh[:, 3:]], 1)
        aligned = instance_bboxes(aligned_mesh, o2s, o2l, ins)
        keep = np.isin(unaligned[:, -1], OBJ_CLASS_IDS)
        unaligned, aligned = unaligned[keep], aligned[keep]
    else:
        sem = ins = unaligned = aligned = None

    if max_num_point is not None and len(mesh) > max_num_point:
        rng = rng or np.random.default_rng(0)
        choice = rng.choice(len(mesh), max_num_point, replace=False)
        mesh = mesh[choice]
        if not test_mode:
            sem, ins = sem[choice], ins[choice]

    if output_prefix is not None:
        np.save(output_prefix + "_vert.npy", mesh)
        np.save(output_prefix + "_axis_align_matrix.npy", axis_align)
        if not test_mode:
            np.save(output_prefix + "_sem_label.npy", sem)
            np.save(output_prefix + "_ins_label.npy", ins)
            np.save(output_prefix + "_unaligned_bbox.npy", unaligned)
            np.save(output_prefix + "_aligned_bbox.npy", aligned)
    return mesh, sem, ins, unaligned, aligned, axis_align


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scannet-dir", required=True, help="dir of scene dirs")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--label-map", required=True,
                    help="scannetv2-labels.combined.tsv")
    ap.add_argument("--scene", default=None, help="single scene id")
    ap.add_argument("--scene-index", default=None,
                    help="txt file listing scene ids")
    ap.add_argument("--max-num-point", type=int, default=50000)
    ap.add_argument("--test-mode", action="store_true")
    args = ap.parse_args()

    if args.scene:
        scenes = [args.scene]
    elif args.scene_index:
        scenes = [l.strip() for l in open(args.scene_index) if l.strip()]
    else:
        scenes = sorted(os.listdir(args.scannet_dir))
    os.makedirs(args.output_dir, exist_ok=True)
    for i, scene in enumerate(scenes):
        out = os.path.join(args.output_dir, scene)
        if os.path.exists(out + "_vert.npy"):
            continue
        print(f"[{i + 1}/{len(scenes)}] {scene}", flush=True)
        export_scene(args.scannet_dir, scene, args.label_map, out,
                     args.max_num_point, args.test_mode)


if __name__ == "__main__":
    main()
