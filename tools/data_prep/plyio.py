"""Minimal PLY vertex reader (numpy only; plyfile is not available).

Supports the ScanNet `_vh_clean_2.ply` flavor: binary-little-endian or
ascii, a `vertex` element with float x/y/z (+ optional uchar red/green/
blue and other scalar properties, which are parsed and exposed by name).
"""
from __future__ import annotations

import numpy as np

_TYPES = {
    "char": "i1", "uchar": "u1", "int8": "i1", "uint8": "u1",
    "short": "i2", "ushort": "u2", "int16": "i2", "uint16": "u2",
    "int": "i4", "uint": "u4", "int32": "i4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def read_ply_vertices(path: str) -> np.ndarray:
    """Returns a structured array of the `vertex` element."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype)])
        cur = None
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unterminated header")
            parts = line.decode("ascii", "replace").strip().split()
            if not parts or parts[0] == "comment":
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                cur = (parts[1], int(parts[2]), [])
                elements.append(cur)
            elif parts[0] == "property":
                if parts[1] == "list":
                    cur[2].append((parts[4], ("list", _TYPES[parts[2]],
                                              _TYPES[parts[3]])))
                else:
                    cur[2].append((parts[2], _TYPES[parts[1]]))
            elif parts[0] == "end_header":
                break

        endian = {"binary_little_endian": "<", "binary_big_endian": ">"}.get(fmt)
        vertex_data = None
        for name, count, props in elements:
            if any(isinstance(t, tuple) for _, t in props):
                if name == "vertex":
                    raise ValueError("list properties on vertex unsupported")
                if fmt == "ascii":
                    for _ in range(count):
                        f.readline()
                else:
                    # variable-length rows: walk them
                    for _ in range(count):
                        for pname, t in props:
                            if isinstance(t, tuple):
                                n = int(np.frombuffer(
                                    f.read(np.dtype(t[1]).itemsize),
                                    endian + t[1])[0])
                                f.read(n * np.dtype(t[2]).itemsize)
                            else:
                                f.read(np.dtype(t).itemsize)
                continue
            dtype = np.dtype(
                [(pname, (endian or "=") + t) for pname, t in props])
            if fmt == "ascii":
                rows = [tuple(f.readline().split()) for _ in range(count)]
                data = np.array(
                    [tuple(float(v) for v in r) for r in rows],
                    dtype=np.dtype([(pname, "f8") for pname, _ in props]),
                ).astype(dtype)
            else:
                data = np.frombuffer(f.read(count * dtype.itemsize), dtype)
            if name == "vertex":
                vertex_data = data
        if vertex_data is None:
            raise ValueError(f"{path}: no vertex element")
        return vertex_data


def read_mesh_vertices_rgb(path: str) -> np.ndarray:
    """[N, 6] float32 xyz + rgb(0-255) (reference
    `data/scannet/scannet_utils.py:66-86` semantics)."""
    v = read_ply_vertices(path)
    out = np.zeros((len(v), 6), np.float32)
    for i, k in enumerate(("x", "y", "z", "red", "green", "blue")):
        out[:, i] = v[k]
    return out
