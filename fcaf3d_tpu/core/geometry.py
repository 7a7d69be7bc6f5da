"""Core 3D geometry utilities (pure jnp, static shapes).

Functional equivalents of the reference's box/rotation helpers
(`/root/reference/mmdet3d/core/bbox/structures/utils.py`,
`base_box3d.py`, `depth_box3d.py`), redesigned as stateless array ops.

Canonical box layout everywhere in this framework (same convention as the
reference's `BaseInstance3DBoxes.tensor`):

    box7 = (cx, cy, cz_bottom, dx, dy, dz, yaw)

i.e. the z coordinate is the *bottom* center; `gravity_center` lifts it by
dz/2. Axis-aligned boxes are box7 with yaw == 0 (callers track `with_yaw`
statically).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """Limit a periodic value into [-offset*period, (1-offset)*period)."""
    return val - jnp.floor(val / period + offset) * period


def rotation_matrix_z(angles):
    """Rotation matrices around +z for angles [...]. Returns [..., 3, 3].

    Matches the reference's `rotation_3d_in_axis(axis=2)` convention
    (`structures/utils.py:21-61`): points are row vectors multiplied by the
    transposed matrix; for +angle, (1, 0) maps to (cos, -sin) — i.e. a
    *clockwise* rotation in standard math orientation. Dataset yaw values,
    box corners and the assigner all share this convention.
    """
    c, s = jnp.cos(angles), jnp.sin(angles)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    # R_T (transposed rotation): p_rot = p @ R_T
    row0 = jnp.stack([c, -s, zeros], axis=-1)
    row1 = jnp.stack([s, c, zeros], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotate_points_z(points, angles):
    """Rotate points [..., N, 3] by per-batch angles [...] around +z.

    Equivalent to the reference's `rotation_3d_in_axis(points, angles, axis=2)`.
    """
    rot_t = rotation_matrix_z(angles)  # [..., 3, 3]
    return jnp.einsum("...nj,...jk->...nk", points, rot_t)


def gravity_center(boxes7):
    """Bottom-center box7 -> gravity (true) center [..., 3]."""
    return jnp.concatenate(
        [boxes7[..., :2], (boxes7[..., 2:3] + boxes7[..., 5:6] * 0.5)], axis=-1
    )


def box_volume(boxes7):
    return boxes7[..., 3] * boxes7[..., 4] * boxes7[..., 5]


def box7_corners(boxes7):
    """Corners of box7 [..., 7] -> [..., 8, 3].

    Corner order: binary (x, y, z) order over (min/max) in the box frame,
    z from bottom; yaw rotates around the gravity center's vertical axis
    through the box center (x, y), i.e. standard depth-box corners.
    """
    dims = boxes7[..., 3:6]
    # unit corners in {-0.5, 0.5}^3, z in {0, 1} measured from bottom
    ux = np.array([-0.5, -0.5, -0.5, -0.5, 0.5, 0.5, 0.5, 0.5])
    uy = np.array([-0.5, -0.5, 0.5, 0.5, -0.5, -0.5, 0.5, 0.5])
    uz = np.array([0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0])
    unit = jnp.asarray(np.stack([ux, uy, uz], axis=-1), dtype=boxes7.dtype)  # [8,3]
    corners = unit * dims[..., None, :]  # [..., 8, 3]
    corners = rotate_points_z(corners, boxes7[..., 6])
    origin = jnp.concatenate([boxes7[..., :2], boxes7[..., 2:3]], axis=-1)
    return corners + origin[..., None, :]


def bev_corners(boxes5):
    """BEV rotated rectangle (x, y, dx, dy, yaw) [..., 5] -> corners [..., 4, 2].

    Counterclockwise order starting at (+dx/2, +dy/2) in the box frame.
    """
    x, y = boxes5[..., 0:1], boxes5[..., 1:2]
    dx, dy = boxes5[..., 2:3], boxes5[..., 3:4]
    a = boxes5[..., 4:5]
    sx = jnp.asarray(np.array([0.5, -0.5, -0.5, 0.5]), dtype=boxes5.dtype)
    sy = jnp.asarray(np.array([0.5, 0.5, -0.5, -0.5]), dtype=boxes5.dtype)
    cx = sx * dx  # [..., 4]
    cy = sy * dy
    c, s = jnp.cos(a), jnp.sin(a)
    # same (clockwise-for-positive) convention as rotate_points_z
    rx = cx * c + cy * s + x
    ry = -cx * s + cy * c + y
    return jnp.stack([rx, ry], axis=-1)


def points_in_boxes(points, boxes7):
    """Test points [N, 3] against rotated boxes [G, 7] -> bool [N, G].

    A point is inside when, after un-rotating by the box yaw around the box
    gravity center, it lies within the half-dims on every axis (strictly
    inside, matching the reference assigner's `> 0` test,
    `fcaf3d_neck_with_head.py:428`).
    """
    centers = gravity_center(boxes7)  # [G, 3]
    shift = points[:, None, :] - centers[None, :, :]  # [N, G, 3]
    local = rotate_points_z(jnp.swapaxes(shift, 0, 1), -boxes7[:, 6])  # [G, N, 3]
    local = jnp.swapaxes(local, 0, 1)  # [N, G, 3]
    half = boxes7[None, :, 3:6] * 0.5
    return jnp.all(jnp.abs(local) < half, axis=-1)


def flip_box7(boxes7, axis: str):
    """BEV flip of boxes. axis='horizontal' flips x, 'vertical' flips y.

    Mirrors `DepthInstance3DBoxes.flip` semantics: negate the coordinate and
    reflect yaw accordingly.
    """
    x, y, z, dx, dy, dz, yaw = jnp.split(boxes7, 7, axis=-1)
    if axis == "horizontal":
        x = -x
        yaw = np.pi - yaw
    elif axis == "vertical":
        y = -y
        yaw = -yaw
    else:
        raise ValueError(axis)
    return jnp.concatenate([x, y, z, dx, dy, dz, yaw], axis=-1)


def rotate_box7(boxes7, angle):
    """Rotate boxes around the z axis (world origin) by `angle` (scalar)."""
    center = boxes7[..., :3]
    rotated = rotate_points_z(center[..., None, :], jnp.asarray(angle))[..., 0, :]
    yaw = boxes7[..., 6:7] + angle
    return jnp.concatenate([rotated, boxes7[..., 3:6], yaw], axis=-1)


def scale_box7(boxes7, factor):
    return jnp.concatenate(
        [boxes7[..., :6] * factor, boxes7[..., 6:7]], axis=-1
    )


def translate_box7(boxes7, trans):
    return jnp.concatenate(
        [boxes7[..., :3] + trans, boxes7[..., 3:7]], axis=-1
    )
