from . import (  # noqa: F401
    anchors,
    box_np_ops,
    eval,
    geometry,
    nms,
    points,
    rotated_iou,
    voxel,
)
