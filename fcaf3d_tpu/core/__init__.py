from . import anchors, eval, geometry, nms, rotated_iou, voxel  # noqa: F401
