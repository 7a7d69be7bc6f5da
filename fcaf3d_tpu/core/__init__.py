from . import eval, geometry, nms, rotated_iou  # noqa: F401
