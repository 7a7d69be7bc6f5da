from .datasets import (  # noqa: F401
    S3DIS_CLASSES,
    SCANNET_CLASSES,
    SUNRGBD_CLASSES,
    ConcatDataset,
    IndoorDetDataset,
    RepeatDataset,
    build_scannet,
    build_s3dis,
    build_sunrgbd,
)
from .loader import Loader, collate  # noqa: F401
from .pipelines import (  # noqa: F401
    Compose,
    GlobalAlignment,
    GlobalRotScaleTrans,
    ObjectNameFilter,
    PointSample,
    PointShuffle,
    PointsRangeFilter,
    RandomDropPointsColor,
    RandomFlip,
    RandomJitterPoints,
    ShiftHeight,
)
