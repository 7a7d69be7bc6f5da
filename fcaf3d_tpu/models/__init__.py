from .detector import FCAF3D, fcaf3d_get_bboxes, fcaf3d_loss, loss_config, infer_config  # noqa: F401
from .fcaf3d_head import Fcaf3DNeckWithHead, bbox_pred_to_bbox  # noqa: F401
from .me_resnet import MEResNet3D  # noqa: F401
from .votenet_v1 import (  # noqa: F401
    PartialBinBasedBBoxCoder,
    VoteNetV1,
    scannet_coder,
    sunrgbd_coder,
    votenet_v1_get_bboxes,
    votenet_v1_loss,
)
