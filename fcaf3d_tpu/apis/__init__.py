from .train import train_model  # noqa: F401
from .test import evaluate_dataset, detections_to_numpy  # noqa: F401
from .inference import inference_detector, init_detector  # noqa: F401
