from .trainer import TrainState, create_train_state, make_train_step  # noqa: F401
from .optim import make_optimizer, step_lr_schedule  # noqa: F401
