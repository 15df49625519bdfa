from .losses import dice_loss, dice_ce_loss, softmax_cross_entropy  # noqa: F401
from .train_state import TrainState, create_train_state  # noqa: F401
from .trainer import Trainer  # noqa: F401
