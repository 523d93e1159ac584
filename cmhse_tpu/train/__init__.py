from cmhse_tpu.train.objective import total_loss
from cmhse_tpu.train.state import (TrainState, create_train_state,
                                   train_step, train_steps)

__all__ = ["total_loss", "TrainState", "create_train_state",
           "train_step", "train_steps"]
