"""Training harness: state, jitted steps, plateau schedule, checkpointing."""

from pose3d_tpu.train.schedule import PlateauState, plateau_init, plateau_update  # noqa: F401
from pose3d_tpu.train.state import TrainState, create_train_state, make_optimizer  # noqa: F401
from pose3d_tpu.train.steps import (  # noqa: F401
    make_lifter_eval_step,
    make_lifter_train_step,
    plateau_step,
)
