from . import metrics
from .engine import (
    EpochDriver,
    TrainState,
    aggregate_runs,
    init_state,
    l1_l2_regularizer,
    make_adamw,
    param_count,
    set_lr_scale,
    set_seed,
)
from .schedulers import ReduceLROnPlateau, warmup_scale
