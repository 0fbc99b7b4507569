from .train_step import (  # noqa: F401
    TrainState, create_flow_train_state, make_flow_train_step,
    make_optimizer, warmup_lr)
