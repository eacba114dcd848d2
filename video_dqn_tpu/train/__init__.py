from .dqn import (
    TrainState,
    create_train_state,
    jit_train_step,
    make_loss_fn,
    make_train_step,
    run_train,
    state_shardings,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "jit_train_step",
    "make_loss_fn",
    "make_train_step",
    "run_train",
    "state_shardings",
]
