from . import (  # noqa: F401
    early_stopping,
    grid_search,
    loss,
    optimizer,
    train_step,
    trainer,
)
