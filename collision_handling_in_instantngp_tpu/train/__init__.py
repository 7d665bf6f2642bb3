from . import early_stopping, loss, optimizer, train_step  # noqa: F401
