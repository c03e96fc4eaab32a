from .loop import TrainConfig, Trainer  # noqa: F401
