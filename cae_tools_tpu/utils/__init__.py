from .model_database import ModelDatabase  # noqa: F401
