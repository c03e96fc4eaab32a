from .dataset import ArrayDataset  # noqa: F401
