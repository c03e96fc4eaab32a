from .convops import conv2d, conv_transpose2d  # noqa: F401
from . import losses  # noqa: F401
