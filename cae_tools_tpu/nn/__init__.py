from . import init, modules, torchio  # noqa: F401
