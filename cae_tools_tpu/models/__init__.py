from .sizer import LayerSpec, ModelSpec, create_model_spec  # noqa: F401
