from .sizer import LayerSpec, ModelSpec, create_model_spec  # noqa: F401
from .base import BaseModel  # noqa: F401
from .conv_ae_model import ConvAEModel  # noqa: F401
from .linear_model import LinearModel  # noqa: F401
from .var_ae_model import VarAEModel  # noqa: F401
from .unet_model import UNET, UNETRes  # noqa: F401
from .resunet_gan import ResUNetGAN  # noqa: F401
from .srcnn_res_model import SRCNNRes  # noqa: F401
from .metrics import ModelMetric  # noqa: F401

#: parameters.json "type" -> model class (dispatch used by CLI + evaluator,
#: reference model_evaluator.py:70-78)
MODEL_TYPES = {
    "ConvAEModel": ConvAEModel,
    "LinearModel": LinearModel,
    "VarAEModel": VarAEModel,
    "UNET": UNET,
    "UNETRes": UNETRes,
    "ResUNetGAN": ResUNetGAN,
    "SRCNNRes": SRCNNRes,
}


def load_model(model_folder):
    """Instantiate + load whichever model type a folder contains."""
    import json
    import os

    with open(os.path.join(model_folder, "parameters.json")) as f:
        parameters = json.loads(f.read())
    cls = MODEL_TYPES.get(parameters["type"])
    if cls is None:
        raise ValueError(f"unknown model type {parameters['type']!r}")
    model = cls()
    model.load(model_folder)
    return model
