"""Cross-implementation checkpoint-folder interop.

Simulates a model folder written by the *reference* implementation (torch
state dicts with the reference's exact key naming + the JSON sidecars,
formats per SURVEY.md §5 checkpoint/resume) and verifies our framework loads
it and reproduces the torch model's outputs; then verifies our own save()
produces a folder whose weight files torch can load with the reference key
set, and that geometry fuzzing holds the spec<->torch shape contract.
"""

import json
import os
import uuid

import numpy as np
import pytest
import torch

import jax

from cae_tools_tpu.models import ConvAEModel, load_model
from cae_tools_tpu.models.sizer import create_model_spec
from tests.test_torch_parity import (
    build_torch_decoder,
    build_torch_encoder,
    from_nhwc,
    to_nhwc,
)


def write_reference_style_folder(folder, spec, latent, fc, tenc, tdec):
    os.makedirs(folder, exist_ok=True)
    torch.save(tenc.state_dict(), os.path.join(folder, "encoder.weights"))
    torch.save(tdec.state_dict(), os.path.join(folder, "decoder.weights"))
    norm = [{"lowres": 280.0}, {"lowres": 300.0}, 285.0, 295.0]
    with open(os.path.join(folder, "normalisation.weights"), "w") as f:
        f.write(json.dumps(norm))
    in_shape = list(spec.input_layers[0].input_dimensions)
    out_shape = list(spec.output_layers[-1].output_dimensions)
    parameters = {
        "type": "ConvAEModel",
        "input_shape": in_shape,
        "output_shape": out_shape,
        "batch_size": 10,
        "test_interval": 10,
        "encoded_dim_size": latent,
        "fc_size": fc,
        "lr": 0.001,
        "weight_decay": 1e-5,
        "normalise_input": True,
        "normalise_output": True,
        "conv_kernel_size": 3,
        "conv_stride": 2,
        "conv_input_layer_count": None,
        "conv_output_layer_count": None,
        "model_id": str(uuid.uuid4()),
    }
    with open(os.path.join(folder, "parameters.json"), "w") as f:
        f.write(json.dumps(parameters))
    with open(os.path.join(folder, "spec.json"), "w") as f:
        f.write(json.dumps(spec.save()))
    with open(os.path.join(folder, "history.json"), "w") as f:
        f.write(json.dumps({"train_loss": [0.1], "test_loss": [0.2], "nr_epochs": 10}))
    with open(os.path.join(folder, "input_spec.json"), "w") as f:
        f.write(json.dumps([{"name": "lowres", "shape": in_shape}]))
    with open(os.path.join(folder, "output_spec.json"), "w") as f:
        f.write(json.dumps({"name": "hires", "shape": out_shape}))
    return parameters


def test_load_reference_written_folder(tmp_path):
    latent, fc = 6, 20
    spec = create_model_spec(
        input_size=(16, 16), input_channels=1, output_size=(64, 64),
        output_channels=1,
    )
    tenc = build_torch_encoder(spec, latent, fc).eval()
    tdec = build_torch_decoder(spec, latent, fc).eval()
    folder = str(tmp_path / "ref_model")
    parameters = write_reference_style_folder(folder, spec, latent, fc, tenc, tdec)

    mt = load_model(folder)
    assert isinstance(mt, ConvAEModel)
    assert mt.get_model_id() == parameters["model_id"]
    assert mt.get_input_variable_names() == ["lowres"]

    # identical outputs on the same inputs
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(5, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tdec(tenc(torch.from_numpy(x))).numpy()
    import jax.numpy as jnp

    ours = np.asarray(mt._forward_eval(jnp.asarray(to_nhwc(x))))
    np.testing.assert_allclose(from_nhwc(ours), ref, rtol=1e-4, atol=1e-5)

    # round-trip: our save() emits torch-loadable weight files with the
    # reference key set, and the JSON sidecars survive
    folder2 = str(tmp_path / "resaved")
    mt.save(folder2)
    sd = torch.load(
        os.path.join(folder2, "encoder.weights"), map_location="cpu",
        weights_only=True,
    )
    assert set(sd.keys()) == set(tenc.state_dict().keys())
    for k, v in tenc.state_dict().items():
        np.testing.assert_allclose(
            sd[k].numpy(), v.numpy(), rtol=1e-6, atol=1e-7, err_msg=k
        )
    params2 = json.loads(open(os.path.join(folder2, "parameters.json")).read())
    assert params2 == parameters


@pytest.mark.parametrize("seed", range(6))
def test_solver_fuzz_torch_shape_contract(seed):
    """Random geometries: solved specs must chain through torch layers."""
    from tests.test_sizer import torch_chain_shapes

    rng = np.random.default_rng(seed)
    in_h = int(rng.integers(6, 40))
    in_w = int(rng.integers(6, 40))
    out_h = int(rng.integers(in_h + 10, 300))
    out_w = int(rng.integers(in_w + 10, 300))
    kernel = int(rng.choice([3, 5]))
    stride = int(rng.choice([2, 3]))
    in_ch = int(rng.integers(1, 4))
    spec = create_model_spec(
        input_size=(in_h, in_w), input_channels=in_ch,
        output_size=(out_h, out_w), output_channels=1,
        kernel_size=kernel, stride=stride,
    )
    assert spec.output_layers[-1].output_dimensions == (1, out_h, out_w)
    torch_chain_shapes(spec)
