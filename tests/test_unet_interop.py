"""Reference-format UNET checkpoint interop.

Builds the reference's torch UNET encoder/decoder structure
(``unet.py:73-163``: ModuleList layout with dropout slots, SE attention
gates, raw skip concat with BN(2*out)) on a hand-authored layer spec whose
channel arithmetic closes, exports its torch state dict, loads it through
our compat path, and checks forward parity in eval mode.
"""

import json
import os
import uuid

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from cae_tools_tpu.models import UNET, load_model
from cae_tools_tpu.models.sizer import LayerSpec, ModelSpec
from cae_tools_tpu.nn import modules as M
from cae_tools_tpu.nn import torchio
from tests.test_torch_parity import from_nhwc, to_nhwc


def hand_spec():
    """32x32 -> 32x32 spec whose decoder concat channel math closes.

    encoder: (1,32,32) -> (2,15,15) -> (4,7,7); skip = (2,15,15)
    decoder: (8,7,7) -> (2,15,15) [concat skip -> 4] -> (4,15,15) -> (1,32,32)
    """
    enc = [
        LayerSpec(True, 3, 2, (1, 32, 32), (2, 15, 15)),
        LayerSpec(True, 3, 2, (2, 15, 15), (4, 7, 7)),
    ]
    dec = [
        LayerSpec(False, 3, 2, (8, 7, 7), (2, 15, 15)),
        LayerSpec(False, 4, 2, (4, 15, 15), (1, 32, 32)),
    ]
    return ModelSpec(enc, dec)


class TorchChannelAttention(tnn.Module):
    def __init__(self, in_planes, ratio=8):
        super().__init__()
        hidden = max(in_planes // ratio, 1)
        self.avg_pool = tnn.AdaptiveAvgPool2d(1)
        self.max_pool = tnn.AdaptiveMaxPool2d(1)
        self.fc1 = tnn.Conv2d(in_planes, hidden, 1, bias=False)
        self.relu1 = tnn.ReLU()
        self.fc2 = tnn.Conv2d(hidden, in_planes, 1, bias=False)
        self.sigmoid = tnn.Sigmoid()

    def forward(self, x):
        avg_out = self.fc2(self.relu1(self.fc1(self.avg_pool(x))))
        max_out = self.fc2(self.relu1(self.fc1(self.max_pool(x))))
        return self.sigmoid(avg_out + max_out)


class TorchUNetEncoder(tnn.Module):
    """Reference UNET Encoder structure (unet.py:73-112)."""

    def __init__(self, layers, latent, fc, dropout_rate=0.1):
        super().__init__()
        mods = []
        for l in layers:
            mods += [
                tnn.Conv2d(
                    l.input_dimensions[0], l.output_dimensions[0],
                    kernel_size=l.kernel_size, stride=l.stride,
                    padding=l.output_padding,
                ),
                tnn.BatchNorm2d(l.output_dimensions[0]),
                tnn.ReLU(True),
                tnn.Dropout(dropout_rate),
            ]
        self.encoder_cnn = tnn.ModuleList(mods)
        self.flatten = tnn.Flatten(start_dim=1)
        c, y, x = layers[-1].output_dimensions
        self.encoder_lin = tnn.Sequential(
            tnn.Linear(c * y * x, fc),
            tnn.BatchNorm1d(fc),
            tnn.ReLU(True),
            tnn.Dropout(dropout_rate),
            tnn.Linear(fc, latent),
            tnn.ReLU(True),
            tnn.Dropout(dropout_rate),
        )

    def forward(self, x):
        skips = []
        for layer in self.encoder_cnn:
            x = layer(x)
            if isinstance(layer, tnn.ReLU):
                skips.append(x)
        x = self.flatten(x)
        x = self.encoder_lin(x)
        skips.pop()
        return x, skips


class TorchUNetDecoder(tnn.Module):
    """Reference UNET Decoder structure (unet.py:114-163)."""

    def __init__(self, layers, latent, fc, dropout_rate=0.1):
        super().__init__()
        c, y, x = layers[0].input_dimensions
        self.unflat = (c, y, x)
        self.decoder_lin = tnn.Sequential(
            tnn.Linear(latent, fc),
            tnn.BatchNorm1d(fc),
            tnn.ReLU(True),
            tnn.Dropout(dropout_rate),
            tnn.Linear(fc, c * y * x),
            tnn.ReLU(True),
            tnn.Dropout(dropout_rate),
        )
        self.unflatten = tnn.Unflatten(dim=1, unflattened_size=(c, y, x))
        mods = []
        self.attention_layers = tnn.ModuleList()
        for l in layers:
            mods.append(
                tnn.ConvTranspose2d(
                    l.input_dimensions[0], l.output_dimensions[0],
                    kernel_size=l.kernel_size, stride=l.stride,
                    padding=l.output_padding,
                )
            )
            if l is not layers[-1]:
                self.attention_layers.append(
                    TorchChannelAttention(l.output_dimensions[0])
                )
                mods += [
                    tnn.BatchNorm2d(l.output_dimensions[0] * 2),
                    tnn.ReLU(True),
                    tnn.Dropout(dropout_rate),
                ]
        self.decoder_conv = tnn.ModuleList(mods)

    def forward(self, z, skips):
        x = self.decoder_lin(z)
        x = self.unflatten(x)
        skips = skips[::-1]
        skip_idx = 0
        for layer in self.decoder_conv:
            x = layer(x)
            if isinstance(layer, tnn.ConvTranspose2d) and skip_idx < len(skips):
                att = self.attention_layers[skip_idx](x)
                x = x * att
                x = torch.cat((x, skips[skip_idx]), 1)
                skip_idx += 1
        return torch.sigmoid(x)


def test_reference_unet_checkpoint_loads_and_matches(tmp_path):
    spec = hand_spec()
    latent, fc = 6, 12
    tenc = TorchUNetEncoder(spec.input_layers, latent, fc).eval()
    tdec = TorchUNetDecoder(spec.output_layers, latent, fc).eval()

    folder = str(tmp_path / "ref_unet")
    os.makedirs(folder)
    torch.save(tenc.state_dict(), os.path.join(folder, "encoder.weights"))
    torch.save(tdec.state_dict(), os.path.join(folder, "decoder.weights"))
    with open(os.path.join(folder, "normalisation.weights"), "w") as f:
        f.write(json.dumps([{"lowres": 0.0}, {"lowres": 1.0}, 0.0, 1.0]))
    parameters = {
        "type": "UNET",
        "input_shape": [1, 32, 32],
        "output_shape": [1, 32, 32],
        "batch_size": 4,
        "test_interval": 10,
        "encoded_dim_size": latent,
        "fc_size": fc,
        "lr": 0.001,
        "lambda_pearson": 1,
        "weight_decay": 1e-5,
        "dropout_rate": 0.1,
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
        f.write(json.dumps({"train_loss": [], "test_loss": [], "nr_epochs": 0}))
    with open(os.path.join(folder, "input_spec.json"), "w") as f:
        f.write(json.dumps([{"name": "lowres", "shape": [1, 32, 32]}]))
    with open(os.path.join(folder, "output_spec.json"), "w") as f:
        f.write(json.dumps({"name": "hires", "shape": [1, 32, 32]}))

    mt = load_model(folder)
    assert isinstance(mt, UNET)
    assert mt.decoder.compat_concat

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(4, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        z, skips = tenc(torch.from_numpy(x))
        ref = tdec(z, skips).numpy()
    ours = np.asarray(mt._forward_eval(jnp.asarray(to_nhwc(x))))
    np.testing.assert_allclose(from_nhwc(ours), ref, rtol=1e-4, atol=1e-5)

    # round-trip: our compat export reproduces the torch key set + values
    enc_sd = torchio.unet_encoder_to_state_dict(
        mt.encoder, mt.params["encoder"], mt.state["encoder"]
    )
    for k, v in tenc.state_dict().items():
        np.testing.assert_allclose(enc_sd[k], v.numpy(), rtol=1e-6, err_msg=k)
    dec_sd = torchio.unet_decoder_compat_to_state_dict(
        mt.decoder, mt.params["decoder"], mt.state["decoder"]
    )
    for k, v in tdec.state_dict().items():
        np.testing.assert_allclose(dec_sd[k], v.numpy(), rtol=1e-6, err_msg=k)

    # our own save/load of the compat model keeps predictions identical
    folder2 = str(tmp_path / "resaved")
    mt.input_shape = (1, 32, 32)
    mt.output_shape = (1, 32, 32)
    mt.normalisation_parameters = [{"lowres": 0.0}, {"lowres": 1.0}, 0.0, 1.0]
    mt.save(folder2)
    mt2 = load_model(folder2)
    assert mt2.decoder.compat_concat
    ours2 = np.asarray(mt2._forward_eval(jnp.asarray(to_nhwc(x))))
    np.testing.assert_allclose(ours2, ours, rtol=1e-6)
