"""Numerical parity vs torch for conv ops, BatchNorm, and full modules.

Torch reference models are constructed here from the documented architecture
(encoder: Conv/BN/ReLU stack + 2-layer FC head, ``encoder.py:39-58``;
decoder: FC head + ConvT/BN/ReLU stack + sigmoid, ``decoder.py:31-50``;
linear: flatten/Linear/unflatten, ``linear.py:41-45``) and weights are
transferred through `nn.torchio` in both directions.  Forward outputs must
agree to float32 tolerance — this is the 1e-5 output-parity contract.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

from cae_tools_tpu.models.sizer import create_model_spec
from cae_tools_tpu.nn import modules as M
from cae_tools_tpu.nn import torchio
from cae_tools_tpu.ops.convops import conv2d, conv_transpose2d

import jax
import jax.numpy as jnp

RTOL = 1e-5
ATOL = 1e-5


def to_nhwc(x):
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


def from_nhwc(x):
    return np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))


def test_conv2d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 17)).astype(np.float32)
    conv = tnn.Conv2d(3, 5, kernel_size=(3, 4), stride=2)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x)).numpy()
    w = torchio.conv_w_from_torch(conv.weight.detach().numpy())
    ours = conv2d(jnp.asarray(to_nhwc(x)), jnp.asarray(w), stride=2) + jnp.asarray(
        conv.bias.detach().numpy()
    )
    np.testing.assert_allclose(from_nhwc(np.asarray(ours)), ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("output_padding", [0, 1])
def test_conv_transpose2d_matches_torch(output_padding):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 7, 6)).astype(np.float32)
    conv = tnn.ConvTranspose2d(
        4, 3, kernel_size=(4, 3), stride=2, output_padding=output_padding
    )
    with torch.no_grad():
        ref = conv(torch.from_numpy(x)).numpy()
    w = torchio.convT_w_from_torch(conv.weight.detach().numpy())
    ours = conv_transpose2d(
        jnp.asarray(to_nhwc(x)), jnp.asarray(w), stride=2, output_padding=output_padding
    ) + jnp.asarray(conv.bias.detach().numpy())
    np.testing.assert_allclose(from_nhwc(np.asarray(ours)), ref, rtol=RTOL, atol=ATOL)


def test_batchnorm_train_and_eval_match_torch():
    rng = np.random.default_rng(2)
    x1 = rng.normal(size=(4, 3, 5, 5)).astype(np.float32)
    x2 = rng.normal(size=(4, 3, 5, 5)).astype(np.float32)
    bn = tnn.BatchNorm2d(3)
    bn.train()
    with torch.no_grad():
        y1_ref = bn(torch.from_numpy(x1)).numpy()
        y2_ref = bn(torch.from_numpy(x2)).numpy()
    bn.eval()
    with torch.no_grad():
        ye_ref = bn(torch.from_numpy(x1)).numpy()

    bp, bs = M.bn_init(3)
    y1, bs = M.bn_apply(bp, bs, jnp.asarray(to_nhwc(x1)), True, axes=(0, 1, 2))
    y2, bs = M.bn_apply(bp, bs, jnp.asarray(to_nhwc(x2)), True, axes=(0, 1, 2))
    ye, _ = M.bn_apply(bp, bs, jnp.asarray(to_nhwc(x1)), False, axes=(0, 1, 2))
    np.testing.assert_allclose(from_nhwc(np.asarray(y1)), y1_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(from_nhwc(np.asarray(y2)), y2_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        bs["mean"], bn.running_mean.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        bs["var"], bn.running_var.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(from_nhwc(np.asarray(ye)), ye_ref, rtol=1e-4, atol=1e-5)


# -- torch reference model builders (documented reference architecture) -----

def build_torch_encoder(spec, latent, fc_size):
    layers = []
    for l in spec.input_layers:
        layers += [
            tnn.Conv2d(
                l.input_dimensions[0],
                l.output_dimensions[0],
                kernel_size=l.kernel_size,
                stride=l.stride,
            ),
            tnn.BatchNorm2d(l.output_dimensions[0]),
            tnn.ReLU(True),
        ]
    c, y, x = spec.input_layers[-1].output_dimensions

    class TEnc(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder_cnn = tnn.Sequential(*layers)
            self.flatten = tnn.Flatten(start_dim=1)
            self.encoder_lin = tnn.Sequential(
                tnn.Linear(c * y * x, fc_size),
                tnn.ReLU(True),
                tnn.Linear(fc_size, latent),
            )

        def forward(self, v):
            return self.encoder_lin(self.flatten(self.encoder_cnn(v)))

    return TEnc()


def build_torch_decoder(spec, latent, fc_size):
    c, y, x = spec.output_layers[0].input_dimensions
    convs = []
    out_layers = spec.output_layers
    for l in out_layers:
        convs.append(
            tnn.ConvTranspose2d(
                l.input_dimensions[0],
                l.output_dimensions[0],
                kernel_size=l.kernel_size,
                stride=l.stride,
                output_padding=l.output_padding,
            )
        )
        if l is not out_layers[-1]:
            convs += [tnn.BatchNorm2d(l.output_dimensions[0]), tnn.ReLU(True)]

    class TDec(tnn.Module):
        def __init__(self):
            super().__init__()
            self.decoder_lin = tnn.Sequential(
                tnn.Linear(latent, fc_size),
                tnn.ReLU(True),
                tnn.Linear(fc_size, c * y * x),
            )
            self.unflatten = tnn.Unflatten(dim=1, unflattened_size=(c, y, x))
            self.decoder_conv = tnn.Sequential(*convs)

        def forward(self, v):
            return torch.sigmoid(self.decoder_conv(self.unflatten(self.decoder_lin(v))))

    return TDec()


@pytest.fixture(scope="module")
def small_spec():
    return create_model_spec(
        input_size=(16, 16), input_channels=1, output_size=(64, 64),
        output_channels=1, stride=2, kernel_size=3,
    )


def test_encoder_forward_parity(small_spec):
    latent, fc = 8, 24
    tenc = build_torch_encoder(small_spec, latent, fc)
    tenc.eval()
    rng = np.random.default_rng(3)
    x = rng.uniform(size=(5, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tenc(torch.from_numpy(x)).numpy()

    enc = M.ConvEncoder(small_spec.input_layers, latent, fc)
    sd = {k: v.detach().numpy() for k, v in tenc.state_dict().items()}
    params, state = torchio.conv_encoder_from_state_dict(enc, sd)
    ours, _ = enc.apply(params, state, jnp.asarray(to_nhwc(x)), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    # round-trip export reproduces the torch state dict exactly
    sd2 = torchio.conv_encoder_to_state_dict(enc, params, state)
    for k in sd:
        np.testing.assert_allclose(sd2[k], sd[k], rtol=1e-6, atol=1e-7, err_msg=k)


def test_decoder_forward_parity(small_spec):
    latent, fc = 8, 24
    tdec = build_torch_decoder(small_spec, latent, fc)
    tdec.eval()
    rng = np.random.default_rng(4)
    z = rng.normal(size=(5, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tdec(torch.from_numpy(z)).numpy()

    dec = M.ConvDecoder(small_spec.output_layers, latent, fc)
    sd = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}
    params, state = torchio.conv_decoder_from_state_dict(dec, sd)
    ours, _ = dec.apply(params, state, jnp.asarray(z), train=False)
    np.testing.assert_allclose(
        from_nhwc(np.asarray(ours)), ref, rtol=1e-4, atol=1e-5
    )

    sd2 = torchio.conv_decoder_to_state_dict(dec, params, state)
    for k in sd:
        np.testing.assert_allclose(sd2[k], sd[k], rtol=1e-6, atol=1e-7, err_msg=k)


def test_linear_forward_parity():
    in_shape, out_shape = (2, 6, 5), (1, 12, 10)

    class TLin(tnn.Module):
        def __init__(self):
            super().__init__()
            c1, y1, x1 = in_shape
            c2, y2, x2 = out_shape
            self.linear = tnn.Sequential(
                tnn.Flatten(start_dim=1),
                tnn.Linear(c1 * y1 * x1, c2 * y2 * x2),
                tnn.Unflatten(dim=1, unflattened_size=(c2, y2, x2)),
            )

        def forward(self, v):
            return self.linear(v)

    tlin = TLin()
    tlin.eval()
    rng = np.random.default_rng(5)
    x = rng.uniform(size=(3,) + in_shape).astype(np.float32)
    with torch.no_grad():
        ref = tlin(torch.from_numpy(x)).numpy()

    lin = M.LinearMap(in_shape, out_shape)
    sd = {k: v.detach().numpy() for k, v in tlin.state_dict().items()}
    params = torchio.linear_from_state_dict(lin, sd)
    ours, _ = lin.apply(params, {}, jnp.asarray(to_nhwc(x)), train=False)
    np.testing.assert_allclose(
        from_nhwc(np.asarray(ours)), ref, rtol=1e-4, atol=1e-5
    )

    sd2 = torchio.linear_to_state_dict(lin, params)
    for k in sd:
        np.testing.assert_allclose(sd2[k], sd[k], rtol=1e-6, atol=1e-7, err_msg=k)


def test_state_dict_file_roundtrip(tmp_path, small_spec):
    enc = M.ConvEncoder(small_spec.input_layers, 8, 24)
    params, state = enc.init(jax.random.PRNGKey(0))
    sd = torchio.conv_encoder_to_state_dict(enc, params, state)
    path = str(tmp_path / "encoder.weights")
    torchio.save_state_dict(path, sd)
    # loadable by plain torch (the reference's load path)
    tsd = torch.load(path, map_location="cpu", weights_only=True)
    assert set(tsd.keys()) == set(sd.keys())
    assert tsd["encoder_cnn.1.num_batches_tracked"].dtype == torch.int64
    sd2 = torchio.load_state_dict(path)
    for k in sd:
        np.testing.assert_allclose(sd2[k], sd[k], rtol=0, atol=0, err_msg=k)


def test_flatten_unflatten_pytree():
    tree = {
        "convs": [{"w": np.ones((2, 2)), "b": np.zeros((2,))}, None],
        "fc": {"w": np.full((3,), 2.0)},
    }
    flat = torchio.flatten_pytree(tree)
    back = torchio.unflatten_pytree(flat)
    assert back["convs"][1] is None
    np.testing.assert_allclose(back["convs"][0]["w"], tree["convs"][0]["w"])
    np.testing.assert_allclose(back["fc"]["w"], tree["fc"]["w"])
