"""Functional NN modules (pure apply functions over param pytrees).

TPU-first re-design of the reference's torch modules: activations are NHWC,
kernels HWIO, parameters live in plain nested-dict pytrees that jit/pjit/scan
consume directly, and BatchNorm running statistics are explicit state threaded
through the training step (no mutable module objects).

Architectural parity (cited to the reference):
 * ConvEncoder — [Conv(k,s) + BN + ReLU] x L, flatten, Linear->ReLU->Linear
   (``models/encoder.py:34-64``)
 * ConvDecoder — Linear->ReLU->Linear, unflatten, [ConvT + BN + ReLU] x (L-1),
   ConvT, sigmoid; kaiming/xavier init (``models/decoder.py:22-78``)
 * LinearMap — flatten -> Linear -> unflatten (``models/linear.py:33-49``)
 * VarAEEncoder — conv trunk emitting (mu, logvar) heads; the reference's
   VarAEModel source is missing upstream, contract reconstructed per
   SURVEY.md §2.11
 * UNet encoder/decoder with skip connections + SE-style channel attention
   (``models/unet.py:23-163``), with a fix-forward: after each attention-gated
   skip concat, a 1x1 fuse conv restores the spec channel count so the
   auto-solved spec arithmetic closes (the reference requires hand-authored
   specs, ``unet.py:138-161``).

BatchNorm matches torch semantics exactly (momentum 0.1, eps 1e-5, biased
variance for normalisation, unbiased for the running estimate).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp

from ..models.sizer import LayerSpec
from ..ops.convops import conv2d, conv_transpose2d, dense
from . import init as tinit

BN_MOMENTUM = 0.1
BN_EPS = 1e-5


# --------------------------------------------------------------------------
# batch norm
# --------------------------------------------------------------------------

def bn_init(num_features):
    params = {
        "scale": jnp.ones((num_features,), jnp.float32),
        "bias": jnp.zeros((num_features,), jnp.float32),
    }
    state = {
        "mean": jnp.zeros((num_features,), jnp.float32),
        "var": jnp.ones((num_features,), jnp.float32),
        "count": jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64 else jnp.int32),
    }
    return params, state


def bn_apply(params, state, x, train: bool, axes):
    """BatchNorm over ``axes`` (e.g. (0,1,2) for NHWC, (0,) for NC)."""
    if train:
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)  # biased, used for normalisation
        n = x.size // mean.size
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
            "count": state["count"] + 1,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x - mean) * inv * params["scale"] + params["bias"]
    return y, new_state


def dropout(rng, x, rate, train: bool):
    # `rate` may be a traced scalar (the vmapped-HPO sweep puts
    # dropout_rate on the trials axis, hpo/vmap_search.py): only
    # short-circuit on concrete values (incl. numpy scalars), and let
    # bernoulli take a traced p
    if not train or (
        not isinstance(rate, jax.core.Tracer) and float(rate) <= 0.0
    ):
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# --------------------------------------------------------------------------
# layer param initialisers (torch-statistics)
# --------------------------------------------------------------------------

def conv_params_default(rng, kh, kw, cin, cout):
    """torch Conv2d/ConvTranspose2d default init, stored HWIO."""
    r1, r2 = jax.random.split(rng)
    fan_in = cin * kh * kw
    return {
        "w": tinit.kaiming_uniform_a5(r1, (kh, kw, cin, cout), fan_in),
        "b": tinit.bias_uniform(r2, (cout,), fan_in),
    }


def dense_params_default(rng, fin, fout):
    r1, r2 = jax.random.split(rng)
    return {
        "w": tinit.kaiming_uniform_a5(r1, (fin, fout), fin),
        "b": tinit.bias_uniform(r2, (fout,), fin),
    }


def dense_params_kaiming_out(rng, fin, fout):
    return {
        "w": tinit.kaiming_normal_fan_out_relu(rng, (fin, fout), fout),
        "b": jnp.zeros((fout,), jnp.float32),
    }


def dense_params_xavier(rng, fin, fout):
    return {
        "w": tinit.xavier_normal(rng, (fin, fout), fin, fout),
        "b": jnp.zeros((fout,), jnp.float32),
    }


def convT_params_kaiming(rng, kh, kw, cin, cout):
    """Reference decoder ConvT init: kaiming_normal fan_out relu
    (``decoder.py:57-60``; torch fan_out for a ConvT weight = cin*k*k)."""
    fan_out = cin * kh * kw
    return {
        "w": tinit.kaiming_normal_fan_out_relu(rng, (kh, kw, cin, cout), fan_out),
        "b": jnp.zeros((cout,), jnp.float32),
    }


# --------------------------------------------------------------------------
# ConvEncoder (plain CAE)
# --------------------------------------------------------------------------

@dataclass
class ConvEncoder:
    layers: Sequence[LayerSpec]
    encoded_dim: int
    fc_size: int

    @property
    def flat_dims(self):
        c, y, x = self.layers[-1].get_output_dimensions()
        return int(c), int(y), int(x)

    def init(self, rng):
        params = {"convs": [], "bns": []}
        state = {"bns": []}
        keys = jax.random.split(rng, len(self.layers) + 2)
        for spec, k in zip(self.layers, keys[:-2]):
            kh, kw = spec.kernel_hw
            cin = spec.get_input_dimensions()[0]
            cout = spec.get_output_dimensions()[0]
            params["convs"].append(conv_params_default(k, kh, kw, cin, cout))
            bp, bs = bn_init(cout)
            params["bns"].append(bp)
            state["bns"].append(bs)
        c, y, x = self.flat_dims
        params["fc1"] = dense_params_default(keys[-2], c * y * x, self.fc_size)
        params["fc2"] = dense_params_default(keys[-1], self.fc_size, self.encoded_dim)
        return params, state

    def apply(self, params, state, x, train=False):
        new_bns = []
        for spec, cp, bp, bs in zip(
            self.layers, params["convs"], params["bns"], state["bns"]
        ):
            x = conv2d(x, cp["w"], stride=spec.get_stride()) + cp["b"]
            x, ns = bn_apply(bp, bs, x, train, axes=(0, 1, 2))
            new_bns.append(ns)
            x = jax.nn.relu(x)
        x = x.reshape(x.shape[0], -1)  # NHWC flatten -> YXC ordering
        x = jax.nn.relu(dense(x, params["fc1"]["w"], params["fc1"]["b"]))
        x = dense(x, params["fc2"]["w"], params["fc2"]["b"])
        return x, {"bns": new_bns}


# --------------------------------------------------------------------------
# ConvDecoder (plain CAE)
# --------------------------------------------------------------------------

@dataclass
class ConvDecoder:
    layers: Sequence[LayerSpec]
    encoded_dim: int
    fc_size: int

    @property
    def unflat_dims(self):
        c, y, x = self.layers[0].get_input_dimensions()
        return int(c), int(y), int(x)

    def init(self, rng):
        c, y, x = self.unflat_dims
        n_layers = len(self.layers)
        keys = jax.random.split(rng, n_layers + 2)
        params = {
            # fc1: kaiming fan_out; fc2 (-> chan*y*x): xavier (decoder.py:61-66)
            "fc1": dense_params_kaiming_out(keys[0], self.encoded_dim, self.fc_size),
            "fc2": dense_params_xavier(keys[1], self.fc_size, c * y * x),
            "convs": [],
            "bns": [],
        }
        state = {"bns": []}
        for i, (spec, k) in enumerate(zip(self.layers, keys[2:])):
            kh, kw = spec.kernel_hw
            cin = spec.get_input_dimensions()[0]
            cout = spec.get_output_dimensions()[0]
            params["convs"].append(convT_params_kaiming(k, kh, kw, cin, cout))
            if i != n_layers - 1:
                bp, bs = bn_init(cout)
                params["bns"].append(bp)
                state["bns"].append(bs)
        return params, state

    def apply_head(self, params, state, z, train=False):
        """FC pyramid + every ConvT/BN/ReLU stage *except the last*.

        Returns ``(h, new_state)`` where ``h`` feeds the final ConvT —
        split out so the fused last-stage training kernel
        (``ops/pallas/train_tail``) can own the final stage + loss while
        the BN-carrying interior stages keep their train-mode statistics.
        """
        c, y, x = self.unflat_dims
        h = jax.nn.relu(dense(z, params["fc1"]["w"], params["fc1"]["b"]))
        h = dense(h, params["fc2"]["w"], params["fc2"]["b"])
        h = h.reshape(h.shape[0], y, x, c)  # YXC-ordered unflatten
        new_bns = []
        for i, spec in enumerate(self.layers[:-1]):
            cp = params["convs"][i]
            h = (
                conv_transpose2d(
                    h,
                    cp["w"],
                    stride=spec.get_stride(),
                    output_padding=spec.get_output_padding(),
                )
                + cp["b"]
            )
            h, ns = bn_apply(
                params["bns"][i], state["bns"][i], h, train, axes=(0, 1, 2)
            )
            new_bns.append(ns)
            h = jax.nn.relu(h)
        return h, {"bns": new_bns}

    def apply(self, params, state, z, train=False):
        h, new_state = self.apply_head(params, state, z, train)
        spec = self.layers[-1]
        cp = params["convs"][-1]
        h = (
            conv_transpose2d(
                h,
                cp["w"],
                stride=spec.get_stride(),
                output_padding=spec.get_output_padding(),
            )
            + cp["b"]
        )
        h = jax.nn.sigmoid(h)
        return h, new_state


# --------------------------------------------------------------------------
# LinearMap
# --------------------------------------------------------------------------

@dataclass
class LinearMap:
    input_shape: tuple  # (C, Y, X)
    output_shape: tuple  # (C, Y, X)

    def init(self, rng):
        c1, y1, x1 = self.input_shape
        c2, y2, x2 = self.output_shape
        return {"fc": dense_params_default(rng, c1 * y1 * x1, c2 * y2 * x2)}, {}

    def apply(self, params, state, x, train=False):
        c2, y2, x2 = self.output_shape
        h = x.reshape(x.shape[0], -1)
        h = dense(h, params["fc"]["w"], params["fc"]["b"])
        return h.reshape(h.shape[0], y2, x2, c2), state


# --------------------------------------------------------------------------
# VarAE encoder head (contract reconstruction, SURVEY.md §2.11)
# --------------------------------------------------------------------------

@dataclass
class VarAEEncoder:
    """Conv trunk as ConvEncoder, but with two latent heads (mu, logvar)."""

    layers: Sequence[LayerSpec]
    encoded_dim: int
    fc_size: int

    def _trunk(self):
        return ConvEncoder(self.layers, self.encoded_dim, self.fc_size)

    def init(self, rng):
        r_trunk, r_mu, r_lv = jax.random.split(rng, 3)
        trunk = self._trunk()
        params, state = trunk.init(r_trunk)
        # replace the single latent head with (mu, logvar) heads
        del params["fc2"]
        params["fc_mu"] = dense_params_default(r_mu, self.fc_size, self.encoded_dim)
        params["fc_logvar"] = dense_params_default(r_lv, self.fc_size, self.encoded_dim)
        return params, state

    def apply(self, params, state, x, train=False):
        new_bns = []
        for spec, cp, bp, bs in zip(
            self.layers, params["convs"], params["bns"], state["bns"]
        ):
            x = conv2d(x, cp["w"], stride=spec.get_stride()) + cp["b"]
            x, ns = bn_apply(bp, bs, x, train, axes=(0, 1, 2))
            new_bns.append(ns)
            x = jax.nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        h = jax.nn.relu(dense(x, params["fc1"]["w"], params["fc1"]["b"]))
        mu = dense(h, params["fc_mu"]["w"], params["fc_mu"]["b"])
        logvar = dense(h, params["fc_logvar"]["w"], params["fc_logvar"]["b"])
        return (mu, logvar), {"bns": new_bns}


def reparameterize(rng, mu, logvar):
    eps = jax.random.normal(rng, mu.shape, mu.dtype)
    return mu + eps * jnp.exp(0.5 * logvar)


# --------------------------------------------------------------------------
# UNet
# --------------------------------------------------------------------------

def channel_attention_init(rng, channels, ratio=8):
    """SE-style gate (``unet.py:23-39``): shared MLP over avg+max pooling."""
    hidden = max(channels // ratio, 1)
    r1, r2 = jax.random.split(rng)
    # torch Conv2d(1x1, bias=False) default init
    return {
        "fc1": tinit.kaiming_uniform_a5(r1, (channels, hidden), channels),
        "fc2": tinit.kaiming_uniform_a5(r2, (hidden, channels), hidden),
    }


def channel_attention_apply(params, x):
    avg = jnp.mean(x, axis=(1, 2))  # (N, C)
    mx = jnp.max(x, axis=(1, 2))
    def mlp(v):
        return dense(jax.nn.relu(dense(v, params["fc1"])), params["fc2"])
    gate = jax.nn.sigmoid(mlp(avg) + mlp(mx))  # (N, C)
    return gate[:, None, None, :]


@dataclass
class SRCNNRes:
    """Residual SRCNN super-resolver.

    The reference accepts ``--method srcnn_res`` and its ``BaseModel.apply``
    moves a ``srcnn_res`` module to the device (``base_model.py:142-143``),
    but the model class never shipped in the snapshot; this provides the
    capability: bilinear-upsample the input to the output grid, learn a 1x1
    channel projection as the base estimate, and add a 9-5-5 SRCNN-style
    conv residual (SAME padding).  Output is base + residual (no squashing,
    like the linear baseline).
    """

    input_shape: tuple  # (C, Y, X)
    output_shape: tuple  # (C, Y, X)
    n1: int = 64
    n2: int = 32

    def init(self, rng):
        cin = self.input_shape[0]
        cout = self.output_shape[0]
        r0, r1, r2, r3 = jax.random.split(rng, 4)
        params = {
            # base projection starts as channel-average passthrough
            "proj": {
                "w": jnp.full((1, 1, cin, cout), 1.0 / cin, jnp.float32),
                "b": jnp.zeros((cout,), jnp.float32),
            },
            "conv1": conv_params_default(r1, 9, 9, cin, self.n1),
            "conv2": conv_params_default(r2, 5, 5, self.n1, self.n2),
            "conv3": conv_params_default(r3, 5, 5, self.n2, cout),
        }
        # residual head starts near zero so initial output ~= upsampled base
        params["conv3"]["w"] = params["conv3"]["w"] * 0.01
        params["conv3"]["b"] = jnp.zeros_like(params["conv3"]["b"])
        return params, {}

    def apply(self, params, state, x, train=False):
        _, oy, ox = self.output_shape
        up = jax.image.resize(
            x, (x.shape[0], oy, ox, x.shape[3]), method="bilinear"
        )
        base = conv2d(up, params["proj"]["w"]) + params["proj"]["b"]
        h = jax.nn.relu(conv2d(up, params["conv1"]["w"], padding=4) + params["conv1"]["b"])
        h = jax.nn.relu(conv2d(h, params["conv2"]["w"], padding=2) + params["conv2"]["b"])
        res = conv2d(h, params["conv3"]["w"], padding=2) + params["conv3"]["b"]
        return base + res, state


def dual_channel_attention_init(rng, channels, ratio=8):
    """Dual (global MLP x spatial 7x7) attention gate.

    Parity with the reference's defined-but-unused ``DualChannelAttention``
    (``unet.py:41-70``): a global average-pool MLP branch multiplied by a
    sigmoid-gated 7x7 spatial conv branch; the input is scaled by the
    combined gate.
    """
    hidden = max(channels // ratio, 1)
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "fc1": tinit.kaiming_uniform_a5(r1, (channels, hidden), channels),
        "fc2": tinit.kaiming_uniform_a5(r2, (hidden, channels), hidden),
        "spatial": tinit.kaiming_uniform_a5(
            r3, (7, 7, channels, 1), channels * 49
        ),
    }


def dual_channel_attention_apply(params, x):
    avg = jnp.mean(x, axis=(1, 2))  # (N, C)
    glob = dense(jax.nn.relu(dense(avg, params["fc1"])), params["fc2"])
    glob = jax.nn.sigmoid(glob)[:, None, None, :]
    spatial = conv2d(x, params["spatial"], stride=1, padding=3)
    spatial = jax.nn.sigmoid(spatial)  # (N, H, W, 1)
    return x * (glob * spatial)


@dataclass
class PatchCritic:
    """Conditional PatchGAN-style Wasserstein critic for ``resunet_gan``.

    The reference accepts ``--method resunet_gan`` (``cli/train_cae.py:42``)
    and carries WGAN-GP leftovers (``unet.py:277-293`` gradient penalty)
    but never shipped a GAN model; this provides the capability.  The
    critic scores (real|generated) high-res images conditioned on the
    bilinear-upsampled low-res input (pix2pix-style channel concat): a
    stack of stride-2 4x4 convs with LeakyReLU(0.2) — no normalisation, as
    WGAN-GP requires the critic's gradient penalty be per-sample — then a
    1x1 conv to a patch score map, averaged to one score per image.

    Layer count adapts to the image geometry (halving until the patch map
    reaches ~4 px or ``max_layers``), so the same module covers the test
    fixtures (32x32) and the production 256x256/280x256 grids with static
    shapes throughout.
    """

    image_shape: tuple  # generated/high-res image shape (C, Y, X)
    cond_channels: int = 0
    base_channels: int = 32
    max_layers: int = 4

    def _plan(self):
        cin = self.image_shape[0] + self.cond_channels
        h, w = self.image_shape[1], self.image_shape[2]
        layers = []
        cout = self.base_channels
        while len(layers) < self.max_layers and min(h, w) >= 4:
            layers.append({"cin": cin, "cout": cout, "k": 4, "s": 2, "p": 1})
            h = (h - 2) // 2 + 1
            w = (w - 2) // 2 + 1
            cin, cout = cout, min(cout * 2, 8 * self.base_channels)
        if not layers:  # degenerate tiny images: one SAME-padded conv
            layers.append(
                {"cin": cin, "cout": self.base_channels, "k": 3, "s": 1, "p": 1}
            )
            cin = self.base_channels
        return layers, cin

    def init(self, rng):
        layers, head_cin = self._plan()
        params = {"convs": []}
        for i, l in enumerate(layers):
            rng, sub = jax.random.split(rng)
            params["convs"].append(
                conv_params_default(sub, l["k"], l["k"], l["cin"], l["cout"])
            )
        rng, sub = jax.random.split(rng)
        params["head"] = conv_params_default(sub, 1, 1, head_cin, 1)
        return params

    def apply(self, params, img, cond=None):
        """(N, H, W, C) image [+ (N, H, W, Cc) conditioning] -> (N,) scores."""
        x = img if cond is None else jnp.concatenate([img, cond], axis=-1)
        layers, _ = self._plan()
        for l, p in zip(layers, params["convs"]):
            x = conv2d(x, p["w"], stride=l["s"], padding=l["p"]) + p["b"]
            x = jax.nn.leaky_relu(x, 0.2)
        x = conv2d(x, params["head"]["w"]) + params["head"]["b"]
        return jnp.mean(x, axis=(1, 2, 3))


@dataclass
class PerceptualFeatureLoss:
    """Feature-space MSE perceptual loss.

    The reference's ``VGGPerceptualLoss`` (``unet.py:165-198``) extracts
    torchvision VGG19 features.  Filter sources, in priority order:

    1. an explicit ``filter_bank`` argument to :meth:`init` — a path to an
       ``.npz`` (or a loaded dict) with HWIO conv filters under keys
       ``w0, w1, ...``, optional biases ``b0, ...`` and per-layer integer
       strides ``s0, ...`` (default stride 2);
    2. the ``CAE_TPU_PERCEPTUAL_BANK`` environment variable naming such an
       ``.npz``;
    3. torchvision VGG19 pretrained features, when importable — conv
       weights of ``vgg19.features[:9]`` converted OIHW→HWIO, max-pools
       folded into the stride of the following conv;
    4. the packaged deterministic bank (``nn/data/perceptual_bank.npz``:
       a V1-style oriented-edge/Laplacian/DoG first layer + fixed seeded
       random pyramid) — the offline default, reproducible run-to-run;
    5. last resort (packaged bank missing): a fixed random strided conv
       pyramid (random-weight VGG variants are a documented effective
       perceptual metric).

    If the bank's first filter expects more input channels than the data
    has, inputs are channel-tiled (the reference repeats 1→3 channels,
    ``unet.py:180-181``).  Enabled via ``--additional-loss perceptual``
    (+ ``--perceptual-weights`` for source 1).
    """

    channels: tuple = (8, 16, 32)
    kernel: int = 3
    seed: int = 0

    def init(self, in_channels=1, filter_bank=None):
        params = self._load_bank(filter_bank)
        if params is not None:
            return params
        rng = jax.random.PRNGKey(self.seed)
        params = []
        cin = in_channels
        for i, cout in enumerate(self.channels):
            rng, sub = jax.random.split(rng)
            fan_in = cin * self.kernel * self.kernel
            w = (1.0 / math.sqrt(fan_in)) * jax.random.normal(
                sub, (self.kernel, self.kernel, cin, cout), jnp.float32
            )
            params.append({"w": w, "b": None, "stride": 2})
            cin = cout
        return params

    def _load_bank(self, filter_bank):
        import os

        if filter_bank is None:
            filter_bank = os.environ.get("CAE_TPU_PERCEPTUAL_BANK")
        if filter_bank is not None:
            if isinstance(filter_bank, (str, os.PathLike)):
                import numpy as _np

                filter_bank = dict(_np.load(filter_bank))
            params = []
            for i in range(len([k for k in filter_bank if k.startswith("w")])):
                w = jnp.asarray(filter_bank[f"w{i}"], jnp.float32)
                if w.ndim != 4:
                    raise ValueError(
                        f"filter bank w{i} must be 4-D HWIO, got {w.shape}"
                    )
                b = filter_bank.get(f"b{i}")
                params.append({
                    "w": w,
                    "b": None if b is None else jnp.asarray(b, jnp.float32),
                    "stride": int(filter_bank.get(f"s{i}", 2)),
                })
            if not params:
                raise ValueError("filter bank has no 'w<i>' arrays")
            return params
        params = self._load_torchvision_vgg19()
        if params is not None:
            return params
        packaged = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "data", "perceptual_bank.npz",
        )
        if os.path.exists(packaged):
            return self._load_bank(packaged)
        return None

    @staticmethod
    def _load_torchvision_vgg19():  # pragma: no cover - torchvision absent
        try:
            import torchvision
        except Exception:
            return None
        try:
            vgg = torchvision.models.vgg19(weights="IMAGENET1K_V1").features
        except Exception:
            return None  # e.g. no network to fetch pretrained weights
        import torch as _torch

        params, pending_stride = [], 1
        for layer in list(vgg)[:9]:  # reference uses features[:9]
            if isinstance(layer, _torch.nn.Conv2d):
                w = layer.weight.detach().numpy()  # OIHW
                params.append({
                    "w": jnp.asarray(w.transpose(2, 3, 1, 0)),  # → HWIO
                    "b": jnp.asarray(layer.bias.detach().numpy()),
                    "stride": pending_stride,
                })
                pending_stride = 1
            elif isinstance(layer, _torch.nn.MaxPool2d):
                pending_stride = 2
        return params or None

    @staticmethod
    def _adapt_channels(x, want):
        have = x.shape[-1]
        if have == want:
            return x
        if have < want:  # tile-and-slice (reference repeat(1,3,1,1))
            reps = -(-want // have)
            return jnp.tile(x, (1, 1, 1, reps))[..., :want]
        return jnp.mean(x, axis=-1, keepdims=True).repeat(want, axis=-1)

    def features(self, params, x):
        feats = []
        h = self._adapt_channels(x, params[0]["w"].shape[2])
        for p in params:
            pad = (p["w"].shape[0] - 1) // 2
            h = conv2d(h, p["w"], stride=p["stride"], padding=pad)
            if p["b"] is not None:
                h = h + p["b"]
            h = jax.nn.relu(h)
            feats.append(h)
        return feats

    def embed(self, params, x):
        """Global-average-pooled final feature map — the (N, D) projection
        used by the contrastive additional loss."""
        return jnp.mean(self.features(params, x)[-1], axis=(1, 2))

    def loss(self, params, pred, target):
        fp = self.features(params, pred)
        ft = self.features(params, target)
        return sum(jnp.mean((a - b) ** 2) for a, b in zip(fp, ft)) / len(fp)


@dataclass
class UNetEncoder:
    """Conv stack collecting post-ReLU skip activations (``unet.py:73-112``)."""

    layers: Sequence[LayerSpec]
    encoded_dim: int
    fc_size: int
    dropout_rate: float = 0.1

    @property
    def flat_dims(self):
        c, y, x = self.layers[-1].get_output_dimensions()
        return int(c), int(y), int(x)

    def init(self, rng):
        params = {"convs": [], "bns": []}
        state = {"bns": []}
        keys = jax.random.split(rng, len(self.layers) + 4)
        for spec, k in zip(self.layers, keys[: len(self.layers)]):
            kh, kw = spec.kernel_hw
            cin = spec.get_input_dimensions()[0]
            cout = spec.get_output_dimensions()[0]
            params["convs"].append(conv_params_default(k, kh, kw, cin, cout))
            bp, bs = bn_init(cout)
            params["bns"].append(bp)
            state["bns"].append(bs)
        c, y, x = self.flat_dims
        params["fc1"] = dense_params_default(keys[-4], c * y * x, self.fc_size)
        bp, bs = bn_init(self.fc_size)
        params["fc_bn"] = bp
        state["fc_bn"] = bs
        params["fc2"] = dense_params_default(keys[-3], self.fc_size, self.encoded_dim)
        return params, state

    def apply(self, params, state, x, train=False, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        new_state = {"bns": []}
        skips = []
        for i, (spec, cp, bp, bs) in enumerate(
            zip(self.layers, params["convs"], params["bns"], state["bns"])
        ):
            # reference passes spec.output_padding as conv *padding*
            # (``unet.py:82``): auto specs have 0 so geometry matches VALID
            pad = spec.output_padding_hw
            x = conv2d(
                x,
                cp["w"],
                stride=spec.get_stride(),
                padding=[(pad[0], pad[0]), (pad[1], pad[1])],
            ) + cp["b"]
            x, ns = bn_apply(bp, bs, x, train, axes=(0, 1, 2))
            new_state["bns"].append(ns)
            x = jax.nn.relu(x)
            skips.append(x)
            rng, sub = jax.random.split(rng)
            x = dropout(sub, x, self.dropout_rate, train)
        skips.pop()  # last activation feeds the bottleneck, not a skip
        h = x.reshape(x.shape[0], -1)
        h = dense(h, params["fc1"]["w"], params["fc1"]["b"])
        h, ns = bn_apply(params["fc_bn"], state["fc_bn"], h, train, axes=(0,))
        new_state["fc_bn"] = ns
        h = jax.nn.relu(h)
        rng, sub = jax.random.split(rng)
        h = dropout(sub, h, self.dropout_rate, train)
        h = jax.nn.relu(dense(h, params["fc2"]["w"], params["fc2"]["b"]))
        rng, sub = jax.random.split(rng)
        h = dropout(sub, h, self.dropout_rate, train)
        return (h, skips), new_state


@dataclass
class UNetDecoder:
    """Transposed-conv stack with attention-gated skip fusion.

    Per stage: ConvT -> (if a skip with matching spatial size exists)
    channel-attention gate, concat with the (1x1-projected) skip, 1x1 fuse
    conv back to the spec channel count -> BN -> ReLU -> Dropout.  The fuse
    conv is the fix-forward for the reference's open channel arithmetic
    (``unet.py:138-161`` vs auto specs, SURVEY.md §2 quirks).
    """

    layers: Sequence[LayerSpec]
    encoded_dim: int
    fc_size: int
    dropout_rate: float = 0.1
    skip_shapes: Sequence[tuple] = field(default_factory=list)  # [(C,Y,X)] encoder order
    final_sigmoid: bool = True  # False for residual heads (UNETRes)
    #: reference-compatible mode (``unet.py:114-163``): raw attention-gated
    #: concat with NO 1x1 project/fuse convs.  Requires a hand-authored spec
    #: whose channel arithmetic accounts for the concat doubling (each
    #: stage's skip channel count equals its ConvT output channel count, and
    #: the next stage's input channels equal 2x this stage's output).
    compat_concat: bool = False

    @property
    def unflat_dims(self):
        c, y, x = self.layers[0].get_input_dimensions()
        return int(c), int(y), int(x)

    def _stage_skip(self, stage_idx):
        """Return (skip_index, skip_shape) matching this stage's output size."""
        spec = self.layers[stage_idx]
        _, oy, ox = spec.get_output_dimensions()
        for si, (sc, sy, sx) in enumerate(self.skip_shapes):
            if (sy, sx) == (oy, ox):
                return si, (sc, sy, sx)
        return None, None

    def init(self, rng):
        c, y, x = self.unflat_dims
        n_layers = len(self.layers)
        keys = jax.random.split(rng, 4 * n_layers + 4)
        params = {
            "fc1": dense_params_default(keys[0], self.encoded_dim, self.fc_size),
            "fc2": dense_params_default(keys[1], self.fc_size, c * y * x),
            "convs": [],
            "bns": [],
            "attn": [],
            "skip_proj": [],
            "fuse": [],
        }
        state = {"bns": []}
        bp, bs = bn_init(self.fc_size)
        params["fc_bn"] = bp
        state["fc_bn"] = bs
        ki = 4
        n_skips = len(self.skip_shapes)
        for i, spec in enumerate(self.layers):
            kh, kw = spec.kernel_hw
            cin = spec.get_input_dimensions()[0]
            cout = spec.get_output_dimensions()[0]
            params["convs"].append(
                conv_params_default(keys[ki], kh, kw, cin, cout)
            )
            ki += 1
            if i != n_layers - 1:
                if self.compat_concat:
                    # reference: attention per stage, raw concat, BN(2*cout)
                    consumes_skip = i < n_skips
                    params["attn"].append(
                        channel_attention_init(keys[ki], cout)
                        if consumes_skip
                        else None
                    )
                    ki += 1
                    params["skip_proj"].append(None)
                    params["fuse"].append(None)
                    bp, bs = bn_init(2 * cout if consumes_skip else cout)
                else:
                    si, sshape = self._stage_skip(i)
                    if si is not None:
                        sc = sshape[0]
                        params["attn"].append(
                            channel_attention_init(keys[ki], cout)
                        )
                        ki += 1
                        params["skip_proj"].append(
                            conv_params_default(keys[ki], 1, 1, sc, cout)
                        )
                        ki += 1
                        params["fuse"].append(
                            conv_params_default(keys[ki], 1, 1, 2 * cout, cout)
                        )
                        ki += 1
                    else:
                        params["attn"].append(None)
                        params["skip_proj"].append(None)
                        params["fuse"].append(None)
                    bp, bs = bn_init(cout)
                params["bns"].append(bp)
                state["bns"].append(bs)
        return params, state

    def apply_head(self, params, state, z, skips, train=False, rng=None,
                   n_stages=None, skip_final_bn_relu=False):
        """FC pyramid + decoder stages ``[0, n_stages)`` (default: every
        stage *except the final ConvT*).

        ``skip_final_bn_relu`` (eval only): return the last stage's
        pre-BatchNorm tensor so the fused apply tail can fold that
        BN+ReLU into its kernel's input affine
        (``ops/pallas/decoder_kernel._pre_affine_flat``).

        Returns ``(h, new_state)`` where ``h`` feeds the next stage — split
        out so the fused last-stage training kernels
        (``ops/pallas/train_tail``) can own the final stage + loss while the
        BN/dropout-carrying interior stages keep train-mode behavior, and
        so the fused *apply* tail (``ops/pallas/decoder_kernel``) can run
        just the pre-kernel stages via ``n_stages`` instead of duplicating
        this loop.  The final stage consumes no rng (no dropout after the
        last ConvT), so the split preserves the rng fold ordering exactly;
        at eval no rng is consumed at all (dropout is inert), so the eval
        trace stays split-free.
        """
        if train:
            if rng is None:
                rng = jax.random.PRNGKey(0)

            def drop(r, v):
                r, sub = jax.random.split(r)
                return r, dropout(sub, v, self.dropout_rate, True)

        else:
            def drop(r, v):
                return r, v

        c, y, x = self.unflat_dims
        new_state = {"bns": []}
        h = dense(z, params["fc1"]["w"], params["fc1"]["b"])
        h, ns = bn_apply(params["fc_bn"], state["fc_bn"], h, train, axes=(0,))
        new_state["fc_bn"] = ns
        h = jax.nn.relu(h)
        rng, h = drop(rng, h)
        h = jax.nn.relu(dense(h, params["fc2"]["w"], params["fc2"]["b"]))
        rng, h = drop(rng, h)
        h = h.reshape(h.shape[0], y, x, c)

        stages = self.layers[:-1] if n_stages is None else self.layers[:n_stages]
        skips_rev = list(skips)[::-1]  # decoder consumes them reversed
        for i, spec in enumerate(stages):
            cp = params["convs"][i]
            pad = spec.output_padding_hw
            # reference passes spec.output_padding as ConvT *padding*
            # (``unet.py:140``); auto specs have 0
            h = conv_transpose2d(
                h, cp["w"], stride=spec.get_stride(), padding=pad
            ) + cp["b"]
            if self.compat_concat:
                if params["attn"][i] is not None:
                    # reference order (unet.py:155-161): gate, raw concat
                    gate = channel_attention_apply(params["attn"][i], h)
                    h = h * gate
                    h = jnp.concatenate([h, skips_rev[i]], axis=-1)
            elif params["attn"][i] is not None:
                si, _ = self._stage_skip(i)
                skip = skips[si]
                gate = channel_attention_apply(params["attn"][i], h)
                h = h * gate
                sp = params["skip_proj"][i]
                skip = conv2d(skip, sp["w"]) + sp["b"]
                h = jnp.concatenate([h, skip], axis=-1)
                fp = params["fuse"][i]
                h = conv2d(h, fp["w"]) + fp["b"]
            if skip_final_bn_relu and not train and i == len(stages) - 1:
                break
            h, ns = bn_apply(
                params["bns"][i], state["bns"][i], h, train, axes=(0, 1, 2)
            )
            new_state["bns"].append(ns)
            h = jax.nn.relu(h)
            rng, h = drop(rng, h)
        return h, new_state

    def apply(self, params, state, z, skips, train=False, rng=None):
        h, new_state = self.apply_head(params, state, z, skips, train, rng)
        spec = self.layers[-1]
        cp = params["convs"][-1]
        h = conv_transpose2d(
            h, cp["w"], stride=spec.get_stride(),
            padding=spec.output_padding_hw,
        ) + cp["b"]
        if self.final_sigmoid:
            h = jax.nn.sigmoid(h)
        return h, new_state
