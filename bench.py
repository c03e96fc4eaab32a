"""Benchmark: apply-path throughput of the flagship ConvAE vs PyTorch-CPU.

Measures the BASELINE.json north-star config — batched inference of a
16x16 -> 256x256 convolutional autoencoder (encoder conv stack, FC
bottleneck, transposed-conv decoder, reference geometry from the auto
layer-spec solver) — on the default JAX device (TPU under the driver), and
the identical architecture built in torch on CPU as the reference baseline.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np


def build_jax_forward(spec, latent, fc, batch):
    import jax
    import jax.numpy as jnp

    from cae_tools_tpu.nn import modules as M
    from cae_tools_tpu.ops import convops

    enc = M.ConvEncoder(spec.input_layers, latent, fc)
    dec = M.ConvDecoder(spec.output_layers, latent, fc)
    ep, es = enc.init(jax.random.PRNGKey(0))
    dp, ds = dec.init(jax.random.PRNGKey(1))

    @jax.jit
    def forward(x):
        z, _ = enc.apply(ep, es, x, train=False)
        y, _ = dec.apply(dp, ds, z, train=False)
        return y

    x = jnp.asarray(
        np.random.default_rng(0).random((batch, 16, 16, 1), dtype=np.float32)
    )
    return forward, x


def build_torch_forward(spec, latent, fc, batch):
    import torch
    import torch.nn as tnn

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
    encoder = tnn.Sequential(
        *layers,
        tnn.Flatten(start_dim=1),
        tnn.Linear(c * y * x, fc),
        tnn.ReLU(True),
        tnn.Linear(fc, latent),
    )
    c2, y2, x2 = spec.output_layers[0].input_dimensions
    dec_layers = []
    for l in spec.output_layers:
        dec_layers.append(
            tnn.ConvTranspose2d(
                l.input_dimensions[0],
                l.output_dimensions[0],
                kernel_size=l.kernel_size,
                stride=l.stride,
                output_padding=l.output_padding,
            )
        )
        if l is not spec.output_layers[-1]:
            dec_layers += [tnn.BatchNorm2d(l.output_dimensions[0]), tnn.ReLU(True)]
    decoder = tnn.Sequential(
        tnn.Linear(latent, fc),
        tnn.ReLU(True),
        tnn.Linear(fc, c2 * y2 * x2),
        tnn.Unflatten(dim=1, unflattened_size=(c2, y2, x2)),
        *dec_layers,
        tnn.Sigmoid(),
    )
    model = tnn.Sequential(encoder, decoder).eval()
    xb = torch.rand((batch, 1, 16, 16))
    return model, xb


def time_jax(forward, x, iters):
    import jax

    forward(x).block_until_ready()  # compile + warm
    forward(x).block_until_ready()
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = forward(x)
    out.block_until_ready()
    return time.perf_counter() - t0


def time_torch(model, xb, iters):
    import torch

    with torch.no_grad():
        model(xb)  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            model(xb)
        return time.perf_counter() - t0


def main():
    from cae_tools_tpu.models.sizer import create_model_spec
    from cae_tools_tpu.ops import convops

    latent, fc, batch = 32, 128, 512
    spec = create_model_spec(
        input_size=(16, 16), input_channels=1,
        output_size=(256, 256), output_channels=1,
        stride=2, kernel_size=3,
    )

    # headline: the parity-grade path (HIGH precision: <=1.5e-6 max err vs
    # the torch-CPU f32 reference) at a TPU-utilizing batch (sweep: ~512)
    convops.set_precision("high")
    forward, x = build_jax_forward(spec, latent, fc, batch)
    jax_iters = 20
    jax_time = time_jax(forward, x, jax_iters)
    jax_ips = batch * jax_iters / jax_time

    # secondary: bf16-MXU default-precision fast path
    convops.set_precision("default")
    forward_fast, x_fast = build_jax_forward(spec, latent, fc, batch)
    fast_time = time_jax(forward_fast, x_fast, jax_iters)
    fast_ips = batch * jax_iters / fast_time
    convops.set_precision("high")

    # torch-CPU baseline at its own best batch
    torch_ips = 0.0
    for tb in (32, 128):
        torch_model, xb = build_torch_forward(spec, latent, fc, tb)
        torch_iters = 5
        torch_time = time_torch(torch_model, xb, torch_iters)
        torch_ips = max(torch_ips, tb * torch_iters / torch_time)

    result = {
        "metric": "apply_convae_16x16_to_256x256_images_per_sec",
        "value": round(jax_ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(jax_ips / torch_ips, 2),
        "baseline_torch_cpu_images_per_sec": round(torch_ips, 2),
        "bf16_fast_path_images_per_sec": round(fast_ips, 2),
        "batch": batch,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
