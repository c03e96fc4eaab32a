"""A/B harness for fused decoder-tail kernel variants on the real TPU.

Usage:
    python scripts/kernel_ab.py VARIANT[:GPACK] [--batch N] [--steps K]
    python scripts/kernel_ab.py all            # full:1 rowsplit:1 planes:1 ...

Measures the *product-shaped* fused apply (FC head + XLA head stages +
kernel + epilogue) on the flagship 16x16->256x256 geometry.  Timing
follows BASELINE.md "measurement isolation": K applications run inside
ONE ``lax.scan`` dispatch (per-step z varies, so nothing memoizes), each
step's output passes an ``optimization_barrier`` (forces the full-res
materialisation every variant pays in the product) and reduces to a
scalar; timing ends on the scalar device->host read.  Reports us/img.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from cae_tools_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cae_tools_tpu.models.sizer import create_model_spec  # noqa: E402
from cae_tools_tpu.nn import modules as M  # noqa: E402
from cae_tools_tpu.ops import convops  # noqa: E402
from cae_tools_tpu.ops.pallas import decoder_kernel as dk  # noqa: E402
from cae_tools_tpu.ops.pallas import decoder_kernel_exp as dke  # noqa: E402


def build_decoder(latent=32, fc=128):
    spec = create_model_spec(
        input_size=(16, 16), input_channels=1,
        output_size=(256, 256), output_channels=1,
    )
    dec = M.ConvDecoder(spec.output_layers, latent, fc)
    dp, ds = dec.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ds = jax.tree_util.tree_map(
        lambda a: a + 0.3 * jnp.asarray(
            np.abs(rng.normal(size=a.shape)).astype(np.float32))
        if a.dtype == jnp.float32 else a,
        ds,
    )
    return dec, dp, ds


def timed_scan_fn(dec, variant, gpack, batch, steps, latent=32):
    # CPU smoke runs fall back to interpret mode (perf numbers only make
    # sense on the real TPU)
    interp = jax.default_backend() == "cpu"
    if variant == "prod":
        apply_fn = lambda dp, ds, z: dk.decoder_apply_fused_tail(
            dec, dp, ds, z, interpret=interp
        )
    else:
        apply_fn = lambda dp, ds, z: dke.decoder_apply_fused_tail_exp(
            dec, dp, ds, z, variant=variant, gpack=gpack, interpret=interp
        )

    @jax.jit
    def run(dp, ds, z0):
        def step(carry, i):
            z = z0 + 1e-3 * i
            y = apply_fn(dp, ds, z)
            y = jax.lax.optimization_barrier(y)
            return carry + jnp.sum(y), None

        acc, _ = jax.lax.scan(
            step, jnp.zeros((), jnp.float32), jnp.arange(steps, dtype=jnp.float32)
        )
        return acc

    return run


def bench_variant(name, batch, steps, repeats=3):
    variant, _, g = name.partition(":")
    gpack = int(g) if g else 1
    dec, dp, ds = build_decoder()
    run = timed_scan_fn(dec, variant, gpack, batch, steps)
    rng = np.random.default_rng(7)
    results = []
    for r in range(repeats + 1):
        z0 = jnp.asarray(rng.normal(size=(batch, 32)).astype(np.float32))
        t0 = time.perf_counter()
        acc = float(run(dp, ds, z0))  # scalar read = completion fence
        dt = time.perf_counter() - t0
        if r == 0:
            print(f"  [{name}] warmup/compile {dt:.1f}s acc={acc:.3e}",
                  flush=True)
        else:
            results.append(dt)
            print(f"  [{name}] run{r}: {dt * 1e6 / (batch * steps):.3f} us/img"
                  f" ({dt:.3f}s total)", flush=True)
    best = min(results)
    print(f"{name}: best {best * 1e6 / (batch * steps):.3f} us/img", flush=True)
    return best * 1e6 / (batch * steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="+",
                    help="prod | full[:G] | rowsplit[:G] | planes[:G] | "
                         "rowshuf[:G] | shuffle[:G] | all | shuf")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=24)
    args = ap.parse_args()
    names = args.variants
    if names == ["all"]:
        names = ["prod", "full:1", "rowsplit:1", "planes:1",
                 "full:4", "rowsplit:4"]
    elif names == ["shuf"]:
        names = ["prod", "full:1", "rowshuf:1", "shuffle:1"]
    convops.set_precision("high")
    print(f"devices: {jax.devices()}  batch={args.batch} steps={args.steps}",
          flush=True)
    summary = {}
    for name in names:
        try:
            summary[name] = bench_variant(name, args.batch, args.steps)
        except Exception as e:  # e.g. Mosaic compile rejection ("shuffle")
            print(f"  [{name}] FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            summary[name] = None
    print("== summary (us/img) ==")
    for k, v in summary.items():
        print(f"  {k:14s} {'FAILED' if v is None else f'{v:.3f}'}")


if __name__ == "__main__":
    main()
