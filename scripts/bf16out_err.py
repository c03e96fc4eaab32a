"""Measured error envelope of the bf16 output write (round 5).

`apply_cae/export_cae --output-dtype bfloat16` (serving opt-in) writes
the denormalised prediction in bf16 on device, breaking the fused
apply's f32 output-write floor.  This measures the actual quantization
envelope on the real TPU kernel (not interpret mode) against the f32
fused apply on the same inputs/weights, on the Kelvin scale the product
emits (denorm mean 275, scale 30).

Usage (real TPU, serialized): python scripts/bf16out_err.py [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

    import numpy as np

    import bench
    from cae_tools_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    fwd32, x = bench.build_jax_forward(
        bench._spec(), bench._LATENT, bench._FC, batch, fused_tail=True
    )
    fwd16, _ = bench.build_jax_forward(
        bench._spec(), bench._LATENT, bench._FC, batch, fused_tail=True,
        bf16_out=True,
    )
    a = np.asarray(fwd32(x), np.float32)
    b = np.asarray(fwd16(x), np.float32)
    assert a.shape == b.shape
    err = np.abs(b - a)
    rel = err / np.maximum(np.abs(a), 1e-6)
    print(
        f"# bf16out vs f32 fused apply, b={batch}, Kelvin scale "
        f"[{a.min():.1f}, {a.max():.1f}]: max_abs={err.max():.4f} K, "
        f"max_rel={rel.max():.2e}, rms_rel={np.sqrt((rel ** 2).mean()):.2e}"
    )


if __name__ == "__main__":
    main()
