"""A/B the SSIM scale kernel's separable-blur formulation on real TPU.

The round-5 VarAE trace shows the MS-SSIM Pallas kernels at ~61% of the
fused train step, VPU-bound at ~24% of the nominal FMA peak (15 MFLOP/img
fwd in 8.1 us/img at scale 0).  The suspected tax is per-tap vector
realignment: the horizontal pass reads ``img[:, k:k+wv]`` — 11 misaligned
lane-dimension slices per field, 5 fields — and the vertical pass 11
sublane slices.  This experiment times three formulations of the
*forward* scale kernel at the flagship shape (grid 256, 256x256 f32):

  v0  current production kernel (per-field h-pass then v-pass)
  v1  stacked fields: one (5, h, w) VMEM array, each tap's shifted
      multiply-add applied to all 5 fields at once (5x fewer, 5x larger
      vector ops — tests whether per-op overhead, not flops, dominates)
  v2  transposed h-pass: per field, work in (w, h) space so BOTH passes
      slice along sublanes, paying one in-VMEM transpose per blur
      (tests whether lane-misaligned reads are the tax)

Timing: K data-dependent iterations inside ONE lax.scan dispatch (the
carry perturbs the input, defeating identical-handle memoization;
BASELINE.md "measurement isolation" hazards 1-3), scalar device->host
read closes the clock.

Usage (real TPU, serialized with other tunnel work):

    python scripts/ssim_blur_ab.py [batch] [k_iters]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    k_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cae_tools_tpu.ops.msssim import _gaussian_kernel
    from cae_tools_tpu.ops.pallas import msssim_kernel as MK
    from cae_tools_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    H = W = 256
    WIN = 11
    win = tuple(float(v) for v in _gaussian_kernel(WIN, 1.5))
    c1 = (0.01 * 1.0) ** 2
    c2 = (0.03 * 1.0) ** 2
    hv, wv = H - (WIN - 1), W - (WIN - 1)

    # ---- v1: stacked-field kernel ---------------------------------------
    def v1_kernel(x_ref, y_ref, ssim_ref, cs_ref):
        i = pl.program_id(0)
        x = x_ref[0]
        y = y_ref[0]
        base = jnp.stack([x, y, x * x, y * y, x * y])  # (5, H, W)
        acc = None
        for k in range(WIN):
            term = base[:, :, k : k + wv] * win[k]
            acc = term if acc is None else acc + term
        out = None
        for k in range(WIN):
            term = acc[:, k : k + hv, :] * win[k]
            out = term if out is None else out + term
        mu_x, mu_y, bxx, byy, bxy = (out[j] for j in range(5))
        sxx = bxx - mu_x * mu_x
        syy = byy - mu_y * mu_y
        sxy = bxy - mu_x * mu_y
        cs_map = (2.0 * sxy + c2) / (sxx + syy + c2)
        ssim_map = (
            (2.0 * mu_x * mu_y + c1) / (mu_x * mu_x + mu_y * mu_y + c1)
        ) * cs_map
        denom = float(hv * wv)
        ssim_ref[i, 0] = jnp.sum(ssim_map) / denom
        cs_ref[i, 0] = jnp.sum(cs_map) / denom

    # ---- v2: transposed-h-pass kernel -----------------------------------
    def v2_kernel(x_ref, y_ref, ssim_ref, cs_ref):
        i = pl.program_id(0)
        x = x_ref[0]
        y = y_ref[0]

        def blur(img):
            # h-pass in transposed space: slice sublanes of (W, H)
            it = img.T  # (W, H)
            acc = None
            for k in range(WIN):
                term = it[k : k + wv, :] * win[k]
                acc = term if acc is None else acc + term
            a = acc.T  # (H, wv)
            out = None
            for k in range(WIN):
                term = a[k : k + hv, :] * win[k]
                out = term if out is None else out + term
            return out

        mu_x = blur(x)
        mu_y = blur(y)
        sxx = blur(x * x) - mu_x * mu_x
        syy = blur(y * y) - mu_y * mu_y
        sxy = blur(x * y) - mu_x * mu_y
        cs_map = (2.0 * sxy + c2) / (sxx + syy + c2)
        ssim_map = (
            (2.0 * mu_x * mu_y + c1) / (mu_x * mu_x + mu_y * mu_y + c1)
        ) * cs_map
        denom = float(hv * wv)
        ssim_ref[i, 0] = jnp.sum(ssim_map) / denom
        cs_ref[i, 0] = jnp.sum(cs_map) / denom

    def make_variant(kernel):
        @jax.jit
        def f(xp, yp):
            n = xp.shape[0]
            return pl.pallas_call(
                kernel,
                grid=(n,),
                in_specs=[
                    pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((n, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((n, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((n, 1), jnp.float32),
                    jax.ShapeDtypeStruct((n, 1), jnp.float32),
                ],
            )(xp, yp)

        return f

    def v0(xp, yp):
        # production path expects NHWC; feed (n, H, W, 1)
        s, cs = MK._ssim_scale_pallas(
            xp[..., None], yp[..., None], data_range=1.0
        )
        return s, cs

    variants = {
        "v0_current": v0,
        "v1_stacked": make_variant(v1_kernel),
        "v2_transposed": make_variant(v2_kernel),
    }

    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.random((batch, H, W), dtype=np.float32))
    yp = jnp.asarray(rng.random((batch, H, W), dtype=np.float32))

    # correctness first (vs the production kernel)
    s0, c0 = variants["v0_current"](xp, yp)
    for name, fn in variants.items():
        if name == "v0_current":
            continue
        s, c = fn(xp, yp)
        err = max(
            float(jnp.max(jnp.abs(s.reshape(-1) - s0.reshape(-1)))),
            float(jnp.max(jnp.abs(c.reshape(-1) - c0.reshape(-1)))),
        )
        print(f"# {name}: max abs diff vs v0 = {err:.3e}")

    import jax.lax as lax

    def timed(fn):
        @jax.jit
        def run(xp, yp):
            def step(carry, _):
                xs = xp + carry * 1e-12  # data dependence per iteration
                s, cs = fn(xs, yp)
                return jnp.sum(s) + jnp.sum(cs), None

            out, _ = lax.scan(step, jnp.float32(0.0), None, length=k_iters)
            return out

        out = run(xp, yp)  # compile + warm
        float(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(xp, yp)
            float(out)  # scalar device->host read closes the clock
            best = min(best, time.perf_counter() - t0)
        return best

    for name, fn in variants.items():
        dt = timed(fn)
        per_img_us = dt / (batch * k_iters) * 1e6
        print(
            f"{name}: {dt * 1e3:8.1f} ms for {k_iters}x b{batch} "
            f"-> {per_img_us:6.2f} us/img"
        )


if __name__ == "__main__":
    main()
