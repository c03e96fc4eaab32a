"""SSIM/MS-SSIM correctness: identity, monotonicity, and an independent
numpy implementation of the Wang et al. formula as cross-check."""

import numpy as np
import pytest

import jax.numpy as jnp

from cae_tools_tpu.ops import msssim as MS


def np_gaussian(win, sigma):
    c = np.arange(win) - (win - 1) / 2.0
    g = np.exp(-(c**2) / (2 * sigma**2))
    return g / g.sum()


def np_ssim_mean(x, y, win=11, sigma=1.5, data_range=1.0):
    """Independent dense-loop SSIM (NHWC, single channel) for cross-check."""
    from scipy.ndimage import correlate

    k = np.outer(np_gaussian(win, sigma), np_gaussian(win, sigma))
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    for b in range(x.shape[0]):
        xb, yb = x[b, :, :, 0], y[b, :, :, 0]
        # VALID-mode windowed moments
        from scipy.signal import convolve2d

        f = lambda a: convolve2d(a, k, mode="valid")
        mx, my = f(xb), f(yb)
        sxx = f(xb * xb) - mx * mx
        syy = f(yb * yb) - my * my
        sxy = f(xb * yb) - mx * my
        ssim_map = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
            (mx * mx + my * my + c1) * (sxx + syy + c2)
        )
        vals.append(ssim_map.mean())
    return float(np.mean(vals))


def test_ssim_identity():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 32, 32, 1)).astype(np.float32)
    assert float(MS.ssim(jnp.asarray(x), jnp.asarray(x))) == pytest.approx(1.0, abs=1e-5)


def test_msssim_identity_and_range():
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(2, 176, 176, 1)).astype(np.float32)
    v = float(MS.msssim(jnp.asarray(x), jnp.asarray(x)))
    assert v == pytest.approx(1.0, abs=1e-4)
    noisy = np.clip(x + rng.normal(scale=0.2, size=x.shape), 0, 1).astype(np.float32)
    v2 = float(MS.msssim(jnp.asarray(x), jnp.asarray(noisy)))
    assert 0.0 < v2 < v


def test_ssim_matches_independent_numpy():
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(3, 24, 24, 1)).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.1, size=x.shape), 0, 1).astype(np.float32)
    ours = float(MS.ssim(jnp.asarray(x), jnp.asarray(y)))
    ref = np_ssim_mean(x.astype(np.float64), y.astype(np.float64))
    assert ours == pytest.approx(ref, abs=2e-4)


def test_msssim_monotone_in_noise():
    rng = np.random.default_rng(3)
    x = rng.uniform(size=(1, 176, 176, 1)).astype(np.float32)
    last = 1.1
    for scale in [0.02, 0.1, 0.3]:
        y = np.clip(x + rng.normal(scale=scale, size=x.shape), 0, 1).astype(np.float32)
        v = float(MS.msssim(jnp.asarray(x), jnp.asarray(y)))
        assert v < last
        last = v
