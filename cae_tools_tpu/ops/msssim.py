"""SSIM / MS-SSIM as jittable XLA ops.

The reference's VAE loss uses ``pytorch_msssim`` (``README.md:29``, CLI flag
``--lambda-ssim``, ``cli/train_cae.py:36``; the VarAEModel source is missing
upstream — SURVEY.md §2.11).  This implements the standard Wang et al.
MS-SSIM with the same conventions as pytorch_msssim:

 * 11-tap Gaussian window, sigma 1.5, applied depthwise with VALID padding
   (separable: two rank-1 convs, which XLA maps onto the MXU)
 * K1=0.01, K2=0.03 against ``data_range``
 * scale weights (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)
 * 2x average-pool (VALID) downsampling between scales, cs terms relu-clamped

Inputs are NHWC.  ``msssim`` returns a scalar averaged over batch+channels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .convops import _DIMNUMS  # NHWC/HWIO layout
from jax import lax

MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(win_size: int, sigma: float) -> np.ndarray:
    coords = np.arange(win_size, dtype=np.float64) - (win_size - 1) / 2.0
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_blur(x, win, axis):
    """Separable depthwise 1-D Gaussian along a spatial axis (VALID)."""
    c = x.shape[-1]
    if axis == 1:
        k = win.reshape(-1, 1, 1, 1)
    else:
        k = win.reshape(1, -1, 1, 1)
    k = jnp.broadcast_to(k, k.shape[:2] + (1, c))
    # HIGHEST precision is required: the SSIM variance terms are computed by
    # cancellation (blur(x^2) - mu^2); bf16 blurs (TPU default) destroy them
    # (verified on v5e: ~5e-3 absolute error in the per-image SSIM)
    return lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=_DIMNUMS,
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _blur(x, win):
    return _depthwise_blur(_depthwise_blur(x, win, 1), win, 2)


def _ssim_terms(x, y, win, data_range, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _blur(x, win)
    mu_y = _blur(y, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _blur(x * x, win) - mu_xx
    sigma_yy = _blur(y * y, win) - mu_yy
    sigma_xy = _blur(x * y, win) - mu_xy

    cs = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    # per (batch, channel) means over the valid window positions
    return jnp.mean(ssim_map, axis=(1, 2)), jnp.mean(cs, axis=(1, 2))


def ssim(x, y, data_range=1.0, win_size=11, sigma=1.5, average=True):
    """SSIM over the batch; NHWC inputs.

    ``average=False`` returns the per-(batch, channel) values instead of the
    scalar mean (e.g. for weighted reductions over padded batches).
    """
    if min(x.shape[1], x.shape[2]) < win_size:
        raise ValueError(
            f"image {x.shape[1]}x{x.shape[2]} smaller than SSIM window {win_size}"
        )
    win = jnp.asarray(_gaussian_kernel(win_size, sigma))
    s, _ = _ssim_terms(x, y, win, data_range)
    return jnp.mean(s) if average else s


def _avg_pool2(x):
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def msssim(
    x, y, data_range=1.0, win_size=11, sigma=1.5, weights=MSSSIM_WEIGHTS,
    average=True,
):
    """Multi-scale SSIM (Wang et al. 2003), mean over batch+channels.

    ``average=False`` returns the per-(batch, channel) values.
    """
    min_hw = min(x.shape[1], x.shape[2]) // (2 ** (len(weights) - 1))
    if min_hw < win_size:
        raise ValueError(
            f"image {x.shape[1]}x{x.shape[2]} too small for a "
            f"{len(weights)}-level pyramid with window {win_size}; "
            "pass fewer scale weights"
        )
    win = jnp.asarray(_gaussian_kernel(win_size, sigma))
    weights = jnp.asarray(weights, jnp.float32)
    levels = weights.shape[0]
    mcs = []
    val = None
    for i in range(levels):
        s, cs = _ssim_terms(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x = _avg_pool2(x)
            y = _avg_pool2(y)
        else:
            val = jax.nn.relu(s)
    stack = jnp.stack(mcs + [val], axis=0)  # (levels, N, C)
    out = jnp.prod(stack ** weights[:, None, None], axis=0)
    return jnp.mean(out) if average else out


def msssim_loss(pred, target, data_range=1.0):
    return 1.0 - msssim(pred, target, data_range=data_range)
