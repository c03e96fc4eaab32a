"""Jittable loss functions.

Parity targets in the reference:
 * plain MSE (``conv_ae_model.py:303``)
 * masked MSE: sum(((pred-target)*mask)^2)/sum(mask) (``unet.py:635-639``)
 * masked per-channel Pearson correlation (``unet.py:641-678``) — the UNET
   training loss adds ``lambda_pearson * (1 - mean(corr))``
 * VAE KL term (contract per SURVEY.md §2.11): standard
   ``-0.5*sum(1+logvar-mu^2-exp(logvar))`` averaged over the batch
 * total variation (``unet.py:682-691``) — defined but unused upstream,
   provided for API completeness

All operate on NHWC activations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def masked_mse(pred, target, mask):
    diff = (pred - target) * mask
    return jnp.sum(diff**2) / jnp.sum(mask)


def masked_pearson(pred, target, mask):
    """Per-(batch, channel) masked Pearson correlation; NHWC inputs.

    Returns an (N, C) array.  Formula matches ``unet.py:641-678`` including
    its epsilon placement, so trained-loss trajectories are comparable.
    """
    n, h, w, c = pred.shape
    p = jnp.transpose(pred, (0, 3, 1, 2)).reshape(n, c, h * w)
    t = jnp.transpose(target, (0, 3, 1, 2)).reshape(n, c, h * w)
    m = jnp.transpose(
        jnp.broadcast_to(mask, pred.shape), (0, 3, 1, 2)
    ).reshape(n, c, h * w)

    msum = jnp.sum(m, axis=2, keepdims=True) + _EPS
    mean_p = jnp.sum(p * m, axis=2, keepdims=True) / msum
    mean_t = jnp.sum(t * m, axis=2, keepdims=True) / msum
    std_p = jnp.sqrt(jnp.sum(m * (p - mean_p) ** 2, axis=2, keepdims=True) / msum + _EPS)
    std_t = jnp.sqrt(jnp.sum(m * (t - mean_t) ** 2, axis=2, keepdims=True) / msum + _EPS)
    pn = (p - mean_p) / std_p
    tn = (t - mean_t) / std_t
    num = jnp.sum(m * pn * tn, axis=2)
    den = jnp.sum(m, axis=2)
    return num / den


def pearson_loss(pred, target, mask):
    return 1.0 - jnp.mean(masked_pearson(pred, target, mask))


def kl_divergence(mu, logvar):
    """KL(q(z|x) || N(0, I)), mean over batch, sum over latent dims."""
    return jnp.mean(
        -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
    )


def gradient_penalty(rng, discriminator_fn, real, fake):
    """WGAN-GP gradient penalty (parity with ``unet.py:277-293``'s GAN
    leftover): penalise ||grad D(interpolate)||_2 deviating from 1."""
    alpha = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), real.dtype)
    interpolates = alpha * real + (1.0 - alpha) * fake

    def d_sum(z):
        return jnp.sum(discriminator_fn(z))

    grads = jax.grad(d_sum)(interpolates)
    norms = jnp.sqrt(jnp.sum(grads**2, axis=(1, 2, 3)) + _EPS)
    return jnp.mean((norms - 1.0) ** 2)


def total_variation(x):
    """NHWC total-variation loss (``unet.py:682-691`` semantics)."""
    n = x.shape[0]
    h_tv = jnp.sum((x[:, 1:, :, :] - x[:, :-1, :, :]) ** 2)
    w_tv = jnp.sum((x[:, :, 1:, :] - x[:, :, :-1, :]) ** 2)
    count_h = x[:, 1:, :, :].size // n
    count_w = x[:, :, 1:, :].size // n
    return 2.0 * (h_tv / count_h + w_tv / count_w) / n
