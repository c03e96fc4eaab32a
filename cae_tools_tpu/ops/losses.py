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

    Implemented as native NHWC axis-(1, 2) reductions — NO transpose or
    reshape.  The original (N, C, H*W) restructuring cost nothing by
    itself, but when this loss was differentiated *jointly* with the
    encoder+decoder weight grads, XLA's layout assignment propagated the
    reshaped layout into the whole conv backward: measured on v5e, the
    full UNET train step was 112 ms vs ~10 ms with either the transpose
    removed or the Pearson term dropped (batch 32 at 256x256) — an 11x
    training-throughput difference from layout alone.
    """
    m = jnp.broadcast_to(mask, pred.shape)
    axes = (1, 2)
    msum = jnp.sum(m, axis=axes, keepdims=True) + _EPS  # (N, 1, 1, C)
    mean_p = jnp.sum(pred * m, axis=axes, keepdims=True) / msum
    mean_t = jnp.sum(target * m, axis=axes, keepdims=True) / msum
    std_p = jnp.sqrt(
        jnp.sum(m * (pred - mean_p) ** 2, axis=axes, keepdims=True) / msum
        + _EPS
    )
    std_t = jnp.sqrt(
        jnp.sum(m * (target - mean_t) ** 2, axis=axes, keepdims=True) / msum
        + _EPS
    )
    pn = (pred - mean_p) / std_p
    tn = (target - mean_t) / std_t
    num = jnp.sum(m * pn * tn, axis=axes)  # (N, C)
    den = jnp.sum(m, axis=axes)
    # empty-mask rows (e.g. zero-weight batch padding) are 0/0 — return a
    # neutral 0 instead of NaN, which would poison the weighted batch mean
    # (0 * NaN = NaN) for every non-batch-divisible dataset
    return jnp.where(den > 0, num / jnp.maximum(den, _EPS), 0.0)


def pearson_loss(pred, target, mask):
    return 1.0 - jnp.mean(masked_pearson(pred, target, mask))


# ---- statistics-form twins (fused final-stage training) -------------------
#
# ``ops/pallas/train_tail.py::last_stage_masked_stats`` reduces the decoder's
# full-resolution output o against target y and mask m into per-(image,
# channel) masked moments without materializing o in HBM.  These twins
# compute masked_mse / masked_pearson from those moments, replicating the
# formulas above *including epsilon placement* so fused and XLA training
# losses are numerically interchangeable.  ``w`` is the per-image batch
# weight (train/loop.py batch padding); the effective mask is m·w per image,
# so first/second moments scale by w and the squared-diff numerator by w².


def masked_mse_from_stats(stats, w):
    num = jnp.sum((w[:, None] ** 2) * stats["s2"])
    c = stats["s2"].shape[1]
    return num / (jnp.sum(w * stats["n_m"]) * c)


def masked_pearson_from_stats(stats, w):
    wv = w[:, None]  # (N, 1) -> broadcast over channels
    nm = stats["n_m"][:, None]
    msum = wv * nm + _EPS
    mean_p = wv * stats["s_o"] / msum
    mean_t = wv * stats["s_y"] / msum
    # Σ m·w·(p − mean_p)² expanded in raw moments
    var_p = wv * (
        stats["s_oo"] - 2.0 * mean_p * stats["s_o"] + mean_p**2 * nm
    )
    var_t = wv * (
        stats["s_yy"] - 2.0 * mean_t * stats["s_y"] + mean_t**2 * nm
    )
    std_p = jnp.sqrt(var_p / msum + _EPS)
    std_t = jnp.sqrt(var_t / msum + _EPS)
    num = wv * (
        stats["s_oy"]
        - mean_p * stats["s_y"]
        - mean_t * stats["s_o"]
        + mean_p * mean_t * nm
    ) / (std_p * std_t)
    den = wv * nm
    return jnp.where(den > 0, num / jnp.maximum(den, _EPS), 0.0)


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


def histogram_loss(pred, target, bins: int = 64, sigma: float | None = None,
                   lo: float = 0.0, hi: float = 1.0):
    """Soft-histogram matching loss over NHWC images.

    The reference accepts ``--additional-loss histogram`` but never defines
    the loss (``cli/train_cae.py:40`` — dead flag); this implements it
    fix-forward.  Each image/channel's pixel distribution is binned with a
    differentiable Gaussian kernel over ``bins`` fixed centers spanning
    ``[lo, hi]`` (the sigmoid-bounded output range), histograms are
    normalised to sum to 1, and the loss is the mean squared difference
    between predicted and target histograms.  Static bin count keeps the
    op a fixed-shape (N, C, bins) contraction — one fused XLA kernel.
    """
    if sigma is None:
        sigma = (hi - lo) / bins
    centers = jnp.linspace(lo, hi, bins, dtype=pred.dtype)

    def soft_hist(x):
        n, h, w, c = x.shape
        flat = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, c, h * w)
        # (N, C, HW, bins) Gaussian kernel weights, reduced over pixels
        k = jnp.exp(-0.5 * ((flat[..., None] - centers) / sigma) ** 2)
        hist = jnp.sum(k, axis=2)
        return hist / (jnp.sum(hist, axis=-1, keepdims=True) + _EPS)

    return jnp.mean((soft_hist(pred) - soft_hist(target)) ** 2) * bins


def contrastive_loss(pred_emb, target_emb, temperature: float = 0.1):
    """Symmetric InfoNCE over per-image embeddings (N, D).

    Fix-forward implementation of the reference's dead
    ``--additional-loss contrastive`` flag: each predicted image must match
    *its own* target against the other targets in the batch (and vice
    versa).  Embeddings are L2-normalised here; callers supply any
    projection (e.g. pooled features from :class:`PerceptualFeatureLoss`).
    """
    p = pred_emb / (jnp.linalg.norm(pred_emb, axis=-1, keepdims=True) + _EPS)
    t = target_emb / (jnp.linalg.norm(target_emb, axis=-1, keepdims=True) + _EPS)
    logits = p @ t.T / temperature  # (N, N)
    labels = jnp.arange(logits.shape[0])
    lp = jax.nn.log_softmax(logits, axis=1)
    lt = jax.nn.log_softmax(logits.T, axis=1)
    return -0.5 * (
        jnp.mean(lp[labels, labels]) + jnp.mean(lt[labels, labels])
    )


def total_variation(x):
    """NHWC total-variation loss (``unet.py:682-691`` semantics)."""
    n = x.shape[0]
    h_tv = jnp.sum((x[:, 1:, :, :] - x[:, :-1, :, :]) ** 2)
    w_tv = jnp.sum((x[:, :, 1:, :] - x[:, :, :-1, :]) ** 2)
    count_h = x[:, 1:, :, :].size // n
    count_w = x[:, :, 1:, :].size // n
    return 2.0 * (h_tv / count_h + w_tv / count_w) / n
