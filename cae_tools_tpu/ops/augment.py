"""Jittable paired data augmentation.

The reference *defines* torchvision train transforms — RandomHorizontalFlip,
RandomVerticalFlip, RandomRotation(30, fill), RandomResizedCrop — but never
applies them:
``dataset.transform`` is assigned (``unet.py:425-431``,
``conv_ae_model.py:280-289``) and ``DSDataset.__getitem__`` ignores it
(SURVEY.md §4 quirks).  They would also have broken the paired
low-res/high-res relation (independent per-tensor transforms).  This module
implements the intent fix-forward, TPU-style:

 * augmentation is *paired* — one random draw per sample transforms the
   input, target and mask identically (the two grids cover the same
   physical extent, so a shared flip/rotation keeps them aligned);
 * it is pure jittable code on NHWC batch dicts, traced into the compiled
   train step (no host-side PIL work, no dynamic shapes), driven by the
   step rng — eval batches are never augmented;
 * rotation is bilinear resampling (``jax.scipy.ndimage.map_coordinates``,
   order=1) with zero fill, matching torchvision's ``fill=0`` semantics
   (zero = the minimum of the normalised value range); the mask is rotated
   with the same transform so fill regions drop out of masked losses.

Enabled per model via ``model.augment = ["flip", "rotate"]`` or the
``train_cae --augment`` flag (additive; the reference has no working
equivalent).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

#: batch keys transformed by augmentation (per-sample weights "w" are not)
_IMAGE_KEYS = ("x", "y", "m")

_KINDS = ("flip", "hflip", "vflip", "rotate", "crop")


def _rotate_bilinear(img, angle):
    """Rotate one (H, W, C) image by ``angle`` radians about its center,
    bilinear, zero fill."""
    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    ys = cy + (yy - cy) * ca - (xx - cx) * sa
    xs = cx + (yy - cy) * sa + (xx - cx) * ca

    def per_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, [ys, xs], order=1, mode="constant", cval=0.0
        )

    return jnp.moveaxis(
        jax.vmap(per_channel)(jnp.moveaxis(img, -1, 0)), 0, -1
    )


def _crop_resize(img, scale, cy_frac, cx_frac):
    """Sample a ``scale``-sized crop centered at the fractional position
    (cy_frac, cx_frac) and resize it back to the full (H, W) grid,
    bilinear.  Working in *relative* coordinates is what keeps the pair
    aligned: the same (scale, center) draw selects the same physical
    region on the low-res input grid and the high-res target grid."""
    h, w, _ = img.shape
    span_y = scale * (h - 1)
    span_x = scale * (w - 1)
    # clamp the center so the crop stays inside the image
    cy = jnp.clip(cy_frac * (h - 1), span_y / 2, (h - 1) - span_y / 2)
    cx = jnp.clip(cx_frac * (w - 1), span_x / 2, (w - 1) - span_x / 2)
    ys = cy - span_y / 2 + jnp.arange(h, dtype=jnp.float32) * (
        span_y / jnp.maximum(h - 1, 1)
    )
    xs = cx - span_x / 2 + jnp.arange(w, dtype=jnp.float32) * (
        span_x / jnp.maximum(w - 1, 1)
    )
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")

    def per_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, [yy, xx], order=1, mode="nearest"
        )

    return jnp.moveaxis(
        jax.vmap(per_channel)(jnp.moveaxis(img, -1, 0)), 0, -1
    )


def _flip_where(flag, a, axis):
    return jnp.where(
        flag[:, None, None, None].astype(bool), jnp.flip(a, axis=axis), a
    )


def make_augment(
    kinds: Optional[Sequence[str]],
    rotate_degrees: float = 30.0,
    crop_scale: tuple = (0.6, 1.0),
):
    """Build ``augment_fn(rng, batch) -> batch`` or None when disabled.

    ``kinds``: any of ``"flip"`` (= hflip + vflip), ``"hflip"``, ``"vflip"``,
    ``"rotate"`` (uniform angle in ±``rotate_degrees``, the torchvision
    RandomRotation(30) the reference configured) and ``"crop"`` (paired
    random-resized-crop: the reference's RandomResizedCrop(100) would have
    resized to a fixed 100x100 and broken both the pairing and the solved
    geometry; here a random ``crop_scale``-fraction region at a random
    center is taken from the SAME relative coordinates of input, target
    and mask, then resized back to each grid's own size).
    """
    if not kinds:
        return None
    if isinstance(kinds, str):
        kinds = [k for k in kinds.replace(",", " ").split() if k]
    kinds = list(kinds)
    for k in kinds:
        if k not in _KINDS:
            raise ValueError(
                f"unknown augmentation {k!r}; expected one of {_KINDS}"
            )
    hflip = "flip" in kinds or "hflip" in kinds
    vflip = "flip" in kinds or "vflip" in kinds
    rotate = "rotate" in kinds
    crop = "crop" in kinds
    max_rad = math.radians(rotate_degrees)
    s_lo, s_hi = crop_scale

    def augment_fn(rng, batch):
        n = batch[_IMAGE_KEYS[0]].shape[0]
        r_h, r_v, r_a, r_s, r_c = jax.random.split(rng, 5)
        out = dict(batch)
        if hflip:
            flags = jax.random.bernoulli(r_h, 0.5, (n,))
            for k in _IMAGE_KEYS:
                if k in out:
                    out[k] = _flip_where(flags, out[k], axis=2)
        if vflip:
            flags = jax.random.bernoulli(r_v, 0.5, (n,))
            for k in _IMAGE_KEYS:
                if k in out:
                    out[k] = _flip_where(flags, out[k], axis=1)
        if rotate:
            angles = jax.random.uniform(
                r_a, (n,), minval=-max_rad, maxval=max_rad
            )
            for k in _IMAGE_KEYS:
                if k in out:
                    out[k] = jax.vmap(_rotate_bilinear)(out[k], angles)
        if crop:
            scales = jax.random.uniform(r_s, (n,), minval=s_lo, maxval=s_hi)
            centers = jax.random.uniform(r_c, (n, 2))
            for k in _IMAGE_KEYS:
                if k in out:
                    out[k] = jax.vmap(_crop_resize)(
                        out[k], scales, centers[:, 0], centers[:, 1]
                    )
        return out

    return augment_fn


def wrap_loss_with_augment(loss_fn, augment_fn):
    """Augment training batches inside the loss: the trainers call
    ``loss_fn(..., train=True)`` with a per-step rng, so splitting it here
    gives every step fresh draws while eval (``train=False``) stays clean."""
    if augment_fn is None:
        return loss_fn

    def wrapped(params, state, rng, batch, train):
        if train:
            a_rng, rng = jax.random.split(rng)
            batch = augment_fn(a_rng, batch)
        return loss_fn(params, state, rng, batch, train)

    return wrapped
