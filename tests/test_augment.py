"""Paired train-batch augmentation (``ops/augment.py``) — fix-forward of the
reference's inert torchvision transforms (SURVEY §4: ``dataset.transform``
assigned at ``unet.py:425-431`` but never applied)."""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cae_tools_tpu.ops.augment import (
    _rotate_bilinear,
    make_augment,
    wrap_loss_with_augment,
)


def _batch(n=8, h=6, w=4, c=1, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": jnp.asarray(rng.random((n, h, w, c), dtype=np.float32)),
        "y": jnp.asarray(rng.random((n, h * 2, w * 2, c), dtype=np.float32)),
        "m": jnp.ones((n, h * 2, w * 2, 1), jnp.float32),
        "w": jnp.ones((n,), jnp.float32),
    }


def test_make_augment_disabled_and_unknown():
    assert make_augment(None) is None
    assert make_augment([]) is None
    with pytest.raises(ValueError):
        make_augment(["zoom"])


def test_flips_are_paired_across_keys():
    batch = _batch()
    fn = make_augment(["hflip"])
    out = fn(jax.random.PRNGKey(3), batch)
    flipped = vanilla = 0
    for i in range(batch["x"].shape[0]):
        x_flipped = bool(
            jnp.allclose(out["x"][i], jnp.flip(batch["x"][i], axis=1))
        )
        x_same = bool(jnp.allclose(out["x"][i], batch["x"][i]))
        y_flipped = bool(
            jnp.allclose(out["y"][i], jnp.flip(batch["y"][i], axis=1))
        )
        y_same = bool(jnp.allclose(out["y"][i], batch["y"][i]))
        # one draw per sample applies to input AND target identically
        assert x_flipped == y_flipped and x_same == y_same
        assert x_flipped != x_same
        flipped += x_flipped
        vanilla += x_same
    assert flipped > 0 and vanilla > 0  # p=0.5 over 8 samples, seed-checked
    # weights are never touched
    np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(batch["w"]))


def test_vflip_axis():
    batch = _batch(n=4, seed=1)
    out = make_augment(["vflip"])(jax.random.PRNGKey(0), batch)
    for i in range(4):
        same = bool(jnp.allclose(out["x"][i], batch["x"][i]))
        flip = bool(jnp.allclose(out["x"][i], jnp.flip(batch["x"][i], axis=0)))
        assert same or flip


def test_rotate_bilinear_180_matches_flip():
    # 180-degree rotation about the center of an odd-sized grid lands
    # exactly on grid points = flip of both spatial axes
    img = jnp.asarray(
        np.random.default_rng(2).random((5, 7, 2), dtype=np.float32)
    )
    rot = _rotate_bilinear(img, jnp.asarray(math.pi, jnp.float32))
    np.testing.assert_allclose(
        np.asarray(rot), np.asarray(jnp.flip(img, (0, 1))), atol=1e-5
    )


def test_rotate_zero_degrees_is_identity():
    batch = _batch(n=3, seed=4)
    out = make_augment(["rotate"], rotate_degrees=0.0)(
        jax.random.PRNGKey(0), batch
    )
    np.testing.assert_allclose(
        np.asarray(out["y"]), np.asarray(batch["y"]), atol=1e-6
    )


def test_rotate_mask_drops_fill_regions():
    # a 45-degree rotation of an all-ones mask must zero the corners
    m = jnp.ones((9, 9, 1), jnp.float32)
    rot = _rotate_bilinear(m, jnp.asarray(math.pi / 4, jnp.float32))
    assert float(rot[0, 0, 0]) == 0.0 and float(rot[8, 8, 0]) == 0.0
    assert float(rot[4, 4, 0]) == pytest.approx(1.0)


def test_crop_identity_at_full_scale():
    batch = _batch(n=3, seed=6)
    out = make_augment(["crop"], crop_scale=(1.0, 1.0))(
        jax.random.PRNGKey(0), batch
    )
    np.testing.assert_allclose(
        np.asarray(out["y"]), np.asarray(batch["y"]), atol=1e-6
    )


def test_crop_is_paired_in_relative_coordinates():
    """Identical arrays under the same draw must produce identical crops —
    the pairing guarantee that torchvision's independent RandomResizedCrop
    would have broken."""
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.random((4, 12, 12, 1), dtype=np.float32))
    batch = {"x": a, "y": a, "w": jnp.ones((4,), jnp.float32)}
    out = make_augment(["crop"], crop_scale=(0.5, 0.9))(
        jax.random.PRNGKey(2), batch
    )
    np.testing.assert_array_equal(np.asarray(out["x"]), np.asarray(out["y"]))
    # and it actually cropped (zoomed) something
    assert not np.allclose(np.asarray(out["x"]), np.asarray(a))
    # values stay within the original range (bilinear, in-bounds sampling)
    assert float(out["x"].min()) >= float(a.min()) - 1e-6
    assert float(out["x"].max()) <= float(a.max()) + 1e-6


def test_crop_zooms_center_region():
    from cae_tools_tpu.ops.augment import _crop_resize

    # image with a bright center: a 0.5-scale center crop keeps the
    # bright region and magnifies it
    img = np.zeros((16, 16, 1), np.float32)
    img[6:10, 6:10, 0] = 1.0
    out = _crop_resize(
        jnp.asarray(img),
        jnp.asarray(0.5, jnp.float32),
        jnp.asarray(0.5, jnp.float32),
        jnp.asarray(0.5, jnp.float32),
    )
    assert float(jnp.mean(out)) > float(np.mean(img)) * 2  # magnified


def test_wrap_loss_augments_only_training():
    batch = _batch(n=4, seed=5)
    seen = {}

    def loss_fn(params, state, rng, b, train):
        seen[train] = b["x"]
        return jnp.sum(b["x"]), (state, {})

    wrapped = wrap_loss_with_augment(loss_fn, make_augment(["flip"]))
    wrapped(None, None, jax.random.PRNGKey(7), batch, True)
    wrapped(None, None, jax.random.PRNGKey(7), batch, False)
    assert not np.allclose(np.asarray(seen[True]), np.asarray(batch["x"]))
    np.testing.assert_array_equal(
        np.asarray(seen[False]), np.asarray(batch["x"])
    )
    # no-op wrapper when augmentation is off
    assert wrap_loss_with_augment(loss_fn, None) is loss_fn


def test_gan_train_with_augmentation_smoke():
    """The adversarial trainer augments once per step (critic and
    generator see the same augmented pair)."""
    from cae_tools_tpu.models import ResUNetGAN
    from cae_tools_tpu.xrcompat import xr

    rng = np.random.default_rng(17)
    n = 8
    hi = 288.0 + rng.random((n, 1, 16, 16)).astype(np.float32) * 5.0
    lo = hi.reshape(n, 1, 4, 4, 4, 4).mean(axis=(3, 5))
    ds = xr.Dataset()
    ds["hires"] = xr.DataArray(hi, dims=("n", "c", "y2", "x2"))
    ds["lowres"] = xr.DataArray(lo, dims=("n", "c", "y1", "x1"))

    mt = ResUNetGAN(batch_size=4, nr_epochs=2, test_interval=1,
                    encoded_dim_size=4, fc_size=8)
    mt.augment = ["flip"]
    mt.train(["lowres"], "hires", ds, ds)
    assert all(np.isfinite(v) for v in mt.history["train_loss"])


def test_train_with_augmentation_smoke(tmp_path):
    """ConvAE trains under jit with augmentation traced into the step."""
    from cae_tools_tpu.models import ConvAEModel
    from cae_tools_tpu.xrcompat import xr

    rng = np.random.default_rng(11)
    n = 10
    hi = rng.random((n, 1, 16, 16)).astype(np.float32)
    lo = hi.reshape(n, 1, 4, 4, 4, 4).mean(axis=(3, 5))
    ds = xr.Dataset()
    ds["hires"] = xr.DataArray(hi, dims=("n", "c", "y2", "x2"))
    ds["lowres"] = xr.DataArray(lo, dims=("n", "c", "y1", "x1"))

    mt = ConvAEModel(batch_size=5, nr_epochs=4, test_interval=2,
                     encoded_dim_size=4, fc_size=8)
    mt.augment = ["flip", "rotate"]
    mt.rotate_degrees = 15.0
    mt.train(["lowres"], "hires", ds, ds)
    assert all(np.isfinite(v) for v in mt.history["train_loss"])
    assert all(np.isfinite(v) for v in mt.history["test_loss"])
