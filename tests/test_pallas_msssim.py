"""Pallas MS-SSIM kernel parity vs the XLA implementation (interpret mode
on CPU; the compiled path runs on real TPU via bench)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cae_tools_tpu.ops import msssim as xla_ms
from cae_tools_tpu.ops.pallas.msssim_kernel import (
    _ssim_scale_pallas,
    msssim_pallas,
    ssim_pallas,
)


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 48, 40, 1)).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.1, size=x.shape), 0, 1).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_scale_kernel_matches_xla(pair):
    x, y = pair
    s_p, cs_p = _ssim_scale_pallas(x, y, interpret=True)
    win = jnp.asarray(xla_ms._gaussian_kernel(11, 1.5))
    s_x, cs_x = xla_ms._ssim_terms(x, y, win, 1.0)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cs_p), np.asarray(cs_x), rtol=1e-5, atol=1e-6)


def test_ssim_pallas_matches(pair):
    x, y = pair
    ours = float(ssim_pallas(x, y, interpret=True))
    ref = float(xla_ms.ssim(x, y))
    assert ours == pytest.approx(ref, abs=1e-5)


def test_msssim_pallas_matches():
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(2, 176, 176, 1)).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.15, size=x.shape), 0, 1).astype(np.float32)
    ours = float(msssim_pallas(jnp.asarray(x), jnp.asarray(y), interpret=True))
    ref = float(xla_ms.msssim(jnp.asarray(x), jnp.asarray(y)))
    assert ours == pytest.approx(ref, abs=1e-4)


def test_msssim_pallas_gradient_matches():
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(1, 176, 176, 1)).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.1, size=x.shape), 0, 1).astype(np.float32)
    x, y = jnp.asarray(x), jnp.asarray(y)
    g_pallas = jax.grad(lambda a: msssim_pallas(a, y, interpret=True))(x)
    g_xla = jax.grad(lambda a: xla_ms.msssim(a, y))(x)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-4, atol=1e-6
    )


def test_msssim_pallas_gradient_dy_and_per_sample():
    """Analytic backward (round 2): dy path and the per-sample
    (average=False) cotangent both match XLA autodiff."""
    rng = np.random.default_rng(4)
    x = rng.uniform(size=(2, 176, 176, 1)).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.1, size=x.shape), 0, 1).astype(np.float32)
    x, y = jnp.asarray(x), jnp.asarray(y)

    g_pallas = jax.grad(lambda b: msssim_pallas(x, b, interpret=True))(y)
    g_xla = jax.grad(lambda b: xla_ms.msssim(x, b))(y)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-4, atol=1e-6
    )

    # per-sample values + weighted reduction (the VarAE loss pattern)
    wvec = jnp.asarray([1.0, 0.0])  # padded-row weighting

    def loss_pallas(a):
        per = msssim_pallas(a, y, interpret=True, average=False)
        return jnp.sum(jnp.mean(per, axis=1) * wvec)

    def loss_xla(a):
        per = xla_ms.msssim(a, y, average=False)
        return jnp.sum(jnp.mean(per, axis=1) * wvec)

    assert float(loss_pallas(x)) == pytest.approx(float(loss_xla(x)), abs=1e-5)
    gp = jax.grad(loss_pallas)(x)
    gx = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-6)
    # the zero-weight sample gets exactly zero gradient
    assert float(jnp.abs(gp[1]).max()) == 0.0


def test_ssim_scale_bwd_kernel_matches_xla_vjp():
    """The per-scale backward kernel alone vs jax.vjp of the XLA terms."""
    from cae_tools_tpu.ops.pallas.msssim_kernel import _ssim_scale_bwd_pallas

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(size=(2, 48, 40, 2)).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=(2, 48, 40, 2)).astype(np.float32))
    ds = jnp.asarray(rng.normal(size=(2, 2)).astype(np.float32))
    dcs = jnp.asarray(rng.normal(size=(2, 2)).astype(np.float32))

    win = jnp.asarray(xla_ms._gaussian_kernel(11, 1.5))
    _, vjp = jax.vjp(lambda a, b: xla_ms._ssim_terms(a, b, win, 1.0), x, y)
    dx_ref, dy_ref = vjp((ds, dcs))
    dx, dy = _ssim_scale_bwd_pallas(x, y, ds, dcs, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(dy_ref), rtol=1e-4, atol=1e-6)


def test_small_images_validated_or_agree():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(2, 32, 32, 1)).astype(np.float32))
    y = jnp.asarray(
        np.clip(np.asarray(x) + rng.normal(scale=0.1, size=x.shape), 0, 1).astype(
            np.float32
        )
    )
    # a 2-level pyramid fits 32px; pallas wrapper and XLA path agree
    weights2 = (0.4, 0.6)
    ref = float(xla_ms.msssim(x, y, weights=weights2))
    ours2 = float(msssim_pallas(x, y, weights=weights2, interpret=True))
    assert ours2 == pytest.approx(ref, abs=1e-4)
    # too many levels -> clean static error, not silent NaN
    with pytest.raises(ValueError):
        xla_ms.msssim(x, y)  # 5 levels on 32px
    with pytest.raises(ValueError):
        xla_ms.ssim(jnp.zeros((1, 8, 8, 1)), jnp.zeros((1, 8, 8, 1)))
