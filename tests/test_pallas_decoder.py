"""Fused Pallas decoder-tail kernel: parity vs the XLA ConvDecoder
(interpret mode on CPU; the compiled path runs on real TPU via bench)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cae_tools_tpu.models.sizer import LayerSpec, create_model_spec
from cae_tools_tpu.nn import modules as M
from cae_tools_tpu.ops import convops
from cae_tools_tpu.ops.pallas.decoder_kernel import (
    decoder_apply_fused_tail,
    tail_start_index,
)


def _decoder_with_state(spec, latent=16, fc=32, seed=0):
    dec = M.ConvDecoder(spec.output_layers, latent, fc)
    dp, ds = dec.init(jax.random.PRNGKey(seed))
    # non-trivial BN running stats so the eval-mode folding is exercised
    rng = np.random.default_rng(seed)

    def jitter(a):
        if a.dtype == jnp.float32:
            return a + 0.3 * jnp.asarray(
                np.abs(rng.normal(size=a.shape)).astype(np.float32)
            )
        return a

    ds = jax.tree_util.tree_map(jitter, ds)
    return dec, dp, ds


@pytest.mark.parametrize(
    "in_size,out_size",
    [
        ((16, 16), (256, 256)),   # flagship: k3 stages + final k4
        ((24, 20), (280, 256)),   # non-square grid
        ((6, 6), (250, 254)),     # odd/even output mix
    ],
)
def test_fused_tail_matches_xla_decoder(in_size, out_size):
    convops.set_precision("highest")
    try:
        spec = create_model_spec(
            input_size=in_size, input_channels=1,
            output_size=out_size, output_channels=1,
        )
        dec, dp, ds = _decoder_with_state(spec)
        start = tail_start_index(dec)
        assert start is not None
        z = jnp.asarray(
            np.random.default_rng(2).normal(size=(2, 16)).astype(np.float32)
        )
        ref, _ = dec.apply(dp, ds, z, train=False)
        out = decoder_apply_fused_tail(dec, dp, ds, z, interpret=True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
        )
    finally:
        convops.set_precision("high")


def test_fused_tail_multichannel_output():
    """Final stage with >1 output channel exercises the multi-plane write."""
    convops.set_precision("highest")
    try:
        spec = create_model_spec(
            input_size=(16, 16), input_channels=1,
            output_size=(96, 96), output_channels=2,
        )
        dec, dp, ds = _decoder_with_state(spec, seed=3)
        z = jnp.asarray(
            np.random.default_rng(4).normal(size=(2, 16)).astype(np.float32)
        )
        ref, _ = dec.apply(dp, ds, z, train=False)
        out = decoder_apply_fused_tail(dec, dp, ds, z, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
        )
    finally:
        convops.set_precision("high")


def test_tail_start_rejects_unsupported():
    # stride 1 disables the parity decomposition
    ls = LayerSpec(False, 3, 1, (4, 8, 8), (1, 10, 10), 0)
    dec = M.ConvDecoder([ls], 4, 8)
    assert tail_start_index(dec) is None
    # output_padding unsupported
    ls2 = LayerSpec(False, 3, 2, (4, 8, 8), (1, 18, 18), 1)
    dec2 = M.ConvDecoder([ls2], 4, 8)
    assert tail_start_index(dec2) is None
    # wide kernels unsupported (tap shift > 1)
    ls3 = LayerSpec(False, 6, 2, (4, 8, 8), (1, 20, 20), 0)
    dec3 = M.ConvDecoder([ls3], 4, 8)
    assert tail_start_index(dec3) is None


def test_model_predict_uses_fused_path(monkeypatch, tmp_path_factory):
    """CAE_TPU_FUSED_DECODER=1 routes ConvAEModel apply through the kernel
    (interpret on CPU) and matches the default path."""
    from cae_tools_tpu.data.datagen import generate_spec_files
    from cae_tools_tpu.models import ConvAEModel
    from cae_tools_tpu.xrcompat import xr

    root = str(tmp_path_factory.mktemp("fd"))
    folder = generate_spec_files("circle", root, n=8, seed=9)
    train_ds = xr.open_dataset(folder + "/train.nc")
    test_ds = xr.open_dataset(folder + "/test.nc")
    mt = ConvAEModel(batch_size=4, nr_epochs=2, test_interval=2,
                     encoded_dim_size=4, fc_size=8)
    mt.train(["lowres"], "hires", train_ds, test_ds)

    x = np.random.default_rng(0).random((6, 16, 16, 1), np.float32)
    monkeypatch.delenv("CAE_TPU_FUSED_DECODER", raising=False)
    assert not mt._use_fused_decoder()  # CPU backend: off by default
    ref = mt._predict_normalised(x)

    monkeypatch.setenv("CAE_TPU_FUSED_DECODER", "1")
    mt._apply_cache = {}
    assert mt._use_fused_decoder()
    out = mt._predict_normalised(x)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)


def _unet_modules(in_size=(16, 16), out_size=(256, 256), latent=16, fc=32,
                  final_sigmoid=True, seed=0):
    spec = create_model_spec(
        input_size=in_size, input_channels=1,
        output_size=out_size, output_channels=1,
    )
    enc = M.UNetEncoder(spec.input_layers, latent, fc, dropout_rate=0.1)
    skip_shapes = [
        tuple(l.get_output_dimensions()) for l in spec.input_layers[:-1]
    ]
    dec = M.UNetDecoder(
        spec.output_layers, latent, fc, dropout_rate=0.1,
        skip_shapes=skip_shapes, final_sigmoid=final_sigmoid,
    )
    ep, es = enc.init(jax.random.PRNGKey(seed))
    dp, ds = dec.init(jax.random.PRNGKey(seed + 1))
    # non-trivial BN running stats so the folding is exercised
    rng = np.random.default_rng(seed)

    def jitter(a):
        if a.dtype == jnp.float32:
            return a + 0.3 * jnp.asarray(
                np.abs(rng.normal(size=a.shape)).astype(np.float32)
            )
        return a

    ds = jax.tree_util.tree_map(jitter, ds)
    return enc, (ep, es), dec, (dp, ds)


@pytest.mark.parametrize("final_sigmoid", [True, False])
def test_unet_fused_tail_matches_xla_decoder(final_sigmoid):
    """UNET-family fused tail (skip-free trailing stages) vs XLA, both
    the sigmoid head (UNET) and the linear residual head (UNETRes)."""
    from cae_tools_tpu.ops.pallas.decoder_kernel import (
        unet_decoder_apply_fused_tail,
        unet_tail_start_index,
    )

    convops.set_precision("highest")
    try:
        enc, (ep, es), dec, (dp, ds) = _unet_modules(
            final_sigmoid=final_sigmoid
        )
        start = unet_tail_start_index(dec)
        assert start is not None
        x = jnp.asarray(
            np.random.default_rng(2).random((2, 16, 16, 1), np.float32)
        )
        (z, skips), _ = enc.apply(ep, es, x, train=False)
        ref, _ = dec.apply(dp, ds, z, skips, train=False)
        out = unet_decoder_apply_fused_tail(
            dec, dp, ds, z, skips, interpret=True
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=0
        )
    finally:
        convops.set_precision("high")


def test_unet_tail_rejects_skip_stages():
    """Stages that consume a skip are never part of the fused tail."""
    from cae_tools_tpu.ops.pallas.decoder_kernel import (
        _unet_stage_has_skip,
        unet_tail_start_index,
    )

    enc, _, dec, _ = _unet_modules()
    start = unet_tail_start_index(dec)
    assert start is not None
    assert all(
        not _unet_stage_has_skip(dec, i)
        for i in range(start, len(dec.layers))
    )
    # at least one earlier stage does consume a skip in this geometry
    assert any(_unet_stage_has_skip(dec, i) for i in range(start))


def test_unetres_model_fused_apply_parity(monkeypatch):
    """UNETRes._forward_eval_p with the fused tail forced on matches the
    pure-XLA forward (residual head applied outside the kernel)."""
    from cae_tools_tpu.models.unet_model import UNETRes

    mt = UNETRes.__new__(UNETRes)  # bypass ctor; set what the path needs
    mt.input_shape = (1, 16, 16)
    mt.output_shape = (1, 256, 256)
    mt.encoded_dim_size = 16
    mt.fc_size = 32
    enc, (ep, es), dec, (dp, ds) = _unet_modules(final_sigmoid=False)
    mt.encoder, mt.decoder = enc, dec
    import jax as _jax

    mt.params = {
        "encoder": ep, "decoder": dp,
        "base_proj": {
            "w": jnp.full((1, 1, 1, 1), 1.0, jnp.float32),
            "b": jnp.zeros((1,), jnp.float32),
        },
        "res_scale": jnp.asarray(0.01, jnp.float32),
    }
    mt.state = {"encoder": es, "decoder": ds}

    x = jnp.asarray(
        np.random.default_rng(5).random((2, 16, 16, 1), np.float32)
    )
    monkeypatch.setenv("CAE_TPU_FUSED_DECODER", "0")
    ref = mt._forward_eval_p(mt.params, mt.state, x)
    monkeypatch.setenv("CAE_TPU_FUSED_DECODER", "1")
    out = mt._forward_eval_p(mt.params, mt.state, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=0
    )


def test_fused_tail_denorm_matches_affine():
    """denorm=(lo, range) in the kernel == affine applied to the plain
    fused output; nchw_out returns the kernel-native layout."""
    convops.set_precision("highest")
    try:
        spec = create_model_spec(
            input_size=(16, 16), input_channels=1,
            output_size=(64, 64), output_channels=1,
        )
        dec, dp, ds = _decoder_with_state(spec, seed=7)
        z = jnp.asarray(
            np.random.default_rng(8).normal(size=(3, 16)).astype(np.float32)
        )
        plain = decoder_apply_fused_tail(dec, dp, ds, z, interpret=True)
        lo, rng = jnp.float32(271.5), jnp.float32(24.25)
        out = decoder_apply_fused_tail(
            dec, dp, ds, z, interpret=True, denorm=(lo, rng), nchw_out=True
        )
        assert out.shape == (3, 1, 64, 64)
        ref = np.asarray(lo) + np.asarray(plain) * np.asarray(rng)
        ref_nchw = np.transpose(ref, (0, 3, 1, 2))
        np.testing.assert_allclose(
            np.asarray(out), ref_nchw, rtol=1e-6, atol=1e-5
        )
    finally:
        convops.set_precision("high")


def test_model_predict_denorm_fused_path(monkeypatch, tmp_path_factory):
    """ConvAEModel._predict_denorm_nchw routes the denorm affine into the
    Pallas tail when fused (interpret on CPU) and matches the XLA path."""
    from cae_tools_tpu.data.datagen import generate_spec_files
    from cae_tools_tpu.models import ConvAEModel
    from cae_tools_tpu.xrcompat import xr

    root = str(tmp_path_factory.mktemp("fdn"))
    folder = generate_spec_files("circle", root, n=8, seed=11)
    train_ds = xr.open_dataset(folder + "/train.nc")
    test_ds = xr.open_dataset(folder + "/test.nc")
    mt = ConvAEModel(batch_size=4, nr_epochs=2, test_interval=2,
                     encoded_dim_size=4, fc_size=8)
    mt.train(["lowres"], "hires", train_ds, test_ds)

    x = np.random.default_rng(1).random((6, 16, 16, 1), np.float32)
    lo, hi = 270.0, 295.0  # Kelvin-scale output normalisation
    monkeypatch.delenv("CAE_TPU_FUSED_DECODER", raising=False)
    assert not mt._use_fused_decoder()
    ref = mt._predict_denorm_nchw(x, lo, hi)

    monkeypatch.setenv("CAE_TPU_FUSED_DECODER", "1")
    mt._apply_cache = {}
    assert mt._use_fused_decoder()
    out = mt._predict_denorm_nchw(x, lo, hi)
    assert out.shape == ref.shape == (6, 1, 256, 256)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-3)


def test_unet_fused_tail_denorm_matches_affine():
    from cae_tools_tpu.ops.pallas.decoder_kernel import (
        unet_decoder_apply_fused_tail,
    )

    convops.set_precision("highest")
    try:
        enc, (ep, es), dec, (dp, ds) = _unet_modules(
            out_size=(64, 64), seed=13
        )
        x = jnp.asarray(
            np.random.default_rng(14).random((2, 16, 16, 1), np.float32)
        )
        (z, skips), _ = enc.apply(ep, es, x, train=False)
        plain = unet_decoder_apply_fused_tail(
            dec, dp, ds, z, skips, interpret=True
        )
        lo, rng = jnp.float32(-3.0), jnp.float32(6.5)
        out = unet_decoder_apply_fused_tail(
            dec, dp, ds, z, skips, interpret=True,
            denorm=(lo, rng), nchw_out=True,
        )
        ref = np.asarray(lo) + np.asarray(plain) * np.asarray(rng)
        np.testing.assert_allclose(
            np.asarray(out), np.transpose(ref, (0, 3, 1, 2)),
            atol=1e-5, rtol=0,
        )
    finally:
        convops.set_precision("high")


def test_unetres_predict_denorm_keeps_residual_head(monkeypatch):
    """UNETRes must NOT inherit UNET's fold-into-kernel denorm (the
    residual head runs after the core); fused on == fused off."""
    from cae_tools_tpu.models.unet_model import UNETRes

    mt = UNETRes.__new__(UNETRes)
    mt.input_shape = (1, 16, 16)
    mt.output_shape = (1, 256, 256)
    mt.encoded_dim_size = 16
    mt.fc_size = 32
    enc, (ep, es), dec, (dp, ds) = _unet_modules(final_sigmoid=False)
    mt.encoder, mt.decoder = enc, dec
    mt.params = {
        "encoder": ep, "decoder": dp,
        "base_proj": {
            "w": jnp.full((1, 1, 1, 1), 1.0, jnp.float32),
            "b": jnp.zeros((1,), jnp.float32),
        },
        "res_scale": jnp.asarray(0.01, jnp.float32),
    }
    mt.state = {"encoder": es, "decoder": ds}
    x = jnp.asarray(
        np.random.default_rng(15).random((2, 16, 16, 1), np.float32)
    )
    lo, rng = jnp.float32(270.0), jnp.float32(25.0)
    monkeypatch.setenv("CAE_TPU_FUSED_DECODER", "0")
    ref = mt._forward_denorm_nchw_p(mt.params, mt.state, x, lo, rng)
    monkeypatch.setenv("CAE_TPU_FUSED_DECODER", "1")
    out = mt._forward_denorm_nchw_p(mt.params, mt.state, x, lo, rng)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-3, rtol=0
    )


def test_ilv_mode_follows_precision_ladder(monkeypatch):
    """The interleave-matmul precision rides the product conv-precision
    knob (TPU MXU input rounding, decoder_kernel._ilv_mode): default ->
    1-pass, high -> 2-pass compensated, highest -> Precision.HIGHEST;
    env override wins."""
    from cae_tools_tpu.ops.pallas.decoder_kernel import _ilv_mode

    monkeypatch.delenv("CAE_TPU_ILV_PRECISION", raising=False)
    try:
        convops.set_precision("default")
        assert _ilv_mode() == "default"
        convops.set_precision("high")
        assert _ilv_mode() == "compensated"
        convops.set_precision("highest")
        assert _ilv_mode() == "highest"
        monkeypatch.setenv("CAE_TPU_ILV_PRECISION", "compensated")
        convops.set_precision("default")
        assert _ilv_mode() == "compensated"
    finally:
        convops.set_precision("high")


@pytest.mark.parametrize("mode", ["default", "compensated", "highest"])
def test_ilv_modes_agree_in_interpret(monkeypatch, mode):
    """All interleave modes are bit-identical under interpret-mode f32
    math (the ladder only changes MXU input rounding on real hardware;
    the compensated hi/lo split reconstructs exactly in f32)."""
    monkeypatch.setenv("CAE_TPU_ILV_PRECISION", mode)
    spec = create_model_spec(
        input_size=(16, 16), input_channels=1,
        output_size=(256, 256), output_channels=1,
    )
    dec, dp, ds = _decoder_with_state(spec)
    z = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, 16)).astype(np.float32)
    )
    ref, _ = dec.apply(dp, ds, z, train=False)
    out = decoder_apply_fused_tail(dec, dp, ds, z, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
    )


def test_ilv_env_rejects_unknown_mode(monkeypatch):
    """A typo'd CAE_TPU_ILV_PRECISION must fail with an actionable error
    naming the variable, not a KeyError from inside the kernel trace."""
    from cae_tools_tpu.ops.pallas.decoder_kernel import _ilv_mode

    monkeypatch.setenv("CAE_TPU_ILV_PRECISION", "compensate")
    with pytest.raises(ValueError, match="CAE_TPU_ILV_PRECISION"):
        _ilv_mode()


def test_fused_tail_bf16_output_dtype():
    """Opt-in ``out_dtype="bfloat16"`` (serving): same values to bf16
    rounding (~2e-3 rel — outside the parity contract), bf16 out buffer."""
    spec = create_model_spec(
        input_size=(16, 16), input_channels=1,
        output_size=(256, 256), output_channels=1,
    )
    dec, dp, ds = _decoder_with_state(spec)
    z = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 16)).astype(np.float32)
    )
    f32 = decoder_apply_fused_tail(
        dec, dp, ds, z, interpret=True, denorm=(275.0, 30.0), nchw_out=True
    )
    b16 = decoder_apply_fused_tail(
        dec, dp, ds, z, interpret=True, denorm=(275.0, 30.0), nchw_out=True,
        out_dtype="bfloat16",
    )
    assert f32.dtype == jnp.float32 and b16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(b16, np.float32), np.asarray(f32), rtol=4e-3
    )


@pytest.mark.parametrize("fused", [False, True])
def test_model_output_dtype_bf16_apply(monkeypatch, tmp_path_factory, fused):
    """``set_output_dtype("bfloat16")`` (apply_cae --output-dtype): the
    netCDF prediction variable stays float32 (widened on host) and its
    values match the f32 path to bf16 rounding on the Kelvin scale —
    on both the XLA default path and the fused Pallas tail."""
    import os as _os

    from cae_tools_tpu.data.datagen import generate_spec_files
    from cae_tools_tpu.models import ConvAEModel
    from cae_tools_tpu.xrcompat import xr

    root = str(tmp_path_factory.mktemp("odt"))
    folder = generate_spec_files("circle", root, n=8, seed=13)
    ds = xr.open_dataset(_os.path.join(folder, "train.nc"))
    mt = ConvAEModel(batch_size=4, nr_epochs=1, encoded_dim_size=4, fc_size=8)
    mt.train(["lowres"], "hires", ds, ds)
    if fused:
        monkeypatch.setenv("CAE_TPU_FUSED_DECODER", "1")
        mt._apply_cache = {}
        assert mt._use_fused_decoder()

    mt.apply(ds, ["lowres"], "pred_f32")
    mt.set_output_dtype("bfloat16")
    mt.apply(ds, ["lowres"], "pred_b16")
    a = np.asarray(ds["pred_f32"].values)
    b = np.asarray(ds["pred_b16"].values)
    assert b.dtype == np.float32  # widened for the netCDF write
    scale = max(1.0, np.abs(a).max())
    np.testing.assert_allclose(b / scale, a / scale, atol=4e-3)
