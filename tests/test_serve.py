"""Serving bundles: export a trained model folder via jax.export, reload
with the standalone loader, and check raw-input predictions match the
product apply path exactly (serve/ has no reference counterpart)."""

import os

import numpy as np
import pytest

from cae_tools_tpu.models import load_model
from cae_tools_tpu.models.conv_ae_model import ConvAEModel
from cae_tools_tpu.models.linear_model import LinearModel
from cae_tools_tpu.serve import export_bundle, load_bundle
from cae_tools_tpu.xrcompat import xr


def _tiny_ds(n=10, seed=0):
    """Kelvin-scale 4x4 -> 16x16 pairs (block-mean related)."""
    rng = np.random.default_rng(seed)
    hi = 280.0 + rng.random((n, 1, 16, 16)).astype(np.float32) * 15.0
    lo = hi.reshape(n, 1, 4, 4, 4, 4).mean(axis=(3, 5))
    ds = xr.Dataset()
    ds["hires"] = xr.DataArray(hi, dims=("n", "c", "y2", "x2"))
    ds["lowres"] = xr.DataArray(lo, dims=("n", "c", "y1", "x1"))
    return ds


@pytest.fixture(scope="module")
def convae_folder(tmp_path_factory):
    folder = str(tmp_path_factory.mktemp("serve") / "convae")
    mt = ConvAEModel(
        batch_size=4, nr_epochs=2, test_interval=2,
        encoded_dim_size=4, fc_size=8,
    )
    mt.train(["lowres"], "hires", _tiny_ds(), _tiny_ds(seed=1))
    mt.save(folder)
    return folder


def _raw_nhwc(ds, var="lowres"):
    return np.ascontiguousarray(
        np.asarray(ds[var].values, np.float32).transpose(0, 2, 3, 1)
    )


def test_export_and_predict_matches_apply(convae_folder, tmp_path):
    bundle_folder = str(tmp_path / "bundle")
    manifest = export_bundle(convae_folder, bundle_folder, batch_size=4)
    assert manifest["model_type"] == "ConvAEModel"
    for f in ("apply.jaxexport", "weights.npz", "manifest.json"):
        assert os.path.exists(os.path.join(bundle_folder, f)), f

    # product apply path (normalises internally, emits denormalised NCHW)
    mt = load_model(convae_folder)
    score_ds = _tiny_ds(n=7, seed=2)  # 7: not a multiple of the batch
    mt.apply(score_ds, ["lowres"], "pred")
    ref = np.asarray(score_ds["pred"].values)

    sm = load_bundle(bundle_folder)
    out = sm.predict(_raw_nhwc(score_ds))
    assert out.shape == ref.shape == (7, 1, 16, 16)
    # identical math modulo jit re-linking; outputs are Kelvin-scale
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-4)


def test_export_linear_model(tmp_path):
    folder = str(tmp_path / "linear")
    mt = LinearModel(batch_size=5, nr_epochs=4, test_interval=2, lr=0.05)
    mt.train(["lowres"], "hires", _tiny_ds(), _tiny_ds(seed=1))
    mt.save(folder)

    bundle_folder = str(tmp_path / "bundle")
    export_bundle(folder, bundle_folder)  # default batch = model batch

    score_ds = _tiny_ds(n=5, seed=3)
    mt2 = load_model(folder)
    mt2.apply(score_ds, ["lowres"], "pred")
    ref = np.asarray(score_ds["pred"].values)

    out = load_bundle(bundle_folder).predict(_raw_nhwc(score_ds))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-4)


def test_export_cli(convae_folder, tmp_path, capsys):
    from cae_tools_tpu.cli.export_cae import main

    bundle_folder = str(tmp_path / "cli_bundle")
    main([bundle_folder, "--model-folder", convae_folder,
          "--batch-size", "2"])
    assert "Exported ConvAEModel (batch 2" in capsys.readouterr().out

    sm = load_bundle(bundle_folder)
    assert sm.batch_size == 2
    out = sm.predict(_raw_nhwc(_tiny_ds(n=3, seed=4)))
    assert out.shape == (3, 1, 16, 16)
    assert np.isfinite(out).all()


def test_bundle_rejects_wrong_geometry(convae_folder, tmp_path):
    bundle_folder = str(tmp_path / "bundle")
    export_bundle(convae_folder, bundle_folder, batch_size=2)
    sm = load_bundle(bundle_folder)
    with pytest.raises(ValueError, match="expected"):
        sm.predict(np.zeros((2, 8, 8, 1), np.float32))


def test_export_model_in_memory(tmp_path):
    """export_model on a live (never-saved) model instance."""
    from cae_tools_tpu.serve import export_model

    mt = LinearModel(batch_size=4, nr_epochs=4, test_interval=2, lr=0.05)
    mt.train(["lowres"], "hires", _tiny_ds(), _tiny_ds(seed=1))

    bundle_folder = str(tmp_path / "bundle")
    man = export_model(mt, bundle_folder, batch_size=4)
    assert man["model_type"] == "LinearModel"
    assert man["devices"] == 1

    score_ds = _tiny_ds(n=6, seed=5)
    mt.apply(score_ds, ["lowres"], "pred")
    ref = np.asarray(score_ds["pred"].values)
    out = load_bundle(bundle_folder).predict(_raw_nhwc(score_ds))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-4)


def test_export_dp_sharded(convae_folder, tmp_path):
    """devices=4: the exported graph shards each dispatch batch over a
    4-device "data" mesh; the loader rebinds it to this host's first 4
    devices and predictions match the single-device product apply."""
    bundle_folder = str(tmp_path / "bundle_dp")
    manifest = export_bundle(
        convae_folder, bundle_folder, batch_size=8, devices=4
    )
    assert manifest["devices"] == 4

    score_ds = _tiny_ds(n=11, seed=6)  # pads 11 -> 16, two chunks
    mt = load_model(convae_folder)
    mt.apply(score_ds, ["lowres"], "pred")
    ref = np.asarray(score_ds["pred"].values)

    sm = load_bundle(bundle_folder)
    out = sm.predict(_raw_nhwc(score_ds))
    assert out.shape == ref.shape == (11, 1, 16, 16)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-4)


def test_export_dp_batch_divisibility(convae_folder, tmp_path):
    with pytest.raises(ValueError, match="not divisible"):
        export_bundle(
            convae_folder, str(tmp_path / "b"), batch_size=6, devices=4
        )


def test_predict_empty_batch(convae_folder, tmp_path):
    """0-case input returns a (0, C, Y, X) array, not a concatenate crash."""
    bundle_folder = str(tmp_path / "bundle")
    export_bundle(convae_folder, bundle_folder, batch_size=2)
    sm = load_bundle(bundle_folder)
    out = sm.predict(np.zeros((0, 4, 4, 1), np.float32))
    assert out.shape == (0, 1, 16, 16)


def test_export_multi_platform_forces_portable_forward(convae_folder,
                                                       tmp_path):
    """platforms=[cpu, tpu]: the fused Pallas tail is a TPU-only custom
    call chosen by the CURRENT backend at trace time; a multi- (or cross-)
    platform export must trace the portable XLA forward instead."""
    import os as _os

    from jax import export as jexport

    bundle_folder = str(tmp_path / "bundle_xplat")
    # force the fused gate ON so the export override (not the cpu backend)
    # is what keeps the Pallas call out of the graph
    _os.environ["CAE_TPU_FUSED_DECODER"] = "1"
    try:
        man = export_bundle(
            convae_folder, bundle_folder, batch_size=2,
            platforms=["cpu", "tpu"],
        )
    finally:
        del _os.environ["CAE_TPU_FUSED_DECODER"]
    assert sorted(man["platforms"]) == ["cpu", "tpu"]
    with open(os.path.join(bundle_folder, "apply.jaxexport"), "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))
    assert "tpu_custom_call" not in exp.mlir_module()
    # and the bundle still serves on this (cpu) host
    out = load_bundle(bundle_folder).predict(_raw_nhwc(_tiny_ds(n=3, seed=8)))
    assert out.shape == (3, 1, 16, 16) and np.isfinite(out).all()


def test_export_bf16_apply_dtype(convae_folder, tmp_path):
    """apply_dtype=bfloat16 export: weights stored at rest in bf16 (npz
    bit-cast to uint16 + manifest leaf_dtypes record), predictions within
    the 1-pass-bf16 error budget of the f32 product apply."""
    from cae_tools_tpu.serve import export_model

    mt = load_model(convae_folder)
    score_ds = _tiny_ds(n=4, seed=7)
    mt.apply(score_ds, ["lowres"], "pred")
    ref = np.asarray(score_ds["pred"].values)

    mt.set_apply_dtype("bfloat16")
    bundle_folder = str(tmp_path / "bundle_bf16")
    man = export_model(mt, bundle_folder, batch_size=4)
    assert man["apply_dtype"] == "bfloat16"
    assert "bfloat16" in man["leaf_dtypes"]

    with np.load(os.path.join(bundle_folder, "weights.npz")) as z:
        kinds = {z[k].dtype.kind for k in z.files}
    assert "V" not in kinds  # no raw-void leaves; bf16 rides as uint16

    sm = load_bundle(bundle_folder)
    out = sm.predict(_raw_nhwc(score_ds))
    # Kelvin-scale outputs; bf16 weight rounding budget (BASELINE.md)
    np.testing.assert_allclose(out, ref, atol=0.5)
    assert float(np.abs(out - ref).max()) > 0.0  # really ran reduced precision


def test_export_bf16_output_dtype(convae_folder, tmp_path):
    """output_dtype=bfloat16 export (export_cae --output-dtype): the
    exported graph returns bf16 predictions within ~2e-3 relative of the
    f32 product apply (serving opt-in, outside the parity contract)."""
    from cae_tools_tpu.serve import export_model

    mt = load_model(convae_folder)
    score_ds = _tiny_ds(n=4, seed=7)
    mt.apply(score_ds, ["lowres"], "pred")
    ref = np.asarray(score_ds["pred"].values)

    mt.set_output_dtype("bfloat16")
    bundle_folder = str(tmp_path / "bundle_bf16out")
    man = export_model(mt, bundle_folder, batch_size=4)
    assert man["output_dtype"] == "bfloat16"

    sm = load_bundle(bundle_folder)
    out = sm.predict(_raw_nhwc(score_ds))
    assert str(out.dtype) == "bfloat16"
    scale = np.abs(ref).max()
    np.testing.assert_allclose(
        np.asarray(out, np.float32) / scale, ref / scale, atol=4e-3
    )
    # empty-batch shortcut honors the manifest dtype
    empty = sm.predict(_raw_nhwc(_tiny_ds(n=1, seed=9))[:0])
    assert empty.shape[0] == 0 and str(empty.dtype) == "bfloat16"
