"""Lifecycle tests for VarAEModel and UNET, including mask + multi-input."""

import json
import os

import numpy as np
import pytest

from cae_tools_tpu.models import UNET, VarAEModel, load_model
from cae_tools_tpu.xrcompat import xr


@pytest.fixture(scope="module")
def small_circle(circle_data):
    return circle_data


def _load(folder, name):
    return xr.open_dataset(os.path.join(folder, name))


def test_var_ae_lifecycle(small_circle, tmp_path):
    train_ds = _load(small_circle, "train.nc")
    test_ds = _load(small_circle, "test.nc")
    folder = str(tmp_path / "var_model")

    mt = VarAEModel(
        batch_size=6,
        nr_epochs=6,
        test_interval=3,
        encoded_dim_size=4,
        fc_size=16,
        lambda_kl=0.01,
        lambda_ssim=0.5,
    )
    mt.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    assert len(mt.history["train_loss"]) == 2

    params = json.loads(open(os.path.join(folder, "parameters.json")).read())
    assert params["type"] == "VarAEModel"
    assert params["lambda_ssim"] == 0.5

    # generic loader dispatches on type (model_evaluator.py:70-78 parity)
    mt2 = load_model(folder)
    assert isinstance(mt2, VarAEModel)
    score_ds = _load(small_circle, "test.nc")
    mt2.apply(score_ds, ["lowres"], "prediction")
    assert score_ds["prediction"].shape == (12, 1, 256, 256)

    # deterministic apply (posterior mean): same result twice
    score_ds2 = _load(small_circle, "test.nc")
    mt2.apply(score_ds2, ["lowres"], "prediction")
    np.testing.assert_allclose(
        np.asarray(score_ds["prediction"].values),
        np.asarray(score_ds2["prediction"].values),
        rtol=1e-6,
    )


def test_unet_lifecycle_with_mask_and_aux_input(tmp_path_factory, tmp_path):
    from cae_tools_tpu.data.datagen import generate_spec_files

    root = str(tmp_path_factory.mktemp("data2"))
    folder_data = generate_spec_files("tidal_circle1", root, n=12, seed=3)
    train_ds = _load(folder_data, "train.nc")
    test_ds = _load(folder_data, "test.nc")

    # add a mask variable over the output grid (ragged border masked out)
    mask = np.ones((12, 1, 256, 256), dtype=np.float32)
    mask[:, :, :8, :] = 0.0
    for ds in (train_ds, test_ds):
        ds["mask"] = xr.DataArray(mask, dims=("n", "chan", "y2", "x2"))

    folder = str(tmp_path / "unet_model")
    mt = UNET(
        batch_size=6,
        nr_epochs=4,
        test_interval=2,
        encoded_dim_size=4,
        fc_size=16,
        dropout_rate=0.1,
    )
    mt.train(
        ["lowres", "tide_3d"],
        "hires",
        train_ds,
        test_ds,
        model_path=folder,
        mask_variable_name="mask",
    )
    assert len(mt.history["train_loss"]) == 2

    params = json.loads(open(os.path.join(folder, "parameters.json")).read())
    assert params["type"] == "UNET"
    assert params["dropout_rate"] == 0.1
    assert params["input_shape"] == [2, 6, 6]

    mt2 = load_model(folder)
    assert isinstance(mt2, UNET)
    score_ds = _load(folder_data, "test.nc")
    mt2.apply(score_ds, ["lowres", "tide_3d"], "prediction")
    assert score_ds["prediction"].shape == (12, 1, 256, 256)

    # save/load round trip: identical predictions from both instances
    score_ds2 = _load(folder_data, "test.nc")
    mt.apply(score_ds2, ["lowres", "tide_3d"], "prediction")
    np.testing.assert_allclose(
        np.asarray(score_ds["prediction"].values),
        np.asarray(score_ds2["prediction"].values),
        rtol=1e-5,
        atol=1e-5,
    )


def test_unet_print_format_scrapeable(small_circle, capsys):
    """hypar_optim.py:82 scrapes 'test_mse: <v>' from stdout — load-bearing."""
    import re

    train_ds = _load(small_circle, "train.nc")
    test_ds = _load(small_circle, "test.nc")
    mt = UNET(
        batch_size=6, nr_epochs=2, test_interval=2, encoded_dim_size=4, fc_size=16
    )
    mt.train(["lowres"], "hires", train_ds, test_ds)
    out = capsys.readouterr().out
    matches = re.findall(r"test_mse: ([0-9.e+-]+)", out)
    assert matches, out
    float(matches[-1])
    assert "learn rate:" in out


def test_unet_nonsquare_geometry(tmp_path_factory):
    """Non-square input AND output (BASELINE config 4; circle2-style
    geometry scaled down): solver emits (ky, kx) tuple kernels and the UNet
    must train/apply through them."""
    root = str(tmp_path_factory.mktemp("nsq"))
    rng = np.random.default_rng(17)
    n = 8
    hi = 288.0 + rng.random((n, 1, 56, 48)).astype(np.float32) * 5.0
    lo = hi.reshape(n, 1, 14, 4, 12, 4).mean(axis=(3, 5))  # 14x12 input
    for name in ("train.nc", "test.nc"):
        ds = xr.Dataset()
        ds["hires"] = xr.DataArray(hi, dims=("n", "chan", "y2", "x2"))
        ds["lowres"] = xr.DataArray(lo, dims=("n", "chan", "y1", "x1"))
        ds.to_netcdf(os.path.join(root, name))

    train_ds = _load(root, "train.nc")
    test_ds = _load(root, "test.nc")
    mt = UNET(batch_size=4, nr_epochs=2, test_interval=2, encoded_dim_size=4, fc_size=8)
    folder = str(tmp_path_factory.mktemp("nsqm") / "m")
    mt.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    assert np.isfinite(mt.history["train_loss"][-1])

    mt2 = load_model(folder)
    score = _load(root, "test.nc")
    mt2.apply(score, ["lowres"], "prediction")
    assert score["prediction"].shape == (8, 1, 56, 48)
