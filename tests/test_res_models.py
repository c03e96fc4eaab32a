"""Lifecycle tests for the residual model variants (srcnn_res, unet_res,
resunet_gan)."""

import json
import os

import numpy as np
import pytest

from cae_tools_tpu.cli import apply_cae, train_cae
from cae_tools_tpu.models import ResUNetGAN, SRCNNRes, UNETRes, load_model
from cae_tools_tpu.xrcompat import xr


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    """Small 8x8 -> 32x32 synthetic pair (SRCNN convs at 256^2 are too slow
    on the single-core CPU test host)."""
    root = str(tmp_path_factory.mktemp("resdata"))
    rng = np.random.default_rng(31)
    for name in ("train.nc", "test.nc"):
        n = 12
        hi = 288.0 + rng.random((n, 1, 32, 32)).astype(np.float32) * 5.0
        lo = hi.reshape(n, 1, 8, 4, 8, 4).mean(axis=(3, 5))
        ds = xr.Dataset()
        ds["hires"] = xr.DataArray(hi, dims=("n", "chan", "y2", "x2"))
        ds["lowres"] = xr.DataArray(lo, dims=("n", "chan", "y1", "x1"))
        ds.to_netcdf(os.path.join(root, name))
    return root


def _load(folder, name):
    return xr.open_dataset(os.path.join(folder, name))


def test_srcnn_res_lifecycle(data, tmp_path):
    train_ds = _load(data, "train.nc")
    test_ds = _load(data, "test.nc")
    folder = str(tmp_path / "srcnn")
    mt = SRCNNRes(batch_size=6, nr_epochs=6, test_interval=3, lr=0.003, n1=8, n2=4)
    mt.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    # residual start: initial output ~ upsampled base, so the normalised
    # loss is bounded from the first epoch (target here is iid noise, so
    # exact monotone descent is not expected)
    assert all(np.isfinite(v) and v < 1.0 for v in mt.history["train_loss"])

    mt2 = load_model(folder)
    assert isinstance(mt2, SRCNNRes)
    score = _load(data, "test.nc")
    mt2.apply(score, ["lowres"], "prediction")
    assert score["prediction"].shape == (12, 1, 32, 32)
    # residual base keeps outputs in a physical range
    mean = float(np.asarray(score["prediction"].values).mean())
    assert 280 < mean < 300

    score2 = _load(data, "test.nc")
    mt.apply(score2, ["lowres"], "prediction")
    np.testing.assert_allclose(
        np.asarray(score["prediction"].values),
        np.asarray(score2["prediction"].values),
        rtol=1e-5, atol=1e-5,
    )


def test_unet_res_lifecycle(data, tmp_path):
    train_ds = _load(data, "train.nc")
    test_ds = _load(data, "test.nc")
    folder = str(tmp_path / "unetres")
    mt = UNETRes(
        batch_size=6, nr_epochs=4, test_interval=2,
        encoded_dim_size=4, fc_size=16,
    )
    mt.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    params = json.loads(open(os.path.join(folder, "parameters.json")).read())
    assert params["type"] == "UNETRes"
    assert os.path.exists(os.path.join(folder, "residual.weights"))

    mt2 = load_model(folder)
    assert isinstance(mt2, UNETRes)
    score = _load(data, "test.nc")
    mt2.apply(score, ["lowres"], "prediction")
    score2 = _load(data, "test.nc")
    mt.apply(score2, ["lowres"], "prediction")
    np.testing.assert_allclose(
        np.asarray(score["prediction"].values),
        np.asarray(score2["prediction"].values),
        rtol=1e-5, atol=1e-5,
    )


def test_resunet_gan_lifecycle(data, tmp_path):
    train_ds = _load(data, "train.nc")
    test_ds = _load(data, "test.nc")
    folder = str(tmp_path / "resunetgan")
    mt = ResUNetGAN(
        batch_size=6, nr_epochs=4, test_interval=2,
        encoded_dim_size=4, fc_size=16,
        lambda_adv=1e-3, lambda_gp=10.0, n_critic=2,
    )
    mt.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    # the recorded test loss is the content loss (masked MSE + Pearson),
    # not the moving adversarial target — must stay finite and bounded
    assert all(np.isfinite(v) for v in mt.history["train_loss"])
    assert all(np.isfinite(v) and v < 10.0 for v in mt.history["test_loss"])
    params = json.loads(open(os.path.join(folder, "parameters.json")).read())
    assert params["type"] == "ResUNetGAN"
    assert params["n_critic"] == 2
    assert os.path.exists(os.path.join(folder, "disc.weights"))
    assert os.path.exists(os.path.join(folder, "residual.weights"))

    mt2 = load_model(folder)
    assert isinstance(mt2, ResUNetGAN)
    # critic round-trips exactly (needed for --continue-training)
    np.testing.assert_array_equal(
        np.asarray(mt.params["disc"]["head"]["w"]),
        np.asarray(mt2.params["disc"]["head"]["w"]),
    )
    score = _load(data, "test.nc")
    mt2.apply(score, ["lowres"], "prediction")
    assert score["prediction"].shape == (12, 1, 32, 32)
    score2 = _load(data, "test.nc")
    mt.apply(score2, ["lowres"], "prediction")
    np.testing.assert_allclose(
        np.asarray(score["prediction"].values),
        np.asarray(score2["prediction"].values),
        rtol=1e-5, atol=1e-5,
    )


def test_resunet_gan_continue_training(data, tmp_path):
    """--continue-training resumes BOTH players from disc.weights."""
    folder = str(tmp_path / "gan_ct")
    args = [
        "--train-inputs", os.path.join(data, "train.nc"),
        "--test-inputs", os.path.join(data, "test.nc"),
        "--model-folder", folder,
        "--input-variables", "lowres",
        "--output-variable", "hires",
        "--nr-epochs", "2",
        "--batch-size", "6",
        "--latent-size", "4",
        "--fc-size", "16",
        "--method", "resunet_gan",
    ]
    train_cae.main(args)
    disc_before = load_model(folder).params["disc"]["head"]["w"]
    train_cae.main(args + ["--continue-training"])
    history = json.loads(open(os.path.join(folder, "history.json")).read())
    assert history["nr_epochs"] == 4
    disc_after = load_model(folder).params["disc"]["head"]["w"]
    # the critic kept training in the second run
    assert not np.allclose(np.asarray(disc_before), np.asarray(disc_after))


def test_resunet_gan_evaluator_dispatch(data, tmp_path):
    """ModelEvaluator loads a ResUNetGAN folder via the type registry and
    renders the full report incl. the case browser."""
    from cae_tools_tpu.models.evaluator import ModelEvaluator

    train_ds = _load(data, "train.nc")
    test_ds = _load(data, "test.nc")
    folder = str(tmp_path / "gan_eval")
    mt = ResUNetGAN(batch_size=6, nr_epochs=2, test_interval=1,
                    encoded_dim_size=4, fc_size=16)
    mt.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)

    html_folder = str(tmp_path / "html")
    ev = ModelEvaluator(
        training_paths=[os.path.join(data, "train.nc")],
        testing_paths=[os.path.join(data, "test.nc")],
        output_html_folder=html_folder,
        model_output_variable="model_output",
        model_path=folder,
        sample_count=3,
    )
    assert isinstance(ev.model, ResUNetGAN)
    ev.run()
    html = open(os.path.join(html_folder, "index.html")).read()
    assert "Model Metrics" in html
    case_html = open(os.path.join(html_folder, "test", "index.html")).read()
    assert "case 2" in case_html and "case 3" not in case_html  # sample_count


def test_cli_res_methods(data, tmp_path):
    for method, type_name in [
        ("srcnn_res", "SRCNNRes"),
        ("unet_res", "UNETRes"),
        ("resunet_gan", "ResUNetGAN"),
    ]:
        model_folder = str(tmp_path / f"m_{method}")
        train_cae.main(
            [
                "--train-inputs", os.path.join(data, "train.nc"),
                "--test-inputs", os.path.join(data, "test.nc"),
                "--model-folder", model_folder,
                "--input-variables", "lowres",
                "--output-variable", "hires",
                "--nr-epochs", "2",
                "--batch-size", "6",
                "--latent-size", "4",
                "--fc-size", "16",
                "--method", method,
            ]
        )
        params = json.loads(
            open(os.path.join(model_folder, "parameters.json")).read()
        )
        assert params["type"] == type_name
        out = str(tmp_path / f"scored_{method}.nc")
        apply_cae.main(
            [os.path.join(data, "test.nc"), out, "--model-folder", model_folder]
        )
        assert os.path.exists(out)
