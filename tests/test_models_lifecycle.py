"""Full-lifecycle tests: train -> summary -> save -> fresh-load -> apply ->
netCDF roundtrip, with assertions on metrics and checkpoint format
(assertive version of reference ``test/unittests/quick_cae.py`` /
``quick_linear.py`` per SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

from cae_tools_tpu.data.dataset import ArrayDataset
from cae_tools_tpu.models.conv_ae_model import ConvAEModel
from cae_tools_tpu.models.linear_model import LinearModel
from cae_tools_tpu.xrcompat import xr

CHECKPOINT_FILES_COMMON = [
    "normalisation.weights",
    "parameters.json",
    "history.json",
    "summary.txt",
    "input_spec.json",
    "output_spec.json",
]


@pytest.fixture(scope="module")
def small_circle(circle_data):
    return circle_data


def _load(folder, name):
    return xr.open_dataset(os.path.join(folder, name))


def test_linear_lifecycle(small_circle, tmp_path):
    train_ds = _load(small_circle, "train.nc")
    test_ds = _load(small_circle, "test.nc")

    mt = LinearModel(batch_size=6, nr_epochs=30, test_interval=10, lr=0.05)
    mt.train(["lowres"], "hires", train_ds, test_ds)

    assert mt.summary().startswith("Model Summary:")
    assert len(mt.history["train_loss"]) == 3  # epochs 0, 10, 20
    assert mt.history["nr_epochs"] == 30
    # training reduces loss on this easy fixture
    assert mt.history["train_loss"][-1] < mt.history["train_loss"][0]

    folder = str(tmp_path / "linear_model")
    mt.save(folder)
    for f in CHECKPOINT_FILES_COMMON + ["weights"]:
        assert os.path.exists(os.path.join(folder, f)), f
    params = json.loads(open(os.path.join(folder, "parameters.json")).read())
    assert params["type"] == "LinearModel"
    assert params["input_shape"] == [1, 16, 16]
    assert params["output_shape"] == [1, 256, 256]

    # fresh instance load -> identical predictions
    mt2 = LinearModel()
    mt2.load(folder)
    assert mt2.get_model_id() == mt.get_model_id()
    assert mt2.get_input_variable_names() == ["lowres"]

    score_ds = _load(small_circle, "test.nc")
    mt2.apply(score_ds, ["lowres"], "prediction")
    pred = score_ds["prediction"]
    assert pred.shape == (12, 1, 256, 256)
    assert pred.dims[1:] == (
        "model_output_channel",
        "model_output_y",
        "model_output_x",
    )
    # prediction is in denormalised (kelvin-like) units
    assert 270 < float(np.asarray(pred.values).mean()) < 310

    # netCDF round-trip of the scored dataset
    out_path = str(tmp_path / "scored.nc")
    score_ds.to_netcdf(out_path)
    back = xr.open_dataset(out_path)
    np.testing.assert_allclose(
        np.asarray(back["prediction"].values), np.asarray(pred.values), rtol=1e-6
    )

    # same model applied twice -> identical output (determinism)
    score_ds2 = _load(small_circle, "test.nc")
    mt.apply(score_ds2, ["lowres"], "prediction")
    np.testing.assert_allclose(
        np.asarray(score_ds2["prediction"].values),
        np.asarray(pred.values),
        rtol=1e-5,
    )


def test_linear_evaluate_metrics(small_circle):
    train_ds = _load(small_circle, "train.nc")
    test_ds = _load(small_circle, "test.nc")
    mt = LinearModel(batch_size=6, nr_epochs=60, test_interval=20, lr=0.05)
    mt.train(["lowres"], "hires", train_ds, test_ds)
    ads = ArrayDataset(test_ds, ["lowres"], "hires", normalise_out=False)
    ads.set_normalisation_parameters(mt.normalisation_parameters)
    metrics = mt.evaluate(ads)
    assert set(metrics.keys()) == {"mse", "rmse", "mae", "mean_pearson_correlation"}
    assert metrics["rmse"] == pytest.approx(np.sqrt(metrics["mse"]), rel=1e-6)
    # linear baseline on the circle fixture should fit reasonably
    assert metrics["mse"] < 2.0
    assert metrics["mean_pearson_correlation"] > 0.5


def test_conv_ae_lifecycle(small_circle, tmp_path):
    train_ds = _load(small_circle, "train.nc")
    test_ds = _load(small_circle, "test.nc")

    mt = ConvAEModel(
        batch_size=6,
        nr_epochs=12,
        test_interval=5,
        encoded_dim_size=4,
        fc_size=16,
        lr=0.002,
    )
    mt.train(["lowres"], "hires", train_ds, test_ds)
    assert len(mt.history["train_loss"]) == 3  # epochs 0, 5, 10
    assert "Latent Vector" in mt.summary()

    folder = str(tmp_path / "conv_model")
    mt.save(folder)
    for f in CHECKPOINT_FILES_COMMON + ["encoder.weights", "decoder.weights", "spec.json"]:
        assert os.path.exists(os.path.join(folder, f)), f

    params = json.loads(open(os.path.join(folder, "parameters.json")).read())
    assert params["type"] == "ConvAEModel"
    assert params["encoded_dim_size"] == 4

    mt2 = ConvAEModel()
    mt2.load(folder)
    score_ds = _load(small_circle, "test.nc")
    mt2.apply(score_ds, ["lowres"], "prediction")
    assert score_ds["prediction"].shape == (12, 1, 256, 256)

    # loaded model reproduces the saving model's outputs exactly
    score_ds2 = _load(small_circle, "test.nc")
    mt.apply(score_ds2, ["lowres"], "prediction")
    np.testing.assert_allclose(
        np.asarray(score_ds["prediction"].values),
        np.asarray(score_ds2["prediction"].values),
        rtol=1e-5,
        atol=1e-5,
    )


def test_conv_ae_continue_training(small_circle, tmp_path):
    train_ds = _load(small_circle, "train.nc")
    test_ds = _load(small_circle, "test.nc")
    folder = str(tmp_path / "cont_model")

    mt = ConvAEModel(
        batch_size=6, nr_epochs=6, test_interval=3, encoded_dim_size=4, fc_size=16
    )
    mt.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    first_len = len(mt.history["train_loss"])
    assert mt.history["nr_epochs"] == 6

    # reload and continue: history accumulates (cli/train_cae.py:111-125 path)
    mt2 = ConvAEModel()
    mt2.load(folder)
    mt2.nr_epochs = 6
    mt2.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    assert mt2.history["nr_epochs"] == 12
    assert len(mt2.history["train_loss"]) == 2 * first_len


def test_database_tracking(small_circle, tmp_path):
    import sqlite3

    db_path = str(tmp_path / "models.db")
    train_ds = _load(small_circle, "train.nc")
    test_ds = _load(small_circle, "test.nc")
    mt = LinearModel(batch_size=6, nr_epochs=4, test_interval=2, database_path=db_path)
    mt.train(
        ["lowres"], "hires", train_ds, test_ds,
        training_paths="train.nc", testing_paths="test.nc",
    )
    conn = sqlite3.connect(db_path)
    rows = conn.execute("SELECT model_id, model_type, train_path, test_path FROM MODEL_TRAINING").fetchall()
    assert len(rows) == 1
    assert rows[0][0] == mt.get_model_id()
    assert rows[0][1] == "Linear"
    assert rows[0][3] == "test.nc"
    evals = conn.execute("SELECT metrics FROM MODEL_EVALUATIONS").fetchall()
    assert len(evals) == 1
    metrics = json.loads(evals[0][0])
    assert "test" in metrics and "mse" in metrics["test"]


def test_apply_chunk_size_is_output_invariant(small_circle):
    """The apply lax.map chunk is a pure performance knob: predictions
    must be identical whatever the per-dispatch batch (incl. the padded
    last chunk), and the auto default must equal an explicit setting."""
    train_ds = _load(small_circle, "train.nc")
    test_ds = _load(small_circle, "test.nc")
    mt = LinearModel(batch_size=6, nr_epochs=4, test_interval=2, lr=0.05)
    mt.train(["lowres"], "hires", train_ds, test_ds)

    x = np.random.default_rng(0).random((11, 16, 16, 1)).astype(np.float32)
    ref = mt._predict_normalised(x)  # auto (CPU: batch_size=6, padded)
    for cs in (1, 3, 11, 64):
        mt.apply_chunk_size = cs
        mt._apply_cache = {}
        out = mt._predict_normalised(x)
        # different chunk -> different matmul tiling -> f32 rounding only
        np.testing.assert_allclose(out, ref, atol=1e-5, err_msg=f"cs={cs}")
    mt.apply_chunk_size = None
