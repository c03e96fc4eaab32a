"""ModelEvaluator details: converter config, measures, partial partitions."""

import json
import os

import numpy as np
import pytest

from cae_tools_tpu.cli import train_cae
from cae_tools_tpu.models.evaluator import ModelEvaluator
from cae_tools_tpu.xrcompat import xr


@pytest.fixture(scope="module")
def trained(circle_data, tmp_path_factory):
    folder = str(tmp_path_factory.mktemp("ev") / "model")
    train_cae.main(
        [
            "--train-inputs", os.path.join(circle_data, "train.nc"),
            "--test-inputs", os.path.join(circle_data, "test.nc"),
            "--model-folder", folder,
            "--input-variables", "lowres",
            "--output-variable", "hires",
            "--nr-epochs", "2",
            "--batch-size", "6",
            "--method", "linear",
        ]
    )
    return folder


def test_evaluator_test_only_partition(circle_data, trained, tmp_path):
    """Evaluation with no training files (train partition optional)."""
    html_folder = str(tmp_path / "html")
    ev = ModelEvaluator(
        training_paths=None,
        testing_paths=[os.path.join(circle_data, "test.nc")],
        output_html_folder=html_folder,
        model_path=trained,
        model_output_variable="model_output",
    )
    ev.run()
    html = open(os.path.join(html_folder, "index.html")).read()
    assert "Test Metrics" in html
    assert "Train Metrics" not in html


def test_evaluator_converter_config(circle_data, trained):
    ev = ModelEvaluator(
        training_paths=[os.path.join(circle_data, "train.nc")],
        testing_paths=[os.path.join(circle_data, "test.nc")],
        model_path=trained,
        model_output_variable="model_output",
        input_variables=["lowres"],
        x_coordinate="x",
        y_coordinate="y",
        time_coordinate="time",
    )
    train_ds = xr.open_dataset(os.path.join(circle_data, "train.nc"))
    ev.model.apply(train_ds, ["lowres"], "model_output")
    config = ev._converter_config(train_ds, None, "n")
    assert config["coordinates"] == {"x": "x", "y": "y", "time": "time"}
    layers = config["layers"]
    assert set(layers.keys()) == {"lowres", "hires", "model_output"}
    # target layers share a common min/max across actual+predicted
    assert layers["hires"]["min_value"] == layers["model_output"]["min_value"]
    assert layers["lowres"]["cmap"] == "coolwarm"
    assert layers["lowres"]["min_value"] < layers["lowres"]["max_value"]


def test_evaluator_rejects_unknown_input_variable(circle_data, trained):
    with pytest.raises(Exception):
        ModelEvaluator(
            training_paths=[os.path.join(circle_data, "train.nc")],
            testing_paths=[os.path.join(circle_data, "test.nc")],
            model_path=trained,
            model_output_variable="model_output",
            input_variables=["not_a_model_input"],
        )


def test_evaluator_compute_measures(circle_data, trained):
    ev = ModelEvaluator(
        training_paths=[os.path.join(circle_data, "train.nc")],
        testing_paths=[os.path.join(circle_data, "test.nc")],
        model_path=trained,
        model_output_variable="model_output",
    )
    ds = xr.open_dataset(os.path.join(circle_data, "test.nc"))
    ev.model.apply(ds, ["lowres"], "model_output")
    mae = ev.compute_measure(ds, 0, "mae")
    mse = ev.compute_measure(ds, 0, "mse")
    pred = np.asarray(ds["model_output"].values)[0, 0]
    act = np.asarray(ds["hires"].values)[0, 0]
    assert mae == pytest.approx(float(np.mean(np.abs(pred - act))), rel=1e-6)
    assert mse == pytest.approx(float(np.mean((pred - act) ** 2)), rel=1e-6)
    with pytest.raises(ValueError):
        ev.compute_measure(ds, 0, "rmse")
