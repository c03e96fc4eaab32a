"""HPO driver: in-process trials with the fallback sampler (optuna absent)."""

import json
import os

import pytest

from cae_tools_tpu.hpo import HyperOptimizer


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    from cae_tools_tpu.data.datagen import generate_spec_files

    root = str(tmp_path_factory.mktemp("hpodata"))
    return generate_spec_files("circle", root, n=10, seed=11)


def test_hpo_inproc_linear(data, tmp_path):
    space = {
        "method": ("fixed", "linear"),
        "nr_epochs": ("fixed", 4),
        "batch_size": ("fixed", 5),
        "learning_rate": ("loguniform", 1e-3, 1e-1),
        "weight_decay": ("fixed", 1e-5),
    }
    log_path = str(tmp_path / "hpo.jsonl")
    opt = HyperOptimizer(
        train_inputs=[os.path.join(data, "train.nc")],
        test_inputs=[os.path.join(data, "test.nc")],
        input_variables=["lowres"],
        output_variable="hires",
        work_folder=str(tmp_path / "trials"),
        search_space=space,
        seed=3,
        log_path=log_path,
    )
    best_params, best_value, results = opt.run(n_trials=3)
    assert len(results) == 3
    assert best_value is not None and best_value > 0
    assert "learning_rate" in best_params
    # per-trial model folders + JSON log written
    assert os.path.exists(str(tmp_path / "trials" / "trial_0"))
    lines = [json.loads(l) for l in open(log_path)]
    assert len(lines) == 3
    assert all("test_mse" in l for l in lines)


def test_hpo_prunes_failures(tmp_path, data):
    space = {
        "method": ("fixed", "linear"),
        "nr_epochs": ("fixed", 2),
        "batch_size": ("fixed", 5),
    }
    opt = HyperOptimizer(
        train_inputs=[os.path.join(data, "train.nc")],
        test_inputs=[os.path.join(data, "test.nc")],
        input_variables=["does_not_exist"],
        output_variable="hires",
        work_folder=str(tmp_path / "trials"),
        search_space=space,
    )
    best_params, best_value, results = opt.run(n_trials=2)
    assert best_params is None
    assert all(r.get("pruned") for r in results)
