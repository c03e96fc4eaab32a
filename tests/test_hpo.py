"""HPO driver: in-process trials with the fallback sampler (optuna absent)."""

import json
import os

import numpy as np
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


def test_vmap_trials_mesh_parallel(data):
    """BASELINE config 5: trials vmapped + sharded across the data mesh."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cae_tools_tpu.hpo.vmap_search import vmap_trials
    from cae_tools_tpu.nn import modules as M
    from cae_tools_tpu.parallel.mesh import get_mesh
    from cae_tools_tpu.xrcompat import xr

    ds = xr.open_dataset(os.path.join(data, "train.nc"))
    from cae_tools_tpu.data.dataset import ArrayDataset

    ads = ArrayDataset(ds, ["lowres"], "hires")
    x, y, _ = ads.arrays_nhwc()

    lin = M.LinearMap((1, 16, 16), (1, 256, 256))

    def loss_fn(params, state, rng, batch, train):
        out, _ = lin.apply(params, state, batch["x"], train)
        per = jnp.mean((out - batch["y"]) ** 2, axis=(1, 2, 3))
        w = batch["w"]
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0), ({}, {})

    # 7 trials on an 8-device mesh: exercises the trial-axis padding
    lrs = [1e-4, 1e-3, 1e-2, 5e-2, 1e-1, 2e-1, 1e-5]
    wds = [1e-5] * 7
    losses, params_stack, _ = vmap_trials(
        loss_fn,
        lambda r: lin.init(r),
        {"x": x, "y": y},
        {"x": x, "y": y},
        lrs,
        wds,
        batch_size=5,
        nr_epochs=8,
        mesh=get_mesh(n_data=8, n_model=1),
        optimizer="adam_l2",  # matches LinearModel's training optimizer
    )
    assert losses.shape == (7,)
    assert np.isfinite(losses).all()
    # the sensible learning rates must beat the degenerate ones
    assert min(losses[1], losses[3]) < losses[6]
    # per-trial params are independent (stacked on the trials axis)
    w_stack = np.asarray(params_stack["fc"]["w"])
    assert w_stack.shape[0] == 7
    assert not np.allclose(w_stack[0], w_stack[1])


def test_hpo_subprocess_mode(data, tmp_path):
    """Reference-parity mode: trials shell out to train_cae and scrape the
    test loss from stdout (hypar_optim.py:47-89 behavior)."""
    space = {
        "method": ("fixed", "linear"),
        "nr_epochs": ("fixed", 2),
        "batch_size": ("fixed", 6),
        "learning_rate": ("fixed", 0.05),
    }
    opt = HyperOptimizer(
        train_inputs=[os.path.join(data, "train.nc")],
        test_inputs=[os.path.join(data, "test.nc")],
        input_variables=["lowres"],
        output_variable="hires",
        work_folder=str(tmp_path / "trials"),
        search_space=space,
        mode="subprocess",
        seed=1,
    )
    best_params, best_value, results = opt.run(n_trials=1)
    assert best_value is not None and np.isfinite(best_value)
    assert os.path.exists(str(tmp_path / "trials" / "trial_0" / "parameters.json"))
