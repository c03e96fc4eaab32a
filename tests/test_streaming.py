"""Streaming (host->device double-buffered) training path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cae_tools_tpu.nn import modules as M
from cae_tools_tpu.train.loop import TrainConfig
from cae_tools_tpu.train.stream import StreamingTrainer, pick_trainer, data_nbytes


def _linear_loss(lin):
    def loss_fn(params, state, rng, batch, train):
        out, _ = lin.apply(params, state, batch["x"], train)
        per = jnp.mean((out - batch["y"]) ** 2, axis=(1, 2, 3))
        w = batch["w"]
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0), ({}, {})

    return loss_fn


def test_streaming_trainer_converges():
    rng = np.random.default_rng(0)
    x = rng.random((20, 4, 4, 1), dtype=np.float32)
    y = np.tile(x.mean(axis=(1, 2, 3))[:, None, None, None], (1, 8, 8, 1)).astype(
        np.float32
    )
    lin = M.LinearMap((1, 4, 4), (1, 8, 8))
    params, state = lin.init(jax.random.PRNGKey(0))
    cfg = TrainConfig(batch_size=8, nr_epochs=12, test_interval=4, lr=0.05, seed=1)
    tr = StreamingTrainer(_linear_loss(lin), cfg)
    hist = {"train_loss": [], "test_loss": [], "nr_epochs": 0}
    p, s, tl, te = tr.fit(params, state, {"x": x, "y": y}, {"x": x, "y": y}, hist)
    assert len(hist["train_loss"]) == 3  # epochs 0, 4, 8
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert tr.meter.total_images == 12 * 20


def test_pick_trainer_thresholds():
    from cae_tools_tpu.train.loop import Trainer

    small = {"x": np.zeros((4, 2, 2, 1), np.float32)}
    t1 = pick_trainer(None, TrainConfig(), data_bytes=data_nbytes(small))
    assert type(t1) is Trainer
    t2 = pick_trainer(None, TrainConfig(), data_bytes=8 << 30)
    assert isinstance(t2, StreamingTrainer)
    t3 = pick_trainer(None, TrainConfig(), data_bytes=0, force="streaming")
    assert isinstance(t3, StreamingTrainer)


def test_model_streaming_flag(tmp_path_factory):
    from cae_tools_tpu.data.datagen import generate_spec_files
    from cae_tools_tpu.models import LinearModel
    from cae_tools_tpu.xrcompat import xr

    root = str(tmp_path_factory.mktemp("stream"))
    folder = generate_spec_files("circle", root, n=12, seed=13)
    train_ds = xr.open_dataset(folder + "/train.nc")
    test_ds = xr.open_dataset(folder + "/test.nc")
    mt = LinearModel(batch_size=6, nr_epochs=4, test_interval=2, lr=0.05)
    mt.streaming = True
    mt.train(["lowres"], "hires", train_ds, test_ds)
    assert len(mt.history["train_loss"]) == 2
    assert np.isfinite(mt.history["train_loss"][-1])


def test_trainer_reuses_compiled_graphs_across_fits():
    """Repeat fits with the same data geometry must not re-trace (the
    compiled run_epochs/eval_loss live on the Trainer, keyed by geometry) —
    continue-training and HPO trials depend on this to skip recompiles."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cae_tools_tpu.train.loop import TrainConfig, Trainer

    traces = {"n": 0}

    def loss_fn(params, state, rng, batch, train):
        traces["n"] += 1  # python side effect: counts tracings only
        pred = batch["x"] * params["w"]
        w = batch["w"]
        loss = jnp.sum((pred - batch["y"]) ** 2 * w[:, None]) / jnp.sum(w)
        return loss, (state, {"mse": loss})

    rng = np.random.default_rng(0)
    data = {"x": rng.random((12, 3), dtype=np.float32),
            "y": rng.random((12, 3), dtype=np.float32)}
    params = {"w": jnp.ones((3,), jnp.float32)}
    cfg = TrainConfig(batch_size=4, nr_epochs=4, test_interval=2, lr=0.05)
    tr = Trainer(loss_fn, cfg)
    hist = {"train_loss": [], "test_loss": [], "nr_epochs": 0}
    tr.fit(params, {}, data, data, hist)
    first = traces["n"]
    assert first > 0
    tr.fit(params, {}, data, data, hist)
    assert traces["n"] == first  # no new tracing on the second fit
    # a different geometry compiles fresh graphs (new cache entry)
    data2 = {k: v[:8] for k, v in data.items()}
    tr.fit(params, {}, data2, data2, hist)
    assert traces["n"] > first
    assert len(tr._compiled) == 2


def test_streaming_trainer_with_fused_tail_loss():
    """The fused Pallas train loss runs through the streaming (per-batch
    jitted step) path too — trainers share one loss_fn contract."""
    import os

    from cae_tools_tpu.models.conv_ae_model import ConvAEModel
    from cae_tools_tpu.models.sizer import create_model_spec
    from cae_tools_tpu.ops import convops

    convops.set_precision("highest")
    os.environ["CAE_TPU_FUSED_TRAIN_TAIL"] = "1"
    try:
        mt = ConvAEModel(encoded_dim_size=8, fc_size=16)
        mt.spec = create_model_spec(
            input_size=(16, 16), input_channels=1,
            output_size=(64, 64), output_channels=1,
        )
        mt._build_modules()
        mt._init_params(jax.random.PRNGKey(0))
        assert mt._use_fused_train_tail()
        loss_fn = mt._make_loss_fn()
        rng = np.random.default_rng(3)
        x = rng.random((12, 16, 16, 1), dtype=np.float32)
        y = rng.random((12, 64, 64, 1), dtype=np.float32)
        cfg = TrainConfig(batch_size=4, nr_epochs=4, test_interval=2,
                          lr=1e-3, optimizer="adam_l2")
        tr = StreamingTrainer(loss_fn, cfg)
        hist = {"train_loss": [], "test_loss": [], "nr_epochs": 0}
        _, _, tl, te = tr.fit(
            mt.params, mt.state, {"x": x, "y": y}, {"x": x, "y": y}, hist
        )
        assert np.isfinite(tl) and np.isfinite(te)
    finally:
        del os.environ["CAE_TPU_FUSED_TRAIN_TAIL"]
        convops.set_precision("high")
