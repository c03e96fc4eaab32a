"""Orbax sharded checkpoint save/restore round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cae_tools_tpu.train.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)


def test_orbax_roundtrip(tmp_path):
    folder = str(tmp_path / "model")
    params = {
        "w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "convs": [{"k": jnp.ones((2, 2))}],
    }
    state = {"bn": {"mean": jnp.zeros((4,)), "count": jnp.asarray(3, jnp.int32)}}
    save_checkpoint(folder, 10, params, state)
    save_checkpoint(folder, 20, jax.tree_util.tree_map(lambda a: a + 1, params), state)
    assert latest_step(folder) == 20

    restored = restore_checkpoint(folder)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]), np.asarray(params["w"]) + 1
    )
    restored10 = restore_checkpoint(folder, step=10)
    np.testing.assert_allclose(
        np.asarray(restored10["params"]["w"]), np.asarray(params["w"])
    )
    assert int(restored["state"]["bn"]["count"]) == 3


def test_orbax_sharded_roundtrip(tmp_path):
    from cae_tools_tpu.parallel.mesh import get_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = get_mesh(n_data=4, n_model=2)
    folder = str(tmp_path / "sharded")
    w = jax.device_put(
        np.arange(8 * 256, dtype=np.float32).reshape(8, 256),
        NamedSharding(mesh, P(None, "model")),
    )
    save_checkpoint(folder, 1, {"w": w}, {})
    template = {"params": {"w": w}, "state": {}}
    restored = restore_checkpoint(folder, template=template)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), np.asarray(w))
    # restored array keeps the template's sharding
    assert restored["params"]["w"].sharding.spec == P(None, "model")


def _tiny_loss_fn():
    def loss_fn(params, state, rng, batch, train):
        pred = batch["x"] @ params["w"] + params["b"]
        per = jnp.mean((pred - batch["y"]) ** 2, axis=1)
        w = batch["w"]
        loss = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, (state, {})

    return loss_fn


def _tiny_data(n=16, d=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    true_w = rng.normal(size=(d, d)).astype(np.float32)
    y = x @ true_w + 0.01 * rng.normal(size=(n, d)).astype(np.float32)
    return {"x": x, "y": y}


def test_trainer_periodic_checkpoint_and_exact_resume(tmp_path):
    """Kill-and-resume: a run checkpointed every 2 epochs, resumed into a
    fresh Trainer, continues the trajectory (params AND Adam moments come
    from the snapshot, not from scratch) and keeps a monotonic step count."""
    from cae_tools_tpu.train.loop import TrainConfig, Trainer

    folder = str(tmp_path / "model")
    data = _tiny_data()
    params = {
        "w": jnp.zeros((4, 4), jnp.float32),
        "b": jnp.zeros((4,), jnp.float32),
    }
    cfg = TrainConfig(batch_size=8, nr_epochs=6, test_interval=2, lr=0.05)

    t1 = Trainer(_tiny_loss_fn(), cfg)
    t1.checkpoint_folder = folder
    t1.checkpoint_interval = 2
    hist1 = {"train_loss": [], "test_loss": []}
    p1, s1, _, last_test_1 = t1.fit(params, {}, data, data, hist1)

    # snapshots exist; the final one equals the returned weights and
    # carries non-zero Adam moments
    assert latest_step(folder) == 6
    snap = restore_checkpoint(folder)
    np.testing.assert_allclose(
        np.asarray(snap["params"]["w"]), np.asarray(p1["w"]), rtol=1e-6
    )
    mu_leaves = jax.tree_util.tree_leaves(snap["opt_state"])
    assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in mu_leaves)

    # fresh trainer resumes: step count continues, loss keeps improving
    t2 = Trainer(_tiny_loss_fn(), cfg)
    t2.checkpoint_folder = folder
    t2.checkpoint_interval = 2
    t2.resume = True
    hist2 = {"train_loss": [], "test_loss": []}
    p2, s2, _, last_test_2 = t2.fit(params, {}, data, data, hist2)
    assert latest_step(folder) == 12  # 6 (resumed base) + 6 more
    assert last_test_2 < last_test_1  # trajectory continued, not restarted
    # resume overrode the fresh `params` argument with the snapshot
    assert float(np.abs(np.asarray(p2["w"])).max()) > 0


def test_plateau_lr_survives_resume(tmp_path):
    """Resuming a plateau-schedule run must carry the snapshot's decayed
    learning rate into the host-side tracker — a stale tracker (cfg.lr)
    would make the next plateau trip JUMP the live LR back up instead of
    decaying it."""
    from cae_tools_tpu.train.loop import TrainConfig, Trainer

    folder = str(tmp_path / "model")
    data = _tiny_data()
    params = {
        "w": jnp.zeros((4, 4), jnp.float32),
        "b": jnp.zeros((4,), jnp.float32),
    }
    # patience 0 + threshold 1.0: "improved" is impossible, so the LR
    # decays by plateau_factor at every test interval
    cfg1 = TrainConfig(
        batch_size=8, nr_epochs=2, test_interval=1, lr=1e-3,
        schedule="plateau", plateau_patience=0, plateau_threshold=1.0,
        plateau_factor=0.1,
    )
    t1 = Trainer(_tiny_loss_fn(), cfg1)
    t1.checkpoint_folder = folder
    t1.checkpoint_interval = 1
    t1.fit(params, {}, data, data, {"train_loss": [], "test_loss": []})
    assert t1._current_lr == pytest.approx(1e-5)  # two decays
    snap = restore_checkpoint(folder)
    # template-less restore flattens the InjectHyperparamsState namedtuple
    # to dicts (the product resume path restores WITH a template)
    snap_lr = float(
        np.asarray(snap["opt_state"]["hyperparams"]["learning_rate"])
    )
    assert snap_lr == pytest.approx(1e-5)

    # resume with a patient config: no further decay; the tracker must
    # equal the snapshot's LR, not cfg.lr
    cfg2 = TrainConfig(
        batch_size=8, nr_epochs=1, test_interval=1, lr=1e-3,
        schedule="plateau", plateau_patience=100,
    )
    t2 = Trainer(_tiny_loss_fn(), cfg2)
    t2.checkpoint_folder = folder
    t2.resume = True
    t2.fit(params, {}, data, data, {"train_loss": [], "test_loss": []})
    assert t2._current_lr == pytest.approx(snap_lr)


def test_model_level_checkpoint_resume(tmp_path, circle_data):
    """LinearModel + checkpoint_interval: orbax snapshots land under the
    model folder and --continue-training-style resume restores them."""
    import os

    from cae_tools_tpu.models.linear_model import LinearModel
    from cae_tools_tpu.xrcompat import xr

    train_ds = xr.open_dataset(os.path.join(circle_data, "train.nc"))
    test_ds = xr.open_dataset(os.path.join(circle_data, "test.nc"))
    folder = str(tmp_path / "linear")

    mt = LinearModel(batch_size=6, nr_epochs=10, test_interval=5, lr=0.05)
    mt.checkpoint_interval = 5
    mt.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    assert os.path.isdir(os.path.join(folder, "orbax"))
    assert latest_step(folder) == 10
    first_run_last = mt.history["test_loss"][-1]

    mt2 = LinearModel()
    mt2.load(folder)
    mt2.nr_epochs = 10
    mt2.checkpoint_interval = 5
    mt2.resume_from_checkpoint = True
    mt2.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    assert latest_step(folder) == 20
    assert mt2.history["test_loss"][-1] < first_run_last


def test_streaming_trainer_checkpoint_resume(tmp_path):
    """StreamingTrainer: periodic orbax snapshots + exact resume."""
    from cae_tools_tpu.train.loop import TrainConfig
    from cae_tools_tpu.train.stream import StreamingTrainer

    folder = str(tmp_path / "stream")
    data = _tiny_data()
    params = {
        "w": jnp.zeros((4, 4), jnp.float32),
        "b": jnp.zeros((4,), jnp.float32),
    }
    cfg = TrainConfig(batch_size=8, nr_epochs=4, test_interval=2, lr=0.05)
    t1 = StreamingTrainer(_tiny_loss_fn(), cfg)
    t1.checkpoint_folder = folder
    t1.checkpoint_interval = 2
    _, _, _, last1 = t1.fit(
        params, {}, data, data, {"train_loss": [], "test_loss": []}
    )
    assert latest_step(folder) == 4
    snap = restore_checkpoint(folder)
    assert any(
        float(np.abs(np.asarray(l)).max()) > 0
        for l in jax.tree_util.tree_leaves(snap["opt_state"])
    )

    t2 = StreamingTrainer(_tiny_loss_fn(), cfg)
    t2.checkpoint_folder = folder
    t2.checkpoint_interval = 2
    t2.resume = True
    _, _, _, last2 = t2.fit(
        params, {}, data, data, {"train_loss": [], "test_loss": []}
    )
    assert latest_step(folder) == 8
    assert last2 < last1


def test_gan_trainer_checkpoint_resume(tmp_path):
    """GANTrainer snapshots carry the critic (d_params/d_opt) and resume
    continues both players."""
    import os

    from cae_tools_tpu.models.resunet_gan import ResUNetGAN
    from cae_tools_tpu.xrcompat import xr

    # data geometry AND model config match
    # test_res_models.test_resunet_gan_lifecycle exactly (8x8 -> 32x32,
    # n=12) so the persistent compile cache (tests/.jax_cache) dedupes the
    # GAN train-graph compile across the two modules; the WGAN-GP
    # double-grad graph at the circle fixture's 256x256 takes >10 min to
    # compile cold on the single-core CPU host
    rng = np.random.default_rng(31)
    dss = {}
    for name in ("train", "test"):
        n = 12
        hi = 288.0 + rng.random((n, 1, 32, 32)).astype(np.float32) * 5.0
        lo = hi.reshape(n, 1, 8, 4, 8, 4).mean(axis=(3, 5))
        ds = xr.Dataset()
        ds["hires"] = xr.DataArray(hi, dims=("n", "chan", "y2", "x2"))
        ds["lowres"] = xr.DataArray(lo, dims=("n", "chan", "y1", "x1"))
        dss[name] = ds
    train_ds, test_ds = dss["train"], dss["test"]
    folder = str(tmp_path / "gan")

    mt = ResUNetGAN(
        batch_size=6, nr_epochs=4, test_interval=2,
        encoded_dim_size=4, fc_size=16,
        lambda_adv=1e-3, lambda_gp=10.0, n_critic=2,
    )
    mt.checkpoint_interval = 2
    mt.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    assert latest_step(folder) == 4
    snap = restore_checkpoint(folder)
    assert "d_params" in snap and "d_opt" in snap
    w_after_first = jax.tree_util.tree_leaves(snap["params"])[0]

    mt2 = ResUNetGAN()
    mt2.load(folder)
    mt2.nr_epochs = 4
    mt2.checkpoint_interval = 2
    mt2.resume_from_checkpoint = True
    mt2.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    assert latest_step(folder) == 8
    snap2 = restore_checkpoint(folder)
    w_after_second = jax.tree_util.tree_leaves(snap2["params"])[0]
    assert not np.allclose(np.asarray(w_after_first), np.asarray(w_after_second))


def test_trainer_tp_resume_keeps_model_axis_sharding(tmp_path):
    """Orbax resume on a dp x tp mesh must re-shard the restored dense
    kernel and its Adam moments over the "model" axis, not replicate
    them (replication would silently drop TP for the resumed run)."""
    from cae_tools_tpu.nn import modules as M
    from cae_tools_tpu.parallel.mesh import get_mesh
    from cae_tools_tpu.train.loop import TrainConfig, Trainer
    from jax.sharding import PartitionSpec as P

    lin = M.LinearMap((1, 8, 8), (1, 32, 32))
    params0, _ = lin.init(jax.random.PRNGKey(0))

    def loss_fn(p, s, r, batch, train):
        out, _ = lin.apply(p, s, batch["x"], train)
        per = jnp.mean((out - batch["y"]) ** 2, axis=(1, 2, 3))
        w = batch["w"]
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0), ({}, {})

    rng = np.random.default_rng(3)
    data = {
        "x": rng.random((16, 8, 8, 1)).astype(np.float32),
        "y": rng.random((16, 32, 32, 1)).astype(np.float32),
    }
    cfg = TrainConfig(batch_size=8, nr_epochs=4, test_interval=2, lr=0.05)
    folder = str(tmp_path / "model")
    mesh = get_mesh(n_data=4, n_model=2)

    t1 = Trainer(loss_fn, cfg, mesh=mesh)
    t1.tp_min_size = 1024
    t1.checkpoint_folder = folder
    t1.checkpoint_interval = 2
    _, _, _, test1 = t1.fit(
        params0, {}, data, data, {"train_loss": [], "test_loss": []}
    )
    assert latest_step(folder) == 4

    t2 = Trainer(loss_fn, cfg, mesh=mesh)
    t2.tp_min_size = 1024
    t2.checkpoint_folder = folder
    t2.checkpoint_interval = 2
    t2.resume = True
    p2, _, _, test2 = t2.fit(
        params0, {}, data, data, {"train_loss": [], "test_loss": []}
    )
    assert latest_step(folder) == 8
    assert test2 < test1  # trajectory continued
    # the resumed kernel kept (or re-acquired) the model-axis sharding
    assert p2["fc"]["w"].sharding.spec == P(None, "model"), (
        p2["fc"]["w"].sharding
    )


def test_stale_snapshot_is_not_rewound(tmp_path, capsys):
    """A --continue-training run that saved NO new orbax snapshot must not
    have its newer folder weights rewound to the old snapshot by the next
    --continue-training run (checkpoint.resume_trainer stale guard)."""
    from conftest import tiny_pair_ds

    from cae_tools_tpu.models.linear_model import LinearModel

    train_ds = tiny_pair_ds(n=12, seed=41)
    test_ds = tiny_pair_ds(n=12, seed=42)
    folder = str(tmp_path / "linear")

    # run A: snapshots on (orbax/10 written)
    mt = LinearModel(batch_size=6, nr_epochs=10, test_interval=5, lr=0.05)
    mt.checkpoint_interval = 5
    mt.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    assert latest_step(folder) == 10

    # run B: continue WITHOUT checkpointing -> folder at 20 epochs,
    # orbax still at 10
    mt2 = LinearModel()
    mt2.load(folder)
    mt2.nr_epochs = 10
    mt2.resume_from_checkpoint = True
    mt2.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    assert latest_step(folder) == 10
    assert mt2.history["nr_epochs"] == 20

    # run C: continue again, 0 epochs -> weights must pass through
    # untouched; a rewind would replace them with the stale orbax/10 ones
    w_after_b = np.asarray(jax.tree_util.tree_leaves(mt2.params)[0]).copy()
    mt3 = LinearModel()
    mt3.load(folder)
    mt3.nr_epochs = 0
    mt3.resume_from_checkpoint = True
    capsys.readouterr()
    mt3.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    out = capsys.readouterr().out
    assert "ignoring orbax snapshot" in out
    w_after_c = np.asarray(jax.tree_util.tree_leaves(mt3.params)[0])
    np.testing.assert_array_equal(w_after_c, w_after_b)


def test_fresh_retrain_purges_stale_orbax_lineage(tmp_path, capsys):
    """Training from scratch into a folder with a leftover orbax dir must
    purge the dead lineage: its steps would collide with the new run's
    numbering (orbax silently skips re-saving an existing step) and a
    later --continue-training could restore the OLD run's weights over
    the retrained model."""
    from conftest import tiny_pair_ds

    from cae_tools_tpu.models.linear_model import LinearModel

    train_ds = tiny_pair_ds(n=12, seed=43)
    test_ds = tiny_pair_ds(n=12, seed=44)
    folder = str(tmp_path / "linear")

    # run A: lineage 1, snapshots at 5/10
    mt = LinearModel(batch_size=6, nr_epochs=10, test_interval=5, lr=0.05)
    mt.checkpoint_interval = 5
    mt.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    assert latest_step(folder) == 10
    w_lineage1 = np.asarray(jax.tree_util.tree_leaves(mt.params)[0]).copy()

    # run B: fresh retrain into the same folder (different lr so the
    # lineages' weights differ); the stale orbax dir must be purged and
    # the new run's snapshots actually written
    mt2 = LinearModel(batch_size=6, nr_epochs=10, test_interval=5, lr=0.02)
    mt2.checkpoint_interval = 5
    capsys.readouterr()
    mt2.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    assert "removing stale orbax snapshots" in capsys.readouterr().out
    assert latest_step(folder) == 10
    w_lineage2 = np.asarray(jax.tree_util.tree_leaves(mt2.params)[0]).copy()
    assert not np.array_equal(w_lineage1, w_lineage2)

    # run C: --continue-training 0 epochs restores lineage 2, not 1
    mt3 = LinearModel()
    mt3.load(folder)
    mt3.nr_epochs = 0
    mt3.resume_from_checkpoint = True
    mt3.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    w_after_c = np.asarray(jax.tree_util.tree_leaves(mt3.params)[0])
    np.testing.assert_array_equal(w_after_c, w_lineage2)


def test_continue_training_snapshot_numbering_is_cumulative(tmp_path, capsys):
    """A --continue-training run that ADDS checkpointing to a folder with
    prior epochs must number its snapshots from the folder's cumulative
    epoch count, so the next run's stale guard accepts them."""
    from conftest import tiny_pair_ds

    from cae_tools_tpu.models.linear_model import LinearModel

    train_ds = tiny_pair_ds(n=12, seed=45)
    test_ds = tiny_pair_ds(n=12, seed=46)
    folder = str(tmp_path / "linear")

    # run A: 10 epochs, no checkpointing
    mt = LinearModel(batch_size=6, nr_epochs=10, test_interval=5, lr=0.05)
    mt.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)

    # run B: continue + checkpointing -> snapshots numbered 15, 20
    mt2 = LinearModel()
    mt2.load(folder)
    mt2.nr_epochs = 10
    mt2.checkpoint_interval = 5
    mt2.resume_from_checkpoint = True
    mt2.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    assert latest_step(folder) == 20
    assert mt2.history["nr_epochs"] == 20
    w_after_b = np.asarray(jax.tree_util.tree_leaves(mt2.params)[0]).copy()

    # run C: continue, 0 epochs -> the snapshot is accepted (not stale)
    mt3 = LinearModel()
    mt3.load(folder)
    mt3.nr_epochs = 0
    mt3.resume_from_checkpoint = True
    capsys.readouterr()
    mt3.train(["lowres"], "hires", train_ds, test_ds, model_path=folder)
    assert "ignoring orbax snapshot" not in capsys.readouterr().out
    w_after_c = np.asarray(jax.tree_util.tree_leaves(mt3.params)[0])
    np.testing.assert_array_equal(w_after_c, w_after_b)
