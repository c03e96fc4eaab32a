"""Regression tests for defects found in the round-1 self-review."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cae_tools_tpu.nn import modules as M
from cae_tools_tpu.nn import torchio
from cae_tools_tpu.train.loop import TrainConfig, Trainer
from cae_tools_tpu.train.stream import StreamingTrainer


def _linear_loss(lin):
    def loss_fn(params, state, rng, batch, train):
        out, _ = lin.apply(params, state, batch["x"], train)
        per = jnp.mean((out - batch["y"]) ** 2, axis=(1, 2, 3))
        w = batch["w"]
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0), ({}, {})

    return loss_fn


def test_npz_fallback_roundtrip(tmp_path, monkeypatch):
    """save/load must round-trip when torch is unavailable (npz path)."""
    monkeypatch.setattr(torchio, "HAVE_TORCH", False)
    sd = {"a.weight": np.arange(6.0).reshape(2, 3), "b.bias": np.ones((4,))}
    path = str(tmp_path / "weights")
    torchio.save_state_dict(path, sd)
    import os

    assert os.path.exists(path)  # no ".npz" suffix appended
    back = torchio.load_state_dict(path)
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k])


def test_flatten_pytree_empty_containers():
    tree = {"bns": [], "cfg": {}, "w": np.ones((2,))}
    back = torchio.unflatten_pytree(torchio.flatten_pytree(tree))
    assert back["bns"] == []
    assert back["cfg"] == {}
    np.testing.assert_allclose(back["w"], tree["w"])


def test_mesh_training_with_non_divisible_case_count():
    """12 cases on an 8-device data mesh must train (pad, not crash)."""
    from cae_tools_tpu.parallel.mesh import get_mesh

    rng = np.random.default_rng(0)
    x = rng.random((12, 4, 4, 1), dtype=np.float32)
    y = rng.random((12, 8, 8, 1), dtype=np.float32)
    lin = M.LinearMap((1, 4, 4), (1, 8, 8))
    params, state = lin.init(jax.random.PRNGKey(0))
    cfg = TrainConfig(batch_size=5, nr_epochs=2, test_interval=1, lr=0.05)
    tr = Trainer(_linear_loss(lin), cfg, mesh=get_mesh(n_data=8, n_model=1))
    hist = {"train_loss": [], "test_loss": [], "nr_epochs": 0}
    p, s, tl, te = tr.fit(params, state, {"x": x, "y": y}, {"x": x, "y": y}, hist)
    assert np.isfinite(tl) and np.isfinite(te)

    # streaming path with batch size not divisible by the mesh either
    tr2 = StreamingTrainer(
        _linear_loss(lin), cfg, mesh=get_mesh(n_data=8, n_model=1)
    )
    hist2 = {"train_loss": [], "test_loss": [], "nr_epochs": 0}
    p2, s2, tl2, te2 = tr2.fit(
        params, state, {"x": x, "y": y}, {"x": x, "y": y}, hist2
    )
    assert np.isfinite(tl2) and np.isfinite(te2)


def test_streaming_plateau_decays_lr():
    rng = np.random.default_rng(0)
    x = rng.random((8, 4, 4, 1), dtype=np.float32)
    y = rng.random((8, 4, 4, 1), dtype=np.float32)
    lin = M.LinearMap((1, 4, 4), (1, 4, 4))
    params, state = lin.init(jax.random.PRNGKey(0))
    cfg = TrainConfig(
        batch_size=8, nr_epochs=12, test_interval=1, lr=1e-9,
        schedule="plateau", plateau_patience=2, plateau_factor=0.5,
    )
    tr = StreamingTrainer(_linear_loss(lin), cfg)
    hist = {"train_loss": [], "test_loss": [], "nr_epochs": 0}
    lrs = []
    tr.fit(
        params, state, {"x": x, "y": y}, {"x": x, "y": y}, hist,
        log_fn=lambda e, tl, te, ta, tb, lr: lrs.append(lr),
    )
    assert min(lrs) < 1e-9


def test_varae_ssim_weighted_padding_invariant(tmp_path_factory):
    """VarAE loss must be invariant to trailing-batch padding: training on
    N=8 with batch 8 vs batch 5 (pads 2 rows) gives finite, comparable
    first-epoch losses (the SSIM term previously averaged padding rows)."""
    from cae_tools_tpu.models import VarAEModel
    from cae_tools_tpu.xrcompat import xr
    import os

    root = str(tmp_path_factory.mktemp("vdata"))
    rng = np.random.default_rng(5)
    n = 8
    hi = 288.0 + rng.random((n, 1, 64, 64)).astype(np.float32) * 5.0
    lo = hi.reshape(n, 1, 16, 4, 16, 4).mean(axis=(3, 5))
    ds = xr.Dataset()
    ds["hires"] = xr.DataArray(hi, dims=("n", "chan", "y2", "x2"))
    ds["lowres"] = xr.DataArray(lo, dims=("n", "chan", "y1", "x1"))
    path = os.path.join(root, "d.nc")
    ds.to_netcdf(path)
    d = xr.open_dataset(path)

    losses = {}
    for bs in (8, 5):
        mt = VarAEModel(
            batch_size=bs, nr_epochs=1, test_interval=1,
            encoded_dim_size=4, fc_size=8, lambda_kl=0.0, lambda_ssim=1.0,
        )
        mt.train(["lowres"], "hires", d, d)
        losses[bs] = mt.history["test_loss"][0]
    assert np.isfinite(losses[8]) and np.isfinite(losses[5])


def test_evaluate_uses_cached_pack(circle_data):
    from cae_tools_tpu.data.dataset import ArrayDataset
    from cae_tools_tpu.xrcompat import xr

    ds = xr.open_dataset(circle_data + "/train.nc")
    ads = ArrayDataset(ds, ["lowres"], "hires")
    x1, y1, m1 = ads.arrays_nhwc()
    x2, y2, m2 = ads.arrays_nhwc()
    assert x1 is x2 and y1 is y2  # memoised
    # changing normalisation invalidates the cache
    ads.set_normalise_output(False)
    x3, y3, m3 = ads.arrays_nhwc()
    assert y3 is not y1
    assert float(y3.max()) > 2.0  # denormalised kelvin values
    ads.set_normalisation_parameters(ads.get_normalisation_parameters())
    x4, _, _ = ads.arrays_nhwc()
    assert x4 is not x3


# ---- round-5 advisor fixes -------------------------------------------------

def test_dropout_short_circuits_numpy_zero_rate():
    """np.float32(0.0) dropout rate must short-circuit like the python
    float (no bernoulli mask sampled into the traced graph)."""
    x = jnp.ones((4, 4))
    out = M.dropout(jax.random.PRNGKey(0), x, np.float32(0.0), train=True)
    assert out is x  # identity return, not a keep=1.0 masked copy
    out2 = M.dropout(jax.random.PRNGKey(0), x, np.float64(0.0), train=True)
    assert out2 is x


def test_diskstream_reconfigure_guard(tmp_path):
    """ArrayDataset(disk_ds) returns the shared DiskStreamDataset: a
    re-configure flipping normalisation flags while DiskArray views are
    outstanding must be refused (aliasing trap), but a same-flag
    re-configure stays allowed (the product's sequential reuse)."""
    from cae_tools_tpu.data import xrlite
    from cae_tools_tpu.data.dataset import ArrayDataset
    from cae_tools_tpu.data.diskstream import DiskStreamDataset

    rng = np.random.default_rng(0)
    ds = xrlite.Dataset()
    ds["lo"] = xrlite.DataArray(
        rng.normal(280.0, 5.0, (4, 1, 6, 6)).astype(np.float32),
        dims=("box", "c", "y", "x"),
    )
    ds["hi"] = xrlite.DataArray(
        rng.normal(280.0, 5.0, (4, 1, 12, 12)).astype(np.float32),
        dims=("box", "c2", "y2", "x2"),
    )
    p = str(tmp_path / "d.nc")
    ds.to_netcdf(p)

    disk = DiskStreamDataset([p])
    a = ArrayDataset(disk, ["lo"], "hi")
    assert a is disk
    a.arrays_nhwc()  # views now outstanding
    # same flags: fine (models re-wrap the dataset per phase)
    ArrayDataset(disk, ["lo"], "hi")
    with pytest.raises(ValueError, match="re-configuring"):
        ArrayDataset(disk, ["lo"], "hi", normalise_out=False)


def test_nc3_vsize_sentinel_recomputed(tmp_path):
    """A record variable carrying the spec's 2^32-1 vsize sentinel must
    read correctly (recomputed record size), not poison every offset."""
    import struct

    from cae_tools_tpu.data.nc3 import NC3File

    # hand-built CDF-1 file: dims t (record), x=3; one float record var
    # "v" whose vsize field carries the sentinel (true vsize = 12)
    nrec, nx = 3, 3
    header = b"CDF\x01" + struct.pack(">i", nrec)
    header += struct.pack(">II", 0x0A, 2)            # dim list
    header += struct.pack(">I", 1) + b"t\x00\x00\x00" + struct.pack(">I", 0)
    header += struct.pack(">I", 1) + b"x\x00\x00\x00" + struct.pack(">I", nx)
    header += struct.pack(">II", 0, 0)               # global atts ABSENT
    header += struct.pack(">II", 0x0B, 1)            # var list
    header += struct.pack(">I", 1) + b"v\x00\x00\x00"
    header += struct.pack(">I", 2) + struct.pack(">II", 0, 1)  # dims (t, x)
    header += struct.pack(">II", 0, 0)               # var atts ABSENT
    header += struct.pack(">I", 5)                   # NC_FLOAT
    header += struct.pack(">I", 0xFFFFFFFF)          # vsize sentinel
    begin = len(header) + 4
    header += struct.pack(">I", begin)
    data = np.arange(nrec * nx, dtype=">f4").tobytes()
    path = str(tmp_path / "sentinel.nc")
    with open(path, "wb") as f:
        f.write(header + data)

    f = NC3File(path)
    assert f.recsize == nx * 4
    got = f.read_rows("v", np.array([2, 0]))
    np.testing.assert_array_equal(
        got, np.arange(nrec * nx, dtype=np.float32).reshape(nrec, nx)[[2, 0]]
    )
    f.close()


def test_streaming_cli_missing_output_variable(tmp_path):
    """--host-memory-budget path: a mistyped --output-variable must die
    with the actionable variable-not-found error, not a raw KeyError."""
    from cae_tools_tpu.cli.train_cae import build_parser, open_training_datasets
    from cae_tools_tpu.data import xrlite

    rng = np.random.default_rng(0)
    ds = xrlite.Dataset()
    ds["lowres"] = xrlite.DataArray(
        rng.normal(280.0, 5.0, (4, 1, 6, 6)).astype(np.float32),
        dims=("box", "c", "y", "x"),
    )
    ds["hires"] = xrlite.DataArray(
        rng.normal(280.0, 5.0, (4, 1, 12, 12)).astype(np.float32),
        dims=("box", "c2", "y2", "x2"),
    )
    p = str(tmp_path / "t.nc")
    ds.to_netcdf(p)

    args = build_parser().parse_args([
        "--train-inputs", p, "--test-inputs", p,
        "--model-folder", str(tmp_path / "model"),
        "--input-variables", "lowres",
        "--output-variable", "hirez",  # typo
        "--host-memory-budget", "1",   # force the streaming route
    ])
    with pytest.raises(SystemExit, match="hirez"):
        open_training_datasets(args, quiet=True)
