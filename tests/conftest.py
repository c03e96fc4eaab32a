"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; per the build plan
(SURVEY.md §4) the sharded code paths are exercised against
``xla_force_host_platform_device_count=8`` so pjit/mesh logic compiles and
executes with real collectives, just on host devices.
"""

import os

# XLA flags must be in the env before the first backend initialisation
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The host environment force-registers a TPU PJRT plugin via sitecustomize
# and pins JAX_PLATFORMS before any conftest runs; the env var alone is NOT
# enough.  jax.config wins if updated before first device use.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent XLA compile cache: the suite compiles many *identical* train/
# apply graphs from different closures (per-Trainer jit functions defeat
# the in-memory cache); the disk cache is keyed by HLO hash, so it dedupes
# them within one run and makes repeat runs start warm.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pathlib
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

DATA_ROOT = REPO_ROOT / "tests" / "data"


@pytest.fixture(scope="session")
def data_root():
    return str(DATA_ROOT)


@pytest.fixture(scope="session")
def circle_data(data_root):
    """Small circle-geometry train/test netCDF fixtures (generated once)."""
    import os

    from cae_tools_tpu.data.datagen import generate_spec_files

    n = 12
    folder = generate_spec_files("circle", data_root, n=n, seed=1234)
    # regenerate if a stale fixture with a different case count exists
    from cae_tools_tpu.xrcompat import xr

    if xr.open_dataset(os.path.join(folder, "train.nc"))["hires"].shape[0] != n:
        generate_spec_files("circle", data_root, n=n, seed=1234, force=True)
    return folder


def tiny_pair_ds(n=16, seed=0, out_hw=16, factor=4, kelvin=True):
    """In-memory Kelvin-scale (out_hw/factor)² -> out_hw² pairs.

    Geometry-agnostic tests (mesh plumbing, checkpoint resume, TP
    placement) should use this instead of the 16x16->256x256 circle
    fixtures: identical code paths, ~100x less compile+compute."""
    import numpy as np

    from cae_tools_tpu.xrcompat import xr

    rng = np.random.default_rng(seed)
    base = 280.0 if kelvin else 0.2
    span = 15.0 if kelvin else 0.6
    hi = base + rng.random((n, 1, out_hw, out_hw)).astype(np.float32) * span
    in_hw = out_hw // factor
    lo = hi.reshape(n, 1, in_hw, factor, in_hw, factor).mean(axis=(3, 5))
    ds = xr.Dataset()
    ds["hires"] = xr.DataArray(hi, dims=("n", "c", "y2", "x2"))
    ds["lowres"] = xr.DataArray(lo, dims=("n", "c", "y1", "x1"))
    return ds
