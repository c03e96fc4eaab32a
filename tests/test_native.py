"""C++ ingest accelerator: build, parity with numpy, dataset integration."""

import numpy as np
import pytest

from cae_tools_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable (no compiler)")
    return True


def test_scan_parity(lib_ok):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(13, 3, 17, 19)).astype(np.float32)
    arr[2, 1, 3, 4] = np.nan
    arr[7, 0, 0, 0] = np.nan
    mn, mx, nans = native.scan_f32(arr)
    assert nans == 2
    assert mn == pytest.approx(float(np.nanmin(arr)))
    assert mx == pytest.approx(float(np.nanmax(arr)))


def test_normalize_pack_parity(lib_ok):
    rng = np.random.default_rng(1)
    src = rng.uniform(5, 25, size=(9, 2, 11, 13)).astype(np.float32)
    dst = np.full((9, 11, 13, 5), -1.0, np.float32)
    assert native.normalize_pack(src, dst, 5.0, 25.0, 1)
    ref = ((src - 5.0) / 20.0).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(dst[..., 1:3], ref, rtol=1e-6)
    # untouched channels keep their prior contents
    assert (dst[..., 0] == -1.0).all()
    assert (dst[..., 3:] == -1.0).all()


def test_zero_range_packs_zero(lib_ok):
    src = np.full((2, 1, 4, 4), 7.0, np.float32)
    dst = np.empty((2, 4, 4, 1), np.float32)
    native.normalize_pack(src, dst, 7.0, 7.0, 0)
    assert (dst == 0.0).all()


def test_dataset_native_vs_numpy_paths(circle_data, monkeypatch):
    from cae_tools_tpu.data.dataset import ArrayDataset
    from cae_tools_tpu.xrcompat import xr

    ds = xr.open_dataset(circle_data + "/train.nc")
    ads = ArrayDataset(ds, ["lowres"], "hires")
    x1, y1, m1 = ads.arrays_nhwc()

    monkeypatch.setenv("CAE_TPU_NATIVE", "0")
    ads2 = ArrayDataset(ds, ["lowres"], "hires")
    x2, y2, m2 = ads2.arrays_nhwc()
    np.testing.assert_allclose(x1, x2, rtol=1e-6)
    np.testing.assert_allclose(y1, y2, rtol=1e-6)
    np.testing.assert_allclose(m1, m2, rtol=1e-6)
