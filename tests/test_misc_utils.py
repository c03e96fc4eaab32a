"""Small-surface coverage: xrlite extras, html escaping, profiling trace,
orbax restore errors."""

import os

import numpy as np
import pytest

from cae_tools_tpu.data import xrlite
from cae_tools_tpu.utils import html as H


def test_xrlite_isel_and_helpers():
    ds = xrlite.Dataset()
    ds["v"] = xrlite.DataArray(
        np.arange(24, dtype=np.float32).reshape(2, 3, 4), dims=("n", "y", "x")
    )
    sub = ds.isel(n=0)
    assert sub["v"].shape == (3, 4)
    assert sub["v"].dims == ("y", "x")
    copy = ds.copy()
    copy["v"].values[0, 0, 0] = -99.0
    assert float(ds["v"].values[0, 0, 0]) == 0.0  # deep copy of payload
    da = ds["v"]
    assert float(da.mean()) == pytest.approx(11.5)
    assert da.astype(np.float64).dtype == np.float64
    expanded = xrlite.DataArray(np.ones((2,)), dims=("n",)).expand_dims(
        {"chan": [0]}, axis=1
    )
    assert expanded.dims == ("n", "chan")
    assert expanded.shape == (2, 1)


def test_xrlite_dim_conflict_rejected():
    ds = xrlite.Dataset()
    ds["a"] = xrlite.DataArray(np.zeros((3, 2)), dims=("n", "x"))
    with pytest.raises(ValueError):
        ds["b"] = xrlite.DataArray(np.zeros((4, 2)), dims=("n", "x"))


def test_html_escaping_and_structure():
    b = H.Html5Builder()
    b.head().add_element("title").add_text("T & <'stuff'>")
    tbl = H.TableFragment()
    tbl.add_row(["a<b", "c&d"])
    b.body().add_fragment(tbl)
    b.body().add_element("img", {"src": 'x"y'})
    out = b.get_html()
    assert "T &amp; &lt;&#x27;stuff&#x27;&gt;" in out or "T &amp; &lt;" in out
    assert "a&lt;b" in out and "c&amp;d" in out
    assert "<img" in out and "</img>" not in out  # void element
    assert out.startswith("<!DOCTYPE html>")


def test_inlined_image_rejects_unknown_type(tmp_path):
    p = str(tmp_path / "file.xyz")
    open(p, "w").write("data")
    with pytest.raises(ValueError):
        H.inlined_image_src(p)


def test_profiling_trace_noop_without_env(monkeypatch):
    from cae_tools_tpu.utils.profiling import trace

    monkeypatch.delenv("CAE_TPU_PROFILE", raising=False)
    with trace() as t:
        assert t is None


def test_orbax_restore_missing_raises(tmp_path):
    from cae_tools_tpu.train.checkpoint import restore_checkpoint

    with pytest.raises(FileNotFoundError):
        restore_checkpoint(str(tmp_path / "nothing"))
