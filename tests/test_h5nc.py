"""netCDF4/HDF5 envelope (``data/h5nc.py``): writer/reader round-trips,
cross-validation against real libhdf5 output (via h5py, when importable —
it is baked into this image even though netCDF4/xarray are not), the
xrlite/open_dataset routing, disk-streaming from chunked HDF5, and the CLI
train/apply cycle on an HDF5 fixture (reference reads production EOCIS
data as "netcdf4 file(s)", reference cli/train_cae.py:20-23,58-59)."""

import os

import numpy as np
import pytest

from cae_tools_tpu.data import xrlite
from cae_tools_tpu.data.h5nc import (
    H5Error,
    H5File,
    read_h5_dataset,
    write_h5_dataset,
)

h5py = pytest.importorskip("h5py", reason="h5py oracle not available") \
    if os.environ.get("CAE_REQUIRE_H5PY") else None
try:
    import h5py  # noqa: F811
except ImportError:  # pragma: no cover - h5py is present in this image
    h5py = None


def _sample_ds(n=7, seed=1):
    rng = np.random.default_rng(seed)
    ds = xrlite.Dataset()
    ds["lowres"] = xrlite.DataArray(
        rng.normal(280, 5, (n, 2, 6, 6)).astype(np.float32),
        dims=("box", "ci", "y1", "x1"), attrs={"units": "K"},
    )
    ds["hires"] = xrlite.DataArray(
        rng.normal(280, 5, (n, 1, 12, 12)).astype(np.float32),
        dims=("box", "co", "y2", "x2"),
    )
    ds["tide"] = xrlite.DataArray(
        rng.normal(0, 1, (n,)).astype(np.float32), dims=("box",),
    )
    return ds


def _assert_same(got, ref):
    for name in ("lowres", "hires", "tide"):
        np.testing.assert_array_equal(got[name].values, ref[name].values)
        assert got[name].dims == ref[name].dims, (name, got[name].dims)
    assert got["lowres"].attrs.get("units") == "K"


@pytest.mark.parametrize(
    "kw", [{}, {"chunk_rows": 3}, {"chunk_rows": 3, "compress": 4}],
    ids=["contiguous", "chunked", "chunked-deflate"],
)
def test_writer_reader_roundtrip(tmp_path, kw):
    ds = _sample_ds()
    p = str(tmp_path / "rt.nc")
    write_h5_dataset(ds, p, **kw)
    _assert_same(read_h5_dataset(p), ds)
    # row reader: arbitrary-order gathers, like the nc3 twin
    f = H5File(p)
    idx = np.array([5, 0, 3, 5])
    np.testing.assert_array_equal(
        f.read_rows("lowres", idx), ds["lowres"].values[idx]
    )
    assert f.n_rows("hires") == 7
    f.close()


def test_open_dataset_routes_hdf5(tmp_path):
    """xrlite.open_dataset reads netCDF4/HDF5 via the built-in reader
    instead of raising (pre-round-5 behavior)."""
    ds = _sample_ds()
    p = str(tmp_path / "route.nc")
    write_h5_dataset(ds, p)
    _assert_same(xrlite.open_dataset(p), ds)


def test_to_netcdf_format_netcdf4(tmp_path):
    ds = _sample_ds()
    p = str(tmp_path / "fmt.nc")
    ds.to_netcdf(p, format="NETCDF4")
    with open(p, "rb") as f:
        assert f.read(8) == b"\x89HDF\r\n\x1a\n"
    _assert_same(xrlite.open_dataset(p), ds)


def test_unsupported_feature_error_is_actionable(tmp_path):
    p = str(tmp_path / "junk.nc")
    with open(p, "wb") as f:
        f.write(b"\x89HDF\r\n\x1a\nzzzz" + b"\x00" * 64)
    with pytest.raises(ValueError):
        H5File(p)


# ---- cross-validation against real libhdf5 (h5py oracle) -----------------

def _h5py_fixture(path, libver, dskw, small=False):
    rng = np.random.default_rng(1)
    lo = rng.normal(280, 5, (7, 2, 6, 6)).astype(np.float32)
    hi = rng.normal(280, 5, (7, 1, 12, 12)).astype(np.float32)
    tide = rng.normal(0, 1, (7,)).astype(np.float32)
    with h5py.File(path, "w", libver=libver) as f:
        dims = [("box", 7), ("ci", 2), ("y1", 6), ("x1", 6)]
        if not small:
            dims += [("co", 1), ("y2", 12), ("x2", 12)]
        for d, n in dims:
            sc = f.create_dataset(d, shape=(n,), dtype="f4")
            sc.make_scale(
                "This is a netCDF dimension but not a netCDF variable."
                f" {n:10d}"
            )
        v = f.create_dataset("lowres", data=lo, **dskw)
        for i, d in enumerate(["box", "ci", "y1", "x1"]):
            v.dims[i].attach_scale(f[d])
        v.attrs["units"] = "K"
        v.attrs["scale_factor"] = np.float64(1.0)
        if not small:
            kw2 = dict(dskw)
            if "chunks" in kw2:
                kw2["chunks"] = (3, 1, 12, 12)
            v2 = f.create_dataset("hires", data=hi, **kw2)
            for i, d in enumerate(["box", "co", "y2", "x2"]):
                v2.dims[i].attach_scale(f[d])
            v3 = f.create_dataset("tide", data=tide)
            v3.dims[0].attach_scale(f["box"])
    return lo, hi, tide


@pytest.mark.skipif(h5py is None, reason="h5py oracle not installed")
@pytest.mark.parametrize(
    "libver,dskw,small",
    [
        ("earliest", {}, False),                                 # v0 sblk
        ("earliest",
         dict(chunks=(2, 2, 6, 6), compression="gzip", shuffle=True),
         False),                                                 # v1 btree
        ("latest", {}, True),                   # v3 sblk, OHDR, link msgs
        ("latest", dict(chunks=(3, 2, 6, 6), compression="gzip"),
         True),                                 # layout v4 fixed-array idx
        ("latest", dict(chunks=(7, 2, 6, 6)), True),  # v4 single-chunk idx
    ],
    ids=["v0-contig", "v0-chunk-gzip-shuffle", "v3-contig",
         "v4-fixed-array-gzip", "v4-single-chunk"],
)
def test_reads_real_libhdf5_files(tmp_path, libver, dskw, small):
    """The from-the-spec reader against genuine libhdf5 output — values,
    netCDF dimension names (DIMENSION_LIST deref through the global
    heap), vlen-string and scalar attributes, random row gathers."""
    p = str(tmp_path / "real.nc")
    lo, hi, tide = _h5py_fixture(p, libver, dskw, small)
    ds = read_h5_dataset(p)
    np.testing.assert_array_equal(ds["lowres"].values, lo)
    assert ds["lowres"].dims == ("box", "ci", "y1", "x1")
    assert ds["lowres"].attrs.get("units") == "K"
    assert ds["lowres"].attrs.get("scale_factor") == 1.0
    if not small:
        np.testing.assert_array_equal(ds["hires"].values, hi)
        np.testing.assert_array_equal(ds["tide"].values, tide)
        assert ds["tide"].dims == ("box",)
        # pure dimensions are not data variables
        assert "y2" not in ds.variables
    f = H5File(p)
    np.testing.assert_array_equal(
        f.read_rows("lowres", np.array([5, 0, 3])), lo[[5, 0, 3]]
    )
    f.close()


@pytest.mark.skipif(h5py is None, reason="h5py oracle not installed")
@pytest.mark.parametrize(
    "kw", [{}, {"chunk_rows": 3, "compress": 4}],
    ids=["contiguous", "chunked-deflate"],
)
def test_libhdf5_reads_our_writer(tmp_path, kw):
    """Real libhdf5 (h5py) must accept the built-in writer's files:
    values, attached dimension scales, attributes."""
    ds = _sample_ds()
    p = str(tmp_path / "ours.nc")
    write_h5_dataset(ds, p, **kw)
    with h5py.File(p, "r") as f:
        for name in ("lowres", "hires", "tide"):
            np.testing.assert_array_equal(
                f[name][...], ds[name].values
            )
        scales = [f["lowres"].dims[i][0].name for i in range(4)]
        assert scales == ["/box", "/ci", "/y1", "/x1"]
        assert f["lowres"].attrs["units"] in (b"K", "K")


@pytest.mark.skipif(h5py is None, reason="h5py oracle not installed")
def test_dense_group_raises_actionable(tmp_path):
    """>8 links under libver=latest flips libhdf5 to dense (fractal-heap)
    link storage — outside the classic-model envelope; the error must
    name the feature."""
    p = str(tmp_path / "dense.nc")
    with h5py.File(p, "w", libver="latest") as f:
        for i in range(12):
            f.create_dataset(f"v{i:02d}", data=np.zeros(3, np.float32))
    with pytest.raises(H5Error, match="dense"):
        H5File(p)


# ---- product integration ---------------------------------------------------

def test_diskstream_from_chunked_hdf5(tmp_path):
    """DiskStreamDataset streams rows out-of-core from chunked+deflate
    netCDF4 files, matching the in-RAM ArrayDataset batches exactly."""
    from cae_tools_tpu.data.dataset import ArrayDataset
    from cae_tools_tpu.data.diskstream import DiskStreamDataset

    paths = []
    full = []
    for i in range(2):
        ds = _sample_ds(seed=10 + i)
        p = str(tmp_path / f"part{i}.nc")
        write_h5_dataset(ds, p, chunk_rows=2, compress=4)
        paths.append(p)
        full.append(ds)

    disk = DiskStreamDataset(paths)
    cfg = ArrayDataset(disk, ["lowres", "tide"], "hires")
    assert cfg is disk
    x, y, m = disk.arrays_nhwc()
    assert x.shape == (14, 6, 6, 3)

    merged = xrlite.concat(full, "box")
    # the in-RAM path gets 1-D aux vars broadcast by the CLI before
    # ArrayDataset construction (reference cli/train_cae.py:73-109); the
    # disk-stream path broadcasts at batch-assembly time
    from cae_tools_tpu.cli.common import broadcast_scalar_vars

    broadcast_scalar_vars(merged, ["lowres", "tide"], "box")
    ram = ArrayDataset(merged, ["lowres", "tide"], "hires")
    rx, ry, rm = ram.arrays_nhwc()
    idx = np.array([13, 2, 7, 0])
    np.testing.assert_allclose(x[idx], rx[idx], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(y[idx], ry[idx], rtol=1e-6, atol=1e-7)
    disk.close()


def test_cli_train_apply_on_hdf5_fixture(tmp_path):
    """train_cae + apply_cae on an HDF5-based netCDF4 fixture (CPU) — the
    production ingest path the reference serves with xarray+netcdf4."""
    from cae_tools_tpu.cli import apply_cae as apply_cli
    from cae_tools_tpu.cli import train_cae as train_cli
    from cae_tools_tpu.data.datagen import generate_spec_files

    folder = generate_spec_files("circle", str(tmp_path / "data"), n=8,
                                 seed=21)
    # convert the netCDF3 fixtures to chunked netCDF4
    nc4 = {}
    for part in ("train", "test"):
        ds = xrlite.open_dataset(os.path.join(folder, f"{part}.nc"))
        p = str(tmp_path / f"{part}4.nc")
        write_h5_dataset(ds, p, chunk_rows=4, compress=2)
        nc4[part] = p

    model = str(tmp_path / "model")
    train_cli.main([
        "--train-inputs", nc4["train"], "--test-inputs", nc4["test"],
        "--model-folder", model, "--method", "conv",
        "--input-variables", "lowres", "--output-variable", "hires",
        "--nr-epochs", "2", "--batch-size", "4",
        "--latent-size", "4", "--fc-size", "8",
    ])
    assert os.path.exists(os.path.join(model, "parameters.json"))

    out = str(tmp_path / "scored.nc")
    apply_cli.main([nc4["test"], out, "--model-folder", model])
    scored = xrlite.open_dataset(out)
    assert "model_output" in scored.variables
    assert np.isfinite(scored["model_output"].values).all()


def test_streaming_cli_on_hdf5(tmp_path):
    """--host-memory-budget streaming route over netCDF4 inputs."""
    from cae_tools_tpu.cli.train_cae import (
        build_parser,
        open_training_datasets,
    )
    from cae_tools_tpu.data.diskstream import DiskStreamDataset

    ds = _sample_ds()
    p = str(tmp_path / "s.nc")
    write_h5_dataset(ds, p, chunk_rows=2, compress=4)
    args = build_parser().parse_args([
        "--train-inputs", p, "--test-inputs", p,
        "--model-folder", str(tmp_path / "m"),
        "--input-variables", "lowres",
        "--output-variable", "hires",
        "--host-memory-budget", "1",
    ])
    train_ds, test_ds = open_training_datasets(args, quiet=True)
    assert isinstance(train_ds, DiskStreamDataset)
    assert train_ds.files[0].n_rows("hires") == 7


# ---- round-5 review fixes -------------------------------------------------

def test_global_attrs_roundtrip(tmp_path):
    """Root-group (global) attributes survive write -> read, matching the
    netCDF3 route which preserves them in ds.attrs."""
    ds = _sample_ds()
    ds.attrs["title"] = "EOCIS test cube"
    ds.attrs["version"] = np.int32(3)
    p = str(tmp_path / "gattrs.nc")
    write_h5_dataset(ds, p)
    got = read_h5_dataset(p)
    assert got.attrs["title"] == "EOCIS test cube"
    assert int(np.asarray(got.attrs["version"])) == 3
    if h5py is not None:  # oracle: libhdf5 sees the same root attrs
        with h5py.File(p, "r") as f:
            assert f.attrs["title"] in (b"EOCIS test cube", "EOCIS test cube")
            assert int(f.attrs["version"]) == 3


@pytest.mark.skipif(h5py is None, reason="h5py oracle not installed")
def test_global_attrs_from_libhdf5(tmp_path):
    p = str(tmp_path / "gattrs_h5py.nc")
    with h5py.File(p, "w") as f:
        f.attrs["summary"] = "made by libhdf5"
        f.attrs["level"] = np.float32(2.5)
        f["x"] = np.arange(6, dtype=np.float32)
    got = read_h5_dataset(p)
    assert got.attrs["summary"] == "made by libhdf5"
    assert float(np.asarray(got.attrs["level"])) == 2.5


@pytest.mark.skipif(h5py is None, reason="h5py oracle not installed")
def test_phony_dims_distinct_for_square_variables(tmp_path):
    """A (n, 1, 8, 8) variable with no dimension scales must get two
    DISTINCT phony dims for its equal-size axes (duplicate dims in one
    array are invalid xarray semantics), while equal-size axes still
    share names ACROSS variables."""
    p = str(tmp_path / "square.nc")
    with h5py.File(p, "w") as f:
        f["img"] = np.zeros((3, 1, 8, 8), np.float32)
        f["img2"] = np.zeros((5, 8, 8), np.float32)
    ds = read_h5_dataset(p)
    dims = ds["img"].dims
    assert len(set(dims)) == len(dims), dims
    # the two 8-axes share names across variables, positionally
    assert ds["img2"].dims[1:] == dims[2:]


@pytest.mark.skipif(h5py is None, reason="h5py oracle not installed")
def test_ancillary_string_variable_does_not_block_file(tmp_path):
    """A production file carrying a non-numeric ancillary variable (e.g.
    a 'crs' label) alongside numeric data must stay readable; the
    unsupported-datatype error is deferred to access of that variable."""
    p = str(tmp_path / "anc.nc")
    with h5py.File(p, "w") as f:
        f["hires"] = np.ones((4, 2, 2), np.float32)
        f["crs"] = np.bytes_(b"WGS84")
    f5 = H5File(p)
    try:
        assert "hires" in f5.data_variable_names()
        assert "crs" not in f5.data_variable_names()
        assert f5.n_rows("hires") == 4
        with pytest.raises(H5Error, match="crs"):
            f5.n_rows("crs")
    finally:
        f5.close()
    ds = read_h5_dataset(p)  # skips the unsupported variable
    assert set(ds.data_vars) == {"hires"}
    np.testing.assert_array_equal(ds["hires"].values, np.ones((4, 2, 2)))


@pytest.mark.skipif(h5py is None, reason="h5py oracle not installed")
def test_userblock_hdf5_detected_and_read(tmp_path):
    """HDF5 files with a user block (signature at offset 512) must route
    to the built-in netCDF4 reader, not the netCDF3 error path."""
    from cae_tools_tpu.data.diskstream import open_row_reader
    from cae_tools_tpu.data.h5nc import is_hdf5

    p = str(tmp_path / "ub.nc")
    with h5py.File(p, "w", userblock_size=512) as f:
        f["x"] = np.arange(12, dtype=np.float32).reshape(4, 3)
    assert is_hdf5(p)
    ds = xrlite.open_dataset(p)
    np.testing.assert_array_equal(
        ds["x"].values, np.arange(12, dtype=np.float32).reshape(4, 3)
    )
    r = open_row_reader(p)
    try:
        assert r.n_rows("x") == 4
    finally:
        r.close()


def test_superblock_v1_reads(tmp_path):
    """Superblock v1 (non-default btree-k settings, legacy producers):
    the 4-byte indexed-storage-k field pushes the root header address to
    bytes 60-68 — must parse, not struct.error.  (This image's h5py
    lacks set_istore_k, so the fixture comes from the writer's v1 knob;
    the companion libhdf5 cross-check below validates that knob.)"""
    ds = _sample_ds()
    p = str(tmp_path / "v1.nc")
    write_h5_dataset(ds, p, _superblock_v1=True)
    with open(p, "rb") as f:
        assert f.read(9)[-1] == 1  # really superblock version 1
    _assert_same(read_h5_dataset(p), ds)


@pytest.mark.skipif(h5py is None, reason="h5py oracle not installed")
def test_superblock_v1_fixture_is_valid_hdf5(tmp_path):
    """Real libhdf5 must accept the v1-superblock fixture — proving the
    v1 test above exercises the format, not a private dialect."""
    ds = _sample_ds()
    p = str(tmp_path / "v1_oracle.nc")
    write_h5_dataset(ds, p, _superblock_v1=True)
    with h5py.File(p, "r") as f:
        np.testing.assert_array_equal(f["lowres"][...], ds["lowres"].values)


@pytest.mark.skipif(h5py is None, reason="h5py oracle not installed")
def test_diskstream_surfaces_deferred_unsupported_error(tmp_path):
    """Configuring a DiskStreamDataset on a present-but-unsupported
    variable must raise the stored actionable H5Error (naming the
    feature), not a misleading 'variable not found'."""
    from cae_tools_tpu.data.diskstream import DiskStreamDataset

    p = str(tmp_path / "mix.nc")
    with h5py.File(p, "w") as f:
        f["hires"] = np.ones((4, 1, 2, 2), np.float32)
        f["label"] = np.bytes_(b"string-typed")
    ds = DiskStreamDataset([p])
    try:
        with pytest.raises(H5Error, match="label"):
            ds.configure(["label"], "hires")
    finally:
        ds.close()


@pytest.mark.skipif(h5py is None, reason="h5py oracle not installed")
def test_ncproperties_hidden_from_global_attrs(tmp_path):
    """libnetcdf's _NCProperties provenance attr is hidden, matching the
    xarray/netcdf4 route (and never copied into files we write)."""
    p = str(tmp_path / "ncprops.nc")
    with h5py.File(p, "w") as f:
        f.attrs["_NCProperties"] = "version=2,netcdf=4.9.2,hdf5=1.14.3"
        f.attrs["title"] = "kept"
        f["x"] = np.arange(4, dtype=np.float32)
    ds = read_h5_dataset(p)
    assert "title" in ds.attrs and "_NCProperties" not in ds.attrs


@pytest.mark.skipif(h5py is None, reason="h5py oracle not installed")
def test_diskstream_deferred_error_in_later_file(tmp_path):
    """A variable supported in file 0 but unsupported (string-typed) in
    file 1 must surface file 1's actionable H5Error, not a misleading
    'inconsistent shape'/'not found'."""
    from cae_tools_tpu.data.diskstream import DiskStreamDataset

    p0, p1 = str(tmp_path / "a.nc"), str(tmp_path / "b.nc")
    with h5py.File(p0, "w") as f:
        f["hires"] = np.ones((4, 1, 2, 2), np.float32)
    with h5py.File(p1, "w") as f:
        f["hires"] = np.bytes_(b"oops")
    ds = DiskStreamDataset([p0, p1])
    try:
        with pytest.raises(H5Error, match="hires"):
            ds.configure(["hires"], None)
    finally:
        ds.close()
