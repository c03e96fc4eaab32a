"""Minimal xarray-compatible data model with netCDF IO.

The reference framework stores all data as xarray Datasets of 4-D
``(N, channel, y, x)`` variables in netCDF files (reference
``models/ds_dataset.py:20``, ``cli/train_cae.py:58``).  This environment does
not ship xarray/netCDF4/dask, so this module provides a small, dependency-free
(numpy + scipy) implementation of the subset of the xarray API the framework
needs:

- ``DataArray``: numpy payload + named dims + attrs, ``.values``/``.data``,
  ``.min()``/``.max()``, numpy-style indexing returning DataArrays.
- ``Dataset``: mapping of name -> DataArray plus global attrs and a ``dims``
  mapping; ``to_netcdf`` / ``open_dataset`` / ``open_mfdataset`` / ``concat``.

Files are written in netCDF3 64-bit-offset format (``version=2``) via
``scipy.io.netcdf_file`` by default — the classic data model without
classic-format's 2 GiB per-variable/file limits — or as netCDF4/HDF5 with
``to_netcdf(..., format="NETCDF4")`` (built-in writer, ``data/h5nc.py``).
netCDF4/HDF5 *reading* is built in since round 5: ``open_dataset`` routes
the HDF5 signature to the from-the-spec reader in ``data/h5nc.py``
(superblock v0-v3, contiguous + chunked layouts, gzip+shuffle filters,
netCDF dimension-scale resolution), raising an actionable error naming
any feature outside that envelope.  When the real xarray package is
importable, ``cae_tools_tpu.xrcompat`` prefers it and this module is
unused.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "DataArray",
    "Dataset",
    "open_dataset",
    "open_mfdataset",
    "concat",
]


def _decode_attr(value):
    if isinstance(value, bytes):
        return value.decode("utf-8", errors="replace")
    return value


class DataArray:
    """A named-dimension numpy array (tiny subset of ``xarray.DataArray``)."""

    def __init__(self, data, dims=None, attrs=None, name=None):
        if isinstance(data, DataArray):
            attrs = dict(data.attrs, **(attrs or {}))
            dims = dims or data.dims
            data = data.values
        self._data = np.asarray(data)
        if dims is None:
            dims = tuple(f"dim_{i}" for i in range(self._data.ndim))
        dims = tuple(dims)
        if len(dims) != self._data.ndim:
            raise ValueError(
                f"dims {dims} do not match array of rank {self._data.ndim}"
            )
        self.dims = dims
        self.attrs = dict(attrs or {})
        self.name = name

    # -- numpy-ish surface ------------------------------------------------
    @property
    def values(self):
        return self._data

    @property
    def data(self):
        return self._data

    @property
    def shape(self):
        return self._data.shape

    @property
    def dtype(self):
        return self._data.dtype

    @property
    def size(self):
        return self._data.size

    @property
    def ndim(self):
        return self._data.ndim

    def __len__(self):
        return len(self._data)

    def __array__(self, dtype=None):
        return np.asarray(self._data, dtype=dtype)

    def __float__(self):
        return float(self._data)

    def __getitem__(self, key):
        out = self._data[key]
        if not isinstance(key, tuple):
            key = (key,)
        # dims survive slices/1-D fancy indexing, disappear under integer
        # indexing; keys this bookkeeping cannot label (np.newaxis inserts
        # a dim, multi-dim boolean masks consume several) fail loudly
        # instead of returning silently mislabeled dims
        for k in key:
            if k is None:
                raise TypeError(
                    "xrlite DataArray does not support np.newaxis "
                    "indexing; index .values instead"
                )
            if isinstance(k, np.ndarray) and k.dtype == bool and k.ndim > 1:
                raise TypeError(
                    "xrlite DataArray does not support multi-dimensional "
                    "boolean masks; index .values instead"
                )
        kept = []
        dim_i = 0
        for k in key:
            if k is Ellipsis:
                n_explicit = len([kk for kk in key if kk is not Ellipsis])
                while dim_i < self.ndim - (n_explicit - len(kept)):
                    kept.append(self.dims[dim_i])
                    dim_i += 1
                continue
            if isinstance(k, (int, np.integer)):
                dim_i += 1
            else:
                kept.append(self.dims[dim_i])
                dim_i += 1
        kept.extend(self.dims[dim_i:])
        return DataArray(out, dims=tuple(kept), attrs=dict(self.attrs))

    def min(self, skipna=True):
        arr = self._data
        return DataArray(np.nanmin(arr) if skipna else np.min(arr), dims=())

    def max(self, skipna=True):
        arr = self._data
        return DataArray(np.nanmax(arr) if skipna else np.max(arr), dims=())

    def mean(self, skipna=True):
        arr = self._data
        return DataArray(np.nanmean(arr) if skipna else np.mean(arr), dims=())

    def astype(self, dtype):
        return DataArray(self._data.astype(dtype), dims=self.dims, attrs=dict(self.attrs))

    def expand_dims(self, dim_sizes, axis=1):
        """Insert new axes (dict of dim name -> coord list, xarray-style)."""
        out = self
        for name in dim_sizes:
            data = np.expand_dims(out._data, axis=axis)
            dims = out.dims[:axis] + (name,) + out.dims[axis:]
            out = DataArray(data, dims=dims, attrs=dict(out.attrs))
        return out

    def __repr__(self):
        return f"<xrlite.DataArray {self.dims} {self.shape} {self.dtype}>"


class Dataset:
    """A mapping of variable name -> DataArray (subset of ``xarray.Dataset``)."""

    def __init__(self, data_vars=None, attrs=None):
        self._vars: dict[str, DataArray] = {}
        self.attrs = dict(attrs or {})
        if data_vars:
            for name, da in data_vars.items():
                self[name] = da

    # -- mapping surface --------------------------------------------------
    def __getitem__(self, name) -> DataArray:
        return self._vars[name]

    def __setitem__(self, name, value):
        if isinstance(value, tuple) and len(value) == 2:
            dims, data = value
            value = DataArray(data, dims=dims)
        elif not isinstance(value, DataArray):
            value = DataArray(value)
        # validate shared dimension sizes
        for dim, size in zip(value.dims, value.shape):
            existing = self.dims.get(dim)
            if existing is not None and existing != size:
                raise ValueError(
                    f"dimension {dim!r} size {size} conflicts with existing {existing}"
                )
        value.name = name
        self._vars[name] = value

    def __contains__(self, name):
        return name in self._vars

    def __iter__(self):
        return iter(self._vars)

    def __delitem__(self, name):
        del self._vars[name]

    @property
    def variables(self):
        return dict(self._vars)

    @property
    def data_vars(self):
        return dict(self._vars)

    @property
    def dims(self):
        d = {}
        for da in self._vars.values():
            for dim, size in zip(da.dims, da.shape):
                d[dim] = size
        return d

    def copy(self):
        out = Dataset(attrs=dict(self.attrs))
        for name, da in self._vars.items():
            out[name] = DataArray(
                np.array(da.values, copy=True), dims=da.dims, attrs=dict(da.attrs)
            )
        return out

    def isel(self, **indexers):
        out = Dataset(attrs=dict(self.attrs))
        for name, da in self._vars.items():
            key = tuple(
                indexers.get(dim, slice(None)) for dim in da.dims
            )
            sub = da[key]
            out[name] = sub
        return out

    # -- IO ----------------------------------------------------------------
    def _record_dim(self):
        """The dimension to write as the netCDF record (UNLIMITED) dim.

        netCDF3's per-variable ``vsize`` is a 32-bit field (and scipy packs
        it signed), so a fixed variable may not exceed 2 GiB even in
        64-bit-offset files — but a RECORD variable's vsize is per-record,
        so data grows unbounded along the record dimension.  Production
        case-stacked EO data is exactly that shape: pick the leading dim of
        the largest variable (the case/box axis), provided every variable
        using it has it in first position (a netCDF3 requirement)."""
        best, best_bytes = None, -1
        for da in self._vars.values():
            if da.ndim > 0 and da.values.nbytes > best_bytes:
                best, best_bytes = da.dims[0], da.values.nbytes
        if best is None:
            return None
        for da in self._vars.values():
            if best in da.dims[1:]:
                return None  # record dim must be leading everywhere
        return best

    def to_netcdf(self, path, engine=None, format=None):
        # format="NETCDF4": HDF5-based classic-model write via the
        # built-in writer (data/h5nc.py — dimension scales +
        # DIMENSION_LIST, contiguous or chunked+deflate)
        if format and str(format).upper().startswith("NETCDF4"):
            from .h5nc import write_h5_dataset

            return write_h5_dataset(self, path)
        from scipy.io import netcdf_file

        # default: version=2 = netCDF3 64-bit-offset: file and variable
        # offsets past 2 GiB work — required at production EOCIS dataset
        # sizes (the reference's datasets are "netcdf4 file(s)",
        # reference cli/train_cae.py:20-23; CDF-2 + a record dim is the
        # closest envelope scipy can write).
        rec_dim = self._record_dim()
        f = netcdf_file(path, "w", version=2)
        try:
            for dim, size in self.dims.items():
                f.createDimension(dim, None if dim == rec_dim else size)
            for name, da in self._vars.items():
                arr = da.values
                if arr.dtype == np.float64:
                    arr = arr  # netCDF3 supports doubles
                elif arr.dtype not in (
                    np.dtype(np.float32),
                    np.dtype(np.int32),
                    np.dtype(np.int16),
                    np.dtype(np.int8),
                ):
                    arr = arr.astype(np.float64)
                var = f.createVariable(name, arr.dtype, da.dims)
                var[:] = arr
                for k, v in da.attrs.items():
                    setattr(var, k, v)
            for k, v in self.attrs.items():
                setattr(f, k, v)
        finally:
            f.close()

    def __repr__(self):
        lines = ["<xrlite.Dataset>"]
        for name, da in self._vars.items():
            lines.append(f"  {name}{da.dims}: {da.shape} {da.dtype}")
        return "\n".join(lines)


#: file signatures: netCDF3 classic / 64-bit-offset vs netCDF4 (= HDF5)
_NC3_MAGICS = (b"CDF\x01", b"CDF\x02")
_HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"


def _check_signature(path):
    """Fail with an actionable message on non-netCDF3 inputs.

    scipy's raw ``TypeError: not a valid NetCDF 3 file`` tells the user
    nothing about WHY their (perfectly valid) netCDF4 file is rejected or
    what to install; production EOCIS data is netCDF4/HDF5
    (reference ``cli/train_cae.py:20-23``)."""
    try:
        with open(path, "rb") as fh:
            head = fh.read(8)
    except OSError:
        return  # let scipy raise its own (file-not-found etc.) error
    if head[:4] in _NC3_MAGICS:
        return
    from .h5nc import is_hdf5

    if is_hdf5(path):  # signature at 0 OR 512/1024/... (user blocks)
        # reachable only from netCDF3-specific contexts (e.g. NC3File on
        # an HDF5 file); open_dataset and DiskStreamDataset route HDF5 to
        # the built-in netCDF4 reader (data/h5nc.py) before getting here
        raise ValueError(
            f"{path!s} is a netCDF4/HDF5 file, but this code path is "
            "netCDF3-specific. Open it via xrlite.open_dataset / "
            "DiskStreamDataset (built-in netCDF4 reader, data/h5nc.py) "
            "or install xarray+netcdf4 — cae_tools_tpu.xrcompat prefers "
            "them automatically."
        )
    if head[:4] == b"CDF\x05":
        raise ValueError(
            f"{path!s} is a netCDF3 64-bit-data (CDF-5) file. This "
            "build's bundled netCDF backend (xrlite) reads classic and "
            "64-bit-offset netCDF3 (CDF-1/CDF-2) only. Convert the file "
            "first (e.g. `nccopy -k 64-bit-offset in.nc out.nc`) or "
            "install xarray+netcdf4."
        )
    raise ValueError(
        f"{path!s} is not a netCDF file (bad magic {head[:4]!r}); "
        "expected netCDF3 (CDF\\x01/CDF\\x02) or netCDF4/HDF5."
    )


def open_dataset(path, engine=None) -> Dataset:
    from scipy.io import netcdf_file

    from .h5nc import is_hdf5

    if is_hdf5(path):  # signature at 0 OR 512/1024/... (user blocks)
        # netCDF4/HDF5: the built-in from-the-spec reader (data/h5nc.py —
        # superblock v0-v3, contiguous/chunked layouts, gzip+shuffle,
        # DIMENSION_LIST dimension resolution); raises an actionable
        # H5Error naming any feature outside the classic-model envelope
        from .h5nc import read_h5_dataset

        return read_h5_dataset(path)
    _check_signature(path)
    f = netcdf_file(path, "r", mmap=False)
    try:
        ds = Dataset()
        for name, var in f.variables.items():
            arr = np.asarray(var[:])
            # normalise scipy's big-endian views to native order
            if arr.dtype.byteorder == ">":
                arr = arr.astype(arr.dtype.newbyteorder("="))
            attrs = {
                k: _decode_attr(v)
                for k, v in getattr(var, "_attributes", {}).items()
            }
            ds[name] = DataArray(arr, dims=var.dimensions, attrs=attrs)
        ds.attrs = {
            k: _decode_attr(v) for k, v in getattr(f, "_attributes", {}).items()
        }
        return ds
    finally:
        f.close()


def concat(datasets, dim) -> Dataset:
    """Concatenate datasets along ``dim`` (subset of ``xarray.concat``)."""
    datasets = list(datasets)
    if not datasets:
        raise ValueError("cannot concat an empty list of datasets")
    if len(datasets) == 1:
        return datasets[0]
    out = Dataset(attrs=dict(datasets[0].attrs))
    for name, first in datasets[0].variables.items():
        if dim in first.dims:
            axis = first.dims.index(dim)
            arrs = [d[name].values for d in datasets]
            out[name] = DataArray(
                np.concatenate(arrs, axis=axis), dims=first.dims, attrs=dict(first.attrs)
            )
        else:
            out[name] = first
    return out


def open_mfdataset(paths, concat_dim=None, combine="nested", engine=None) -> Dataset:
    """Open one or more netCDF files, concatenated along ``concat_dim``
    (parity with reference ``cli/train_cae.py:58-59``)."""
    if isinstance(paths, str):
        paths = [paths]
    datasets = [open_dataset(p) for p in paths]
    if len(datasets) == 1:
        return datasets[0]
    if concat_dim is None:
        raise ValueError("concat_dim required for multiple paths")
    # the files' record dimension may be named differently from concat_dim;
    # concat along each variable's leading dim, as nested-combine does in
    # practice for the reference's (box, channel, y, x) layout
    lead = None
    for name, da in datasets[0].variables.items():
        if da.ndim > 0:
            lead = da.dims[0]
            break
    return concat(datasets, concat_dim if concat_dim in datasets[0].dims else lead)
