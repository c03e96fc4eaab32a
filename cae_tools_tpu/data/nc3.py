"""Random-access netCDF3 row reader for out-of-core ingest.

scipy's ``netcdf_file`` materializes whole variables; streaming training
(``data/diskstream.py``) instead needs *row* (leading-dim slice) reads at
arbitrary offsets.  netCDF3 (classic ``CDF\\x01`` and 64-bit-offset
``CDF\\x02``) has a fully offset-addressable layout — fixed variables are
contiguous at ``begin``, record variables are interleaved per record with a
fixed ``recsize`` stride — so row reads are plain ``os.pread`` calls and the
host never holds more than the requested rows.

Format reference: the NetCDF Classic Format Specification (the same layout
scipy.io.netcdf_file reads/writes).  The reference framework reads its data
through xarray/netcdf4 and materializes everything
(reference ``models/ds_dataset.py:22-75``); there is no reference
counterpart to this reader.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import numpy as np

#: nc_type -> (numpy big-endian dtype, itemsize)
_TYPES = {
    1: (">i1", 1),  # NC_BYTE
    2: ("S1", 1),   # NC_CHAR
    3: (">i2", 2),  # NC_SHORT
    4: (">i4", 4),  # NC_INT
    5: (">f4", 4),  # NC_FLOAT
    6: (">f8", 8),  # NC_DOUBLE
}

_ZERO = 0x00
_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C


@dataclass
class VarInfo:
    name: str
    dims: tuple          # dimension names
    shape: tuple         # full shape (record dim resolved to numrecs)
    dtype: np.dtype      # big-endian on-disk dtype
    begin: int           # file offset of the variable's data
    vsize: int           # per-variable (record) size incl. padding
    is_record: bool

    @property
    def row_shape(self):
        return self.shape[1:] if self.shape else ()

    @property
    def row_nbytes(self):
        n = self.dtype.itemsize
        for s in self.row_shape:
            n *= s
        return n


class _Reader:
    def __init__(self, f):
        self.f = f

    def i4(self):
        return struct.unpack(">i", self.f.read(4))[0]

    def u4(self):
        return struct.unpack(">I", self.f.read(4))[0]

    def i8(self):
        return struct.unpack(">q", self.f.read(8))[0]

    def name(self):
        n = self.u4()
        s = self.f.read(n)
        self.f.read((-n) % 4)  # 4-byte alignment padding
        return s.decode("utf-8", errors="replace")

    def skip_attrs(self):
        tag = self.u4()
        count = self.u4()
        if tag == _ZERO:  # ABSENT
            return
        if tag != _NC_ATTRIBUTE:
            raise ValueError(f"bad attribute-list tag 0x{tag:x}")
        for _ in range(count):
            self.name()
            nc_type = self.u4()
            nelems = self.u4()
            size = nelems * _TYPES[nc_type][1]
            self.f.read(size + ((-size) % 4))


class NC3File:
    """Header-parsed netCDF3 file with pread row access.

    ``n_rows(var)``: size of the variable's leading dimension.
    ``read_rows(var, rows)``: gather the given leading-dim indices into a
    native-endian array of shape ``(len(rows), *row_shape)``.
    """

    def __init__(self, path):
        self.path = str(path)
        with open(self.path, "rb") as f:
            magic = f.read(4)
            if magic[:3] != b"CDF" or magic[3] not in (1, 2):
                from .xrlite import _check_signature

                _check_signature(self.path)  # actionable HDF5/junk errors
                raise ValueError(f"{self.path}: not a netCDF3 file")
            version = magic[3]
            r = _Reader(f)
            numrecs = r.i4()  # -1 = STREAMING (numrecs unknown)

            dims = []
            tag = r.u4()
            ndims = r.u4()
            if tag == _NC_DIMENSION:
                for _ in range(ndims):
                    dims.append((r.name(), r.u4()))
            elif tag != _ZERO:
                raise ValueError(f"bad dimension-list tag 0x{tag:x}")

            r.skip_attrs()  # global attributes

            self.variables: dict[str, VarInfo] = {}
            tag = r.u4()
            nvars = r.u4()
            if tag == _NC_VARIABLE:
                for _ in range(nvars):
                    nm = r.name()
                    nd = r.u4()
                    dimids = [r.u4() for _ in range(nd)]
                    r.skip_attrs()
                    nc_type = r.u4()
                    vsize = r.u4()
                    begin = r.i8() if version == 2 else r.u4()
                    dim_names = tuple(dims[i][0] for i in dimids)
                    shape = tuple(dims[i][1] for i in dimids)
                    is_record = nd > 0 and shape[0] == 0
                    self.variables[nm] = VarInfo(
                        name=nm,
                        dims=dim_names,
                        shape=shape,
                        dtype=np.dtype(_TYPES[nc_type][0]),
                        begin=begin,
                        vsize=vsize,
                        is_record=is_record,
                    )
            elif tag != _ZERO:
                raise ValueError(f"bad variable-list tag 0x{tag:x}")

        # per-record stride = sum of record variables' vsize (the spec
        # stores a single record var's vsize unpadded, so summing the
        # stored fields handles the special case for free).  vsize is a
        # 32-bit field; the spec reserves 2^32-1 as a sentinel for
        # variables whose true size exceeds it — recompute those from the
        # dtype/shape (padded to 4 bytes, unpadded when it is the sole
        # record variable) instead of poisoning every record offset.
        rec_vars = [v for v in self.variables.values() if v.is_record]
        for v in rec_vars:
            if v.vsize == 0xFFFFFFFF:
                raw = v.row_nbytes
                v.vsize = raw if len(rec_vars) == 1 else raw + ((-raw) % 4)
        self.recsize = sum(v.vsize for v in rec_vars)
        if numrecs < 0 and self.recsize:  # STREAMING: infer from file size
            first = min(
                v.begin for v in self.variables.values() if v.is_record
            )
            numrecs = (os.path.getsize(self.path) - first) // self.recsize
        self.numrecs = max(0, numrecs)
        for v in self.variables.values():
            if v.is_record:
                v.shape = (self.numrecs,) + v.shape[1:]

        self._fd = os.open(self.path, os.O_RDONLY)

    def close(self):
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass

    def n_rows(self, var: str) -> int:
        v = self.variables[var]
        return v.shape[0] if v.shape else 1

    def read_rows(self, var: str, rows) -> np.ndarray:
        """Gather leading-dim slices; returns native-endian ndarray."""
        v = self.variables[var]
        rows = np.asarray(rows, dtype=np.int64)
        row_nbytes = v.row_nbytes
        stride = self.recsize if v.is_record else row_nbytes
        out = np.empty((rows.shape[0],) + v.row_shape, dtype=v.dtype)
        flat = out.reshape(rows.shape[0], -1)
        # coalesce runs of consecutive rows into single preads (cheap win
        # for fixed variables and single-record-var files, where
        # stride == row_nbytes makes consecutive rows contiguous on disk)
        contiguous = stride == row_nbytes
        j = 0
        n = rows.shape[0]
        while j < n:
            k = j + 1
            if contiguous:
                while k < n and rows[k] == rows[k - 1] + 1:
                    k += 1
            count = k - j
            data = os.pread(
                self._fd, row_nbytes * count, v.begin + int(rows[j]) * stride
            )
            if len(data) != row_nbytes * count:
                raise IOError(
                    f"{self.path}:{var} short read at row {int(rows[j])}"
                )
            flat[j:k] = np.frombuffer(data, dtype=v.dtype).reshape(count, -1)
            j = k
        if out.dtype.byteorder == ">":
            out = out.astype(out.dtype.newbyteorder("="))
        return out
