"""Out-of-core dataset: multi-file netCDF3 -> normalised NHWC batches.

Removes the host-RAM cap on training data.  The reference opens its files
dask-lazily but immediately materializes them (reference
``cli/train_cae.py:58-59`` + ``models/ds_dataset.py:22-75`` ``.values``
access), and this framework's default :class:`~.dataset.ArrayDataset` is
in-RAM too.  This module streams instead:

* **pass 1 (stats)** — per file, per variable, chunked sequential reads
  through the fused NaN+min/max scan (C++ ``csrc/ingest.cpp`` when built,
  numpy otherwise): NaN fail-fast and the reference-format normalisation
  parameter list, never holding more than one chunk.
* **pass 2 (batches)** — :class:`DiskArray` is a lazy stand-in for the
  packed NHWC arrays ``ArrayDataset.arrays_nhwc`` returns: indexing it
  gathers rows via ``os.pread`` (``data/nc3.py``), normalises and packs
  them NCHW->NHWC (fused C++ pack when built) on the fly.  The
  :class:`~..train.stream.StreamingTrainer` consumes it unchanged — its
  host batch loop only ever does ``array[indices]`` — so peak host memory
  is O(batch), not O(dataset).

``ArrayDataset(disk_ds, ...)`` returns the configured ``disk_ds`` itself
(``dataset.ArrayDataset.__new__``), so every model's ``train()`` works
against disk-backed data without modification; ``train_cae`` builds one
with ``--host-memory-budget`` (see ``cli/train_cae.py``).
"""

from __future__ import annotations

import numpy as np

from .. import native
from .nc3 import NC3File

#: rows per chunk for the sequential stats scan
_SCAN_ROWS = 256


def open_row_reader(path):
    """Row reader for a netCDF file: ``NC3File`` (CDF-1/2) or ``H5File``
    (netCDF4/HDF5, ``data/h5nc.py``) by signature — both expose the same
    ``variables``/``n_rows``/``read_rows``/``close`` surface, so the
    out-of-core pipeline streams from either format."""
    from .h5nc import is_hdf5

    if is_hdf5(path):  # signature at 0 OR 512/1024/... (user blocks)
        from .h5nc import H5File

        return H5File(path)
    return NC3File(path)


def parse_size(text) -> int:
    """'512M' / '8G' / '1.5T' / plain bytes -> int bytes."""
    if text is None:
        return 0
    if isinstance(text, (int, float)):
        return int(text)
    s = str(text).strip().upper()
    mult = 1
    for suffix, m in (("K", 1 << 10), ("M", 1 << 20), ("G", 1 << 30),
                      ("T", 1 << 40)):
        if s.endswith(suffix + "B"):
            s, mult = s[:-2], m
            break
        if s.endswith(suffix):
            s, mult = s[:-1], m
            break
    return int(float(s) * mult)


class DiskArray:
    """Lazy NHWC float32 array view over a :class:`DiskStreamDataset`.

    Supports exactly the access pattern the streaming trainer and the
    chunked evaluator use: ``.shape``/``.dtype``/``.nbytes``/``len`` and
    ``a[indices]``/``a[slice]`` returning a materialized numpy batch.
    Normalisation flags/parameters are read from the parent at gather
    time, so ``set_normalise_output(False)`` &co. behave like they do on
    the in-RAM arrays.
    """

    disk_backed = True
    dtype = np.dtype(np.float32)

    def __init__(self, ds: "DiskStreamDataset", kind: str, shape: tuple):
        self._ds = ds
        self._kind = kind  # "x" | "y" | "m"
        self.shape = shape

    @property
    def nbytes(self):
        n = self.dtype.itemsize
        for s in self.shape:
            n *= s
        return n

    @property
    def ndim(self):
        return len(self.shape)

    def __len__(self):
        return self.shape[0]

    def __getitem__(self, key):
        if isinstance(key, slice):
            idx = np.arange(*key.indices(self.shape[0]))
        else:
            idx = np.asarray(key)
            if idx.ndim == 0:
                return self._ds._gather(self._kind, idx.reshape(1))[0]
        return self._ds._gather(self._kind, idx)

    def __repr__(self):
        return (
            f"<DiskArray {self._kind} {self.shape} f32 "
            f"({len(self._ds.files)} file(s), lazy)>"
        )


class DiskStreamDataset:
    """ArrayDataset-compatible dataset streamed from netCDF3 files on disk.

    Construct with the file paths (``train_cae --host-memory-budget``
    path); the variable lists and normalisation flags arrive when a model
    passes it through ``ArrayDataset(...)`` (``configure``), matching the
    reference's DSDataset construction point
    (reference ``conv_ae_model.py:272-289``).
    """

    def __init__(self, paths):
        if isinstance(paths, str):
            paths = [paths]
        if not paths:
            raise ValueError("DiskStreamDataset needs at least one file")
        self.paths = [str(p) for p in paths]
        self.files = [open_row_reader(p) for p in self.paths]
        self._configured = False
        self._issued_views = 0

    # -- configuration (ArrayDataset ctor surface) ------------------------
    def configure(
        self,
        input_variable_names,
        output_variable_name=None,
        normalise_in=True,
        normalise_out=True,
        mask_variable_name=None,
    ):
        same_vars = (
            self._configured
            and list(input_variable_names) == self.input_variable_names
            and output_variable_name == self.output_variable_name
            and mask_variable_name == self.mask_variable_name
        )
        # singleton semantics: ArrayDataset(disk_ds, ...) returns THIS
        # object, so DiskArray views handed out earlier read whatever
        # flags a later configure sets.  A re-configure that flips the
        # normalisation flags while views are outstanding would silently
        # change their gather behavior — refuse it instead of aliasing.
        if (
            self._issued_views
            and (normalise_in != self.normalise_in
                 or normalise_out != self.normalise_out)
        ):
            raise ValueError(
                "DiskStreamDataset is shared by reference: re-configuring "
                "with different normalisation flags while DiskArray views "
                "are outstanding would change their behavior; open a new "
                "DiskStreamDataset for a differently-normalised view"
            )
        self.normalise_in = normalise_in
        self.normalise_out = normalise_out
        if same_vars:
            return self
        self.input_variable_names = list(input_variable_names)
        self.output_variable_name = output_variable_name
        self.mask_variable_name = mask_variable_name

        # per-variable geometry from the first file; every file must agree
        f0 = self.files[0]
        self._var_shapes = {}
        for name in self.input_variable_names + (
            [output_variable_name] if output_variable_name else []
        ) + ([mask_variable_name] if mask_variable_name else []):
            if name not in f0.variables:
                # present-but-unsupported (h5nc defers the actionable
                # error to access): surface THAT error, not "not found"
                deferred = getattr(f0, "unsupported", {}).get(name)
                if deferred is not None:
                    raise deferred
                raise ValueError(
                    f"variable {name!r} not found in {self.paths[0]}"
                )
            v = f0.variables[name]
            if len(v.shape) not in (1, 4):
                raise ValueError(
                    f"variable {name} must be 4-D (N, chan, y, x) or a 1-D "
                    f"auxiliary predictor, got shape {v.shape}"
                )
            self._var_shapes[name] = v.row_shape
            for f, p in zip(self.files[1:], self.paths[1:]):
                if name not in f.variables:
                    deferred = getattr(f, "unsupported", {}).get(name)
                    if deferred is not None:  # unsupported in THIS file
                        raise deferred
                    raise ValueError(
                        f"variable {name!r} not found in {p}"
                    )
                if f.variables[name].row_shape != v.row_shape:
                    raise ValueError(
                        f"variable {name} has inconsistent shape in {p}"
                    )

        # case counts: every needed variable must share the leading dim —
        # validated here, because the fixed-layout pread would otherwise
        # return a *different variable's bytes* for the missing rows of an
        # externally-written short variable (silent corruption), or fail
        # mid-epoch with a raw short-read OSError
        lead_var = self.input_variable_names[0]
        counts = [f.n_rows(lead_var) for f in self.files]
        for name in self._var_shapes:
            for f, p, n_lead in zip(self.files, self.paths, counts):
                if f.n_rows(name) != n_lead:
                    raise ValueError(
                        f"variable {name} has {f.n_rows(name)} rows in {p} "
                        f"but {lead_var} has {n_lead}; all training "
                        "variables must share the leading (case) dimension"
                    )
        self._row_offsets = np.concatenate([[0], np.cumsum(counts)])
        self.n = int(self._row_offsets[-1])

        # derive the (C, Y, X) input geometry: 1-D aux predictors broadcast
        # to one constant channel of the 4-D input geometry, the
        # reference's scalar->(\box,1,y,x) rule (cli/train_cae.py:73-109)
        four_d = [
            n for n in self.input_variable_names
            if len(self._var_shapes[n]) == 3
        ]
        if not four_d:
            raise ValueError("at least one input variable must be 4-D")
        _, self.input_y, self.input_x = self._var_shapes[four_d[0]]
        self.input_spec = []
        self._chan_offsets = {}
        c = 0
        for name in self.input_variable_names:
            rs = self._var_shapes[name]
            nchan = rs[0] if len(rs) == 3 else 1
            self._chan_offsets[name] = c
            self.input_spec.append(
                {"name": name, "shape": [nchan, self.input_y, self.input_x]}
            )
            c += nchan
        self.input_chan = c

        if output_variable_name:
            oc, oy, ox = self._var_shapes[output_variable_name]
            self.output_chan, self.output_y, self.output_x = oc, oy, ox
            self.output_spec = {
                "name": output_variable_name,
                "shape": [oc, oy, ox],
            }
        else:
            self.output_chan = self.output_y = self.output_x = None
            self.output_spec = None

        self._scan_stats()
        self._configured = True
        return self

    # -- pass 1: chunked stats scan ----------------------------------------
    @staticmethod
    def _scan_chunk(arr):
        # one implementation of the normalisation-stats scan: delegate to
        # ArrayDataset._scan (numpy SIMD — measured 2x the native scan on
        # this single-core host; see its docstring) so the in-RAM and
        # disk-streamed paths cannot drift
        from .dataset import ArrayDataset

        return ArrayDataset._scan(arr)

    def _scan_var(self, name):
        lo, hi, nans = np.inf, -np.inf, 0
        for f in self.files:
            n = f.n_rows(name)
            for s in range(0, n, _SCAN_ROWS):
                rows = np.arange(s, min(n, s + _SCAN_ROWS))
                chunk = np.asarray(f.read_rows(name, rows), dtype=np.float32)
                c_lo, c_hi, c_nan = self._scan_chunk(chunk)
                nans += c_nan
                if c_nan < chunk.size:
                    lo = min(lo, c_lo)
                    hi = max(hi, c_hi)
        return float(lo), float(hi), nans

    def _scan_stats(self):
        self.min_inputs, self.max_inputs = {}, {}
        for name in self.input_variable_names:
            lo, hi, nans = self._scan_var(name)
            if nans:
                raise ValueError(
                    f"input variable {name} contains {nans} NaN values"
                )
            self.min_inputs[name] = lo
            self.max_inputs[name] = hi
        if self.output_variable_name:
            lo, hi, nans = self._scan_var(self.output_variable_name)
            if nans:
                raise ValueError(
                    f"output variable contains {nans} NaN values"
                )
            self.min_output, self.max_output = lo, hi
        else:
            self.min_output = self.max_output = None

    # -- ArrayDataset parity surface ----------------------------------------
    def set_normalise_output(self, normalise_out):
        self.normalise_out = normalise_out

    def get_normalisation_parameters(self):
        return [
            self.min_inputs, self.max_inputs, self.min_output, self.max_output
        ]

    def set_normalisation_parameters(self, parameters):
        (self.min_inputs, self.max_inputs,
         self.min_output, self.max_output) = tuple(parameters)

    def get_input_shape(self):
        return (self.input_chan, self.input_y, self.input_x)

    def get_output_shape(self):
        return (self.output_chan, self.output_y, self.output_x)

    def get_input_spec(self):
        return self.input_spec

    def get_output_spec(self):
        return self.output_spec

    def normalise_output(self, arr):
        if not self.normalise_out:
            return arr
        return (arr - self.min_output) / (self.max_output - self.min_output)

    def denormalise_output(self, arr, force=False):
        if force or self.normalise_out:
            return self.min_output + arr * (self.max_output - self.min_output)
        return arr

    def __len__(self):
        return self.n

    def arrays_nhwc(self):
        """Lazy (x, y, m) NHWC views; indexing materializes batches."""
        self._issued_views += 1
        x = DiskArray(
            self, "x", (self.n, self.input_y, self.input_x, self.input_chan)
        )
        y = m = None
        if self.output_variable_name:
            y = DiskArray(
                self, "y",
                (self.n, self.output_y, self.output_x, self.output_chan),
            )
            m = DiskArray(
                self, "m",
                (self.n, self.output_y, self.output_x, self.output_chan),
            )
        return x, y, m

    # -- per-item access (report tooling parity) ----------------------------
    def __getitem__(self, index):
        """(in CHW, out CHW, mask CHW, label) like ArrayDataset."""
        idx = np.asarray([index])
        in_arr = self._gather("x", idx)[0].transpose(2, 0, 1)
        out_arr = mask = None
        if self.output_variable_name:
            out_arr = self._gather("y", idx)[0].transpose(2, 0, 1)
            mask = self._gather("m", idx)[0].transpose(2, 0, 1)
        return in_arr, out_arr, mask, f"image{index}"

    # -- batch assembly ------------------------------------------------------
    def _locate(self, idx):
        """global row indices -> list of (file_no, local_rows, out_pos)."""
        idx = np.asarray(idx, dtype=np.int64)
        file_no = np.searchsorted(self._row_offsets, idx, side="right") - 1
        groups = []
        for fn in np.unique(file_no):
            sel = np.nonzero(file_no == fn)[0]
            groups.append((int(fn), idx[sel] - self._row_offsets[fn], sel))
        return groups

    @staticmethod
    def _pack(src, dst, lo, hi, c_off):
        """Normalise NCHW rows into the NHWC dst at channel offset."""
        src = np.ascontiguousarray(src, dtype=np.float32)
        if native.normalize_pack(src, dst, lo, hi, c_off):
            return
        rng = hi - lo
        norm = (src - lo) / rng if rng != 0.0 else np.zeros_like(src)
        c = src.shape[1]
        dst[..., c_off:c_off + c] = norm.transpose(0, 2, 3, 1)

    def _norm_idx(self, idx) -> np.ndarray:
        """numpy-compatible row indexing: boolean masks and negative
        indices behave exactly as they do on the in-RAM arrays
        ``ArrayDataset.arrays_nhwc`` returns (the declared parity
        surface); out-of-range rows raise IndexError instead of
        surfacing as a raw pread OSError."""
        idx = np.asarray(idx)
        if idx.dtype == np.bool_:
            if idx.shape != (self.n,):
                raise IndexError(
                    f"boolean mask of shape {idx.shape} does not match "
                    f"dataset length {self.n}"
                )
            return np.nonzero(idx)[0].astype(np.int64)
        idx = idx.astype(np.int64)
        idx = np.where(idx < 0, idx + self.n, idx)
        if idx.size and (idx.min() < 0 or idx.max() >= self.n):
            raise IndexError(
                f"row index out of range for dataset of length {self.n}"
            )
        return idx

    def _gather(self, kind, idx) -> np.ndarray:
        idx = self._norm_idx(idx)
        b = idx.shape[0]
        if kind == "x":
            out = np.empty(
                (b, self.input_y, self.input_x, self.input_chan), np.float32
            )
            for fn, local, pos in self._locate(idx):
                f = self.files[fn]
                # single-file batches (the common case) pack straight into
                # `out`; multi-file batches pack a compact per-file buffer
                # and scatter it to the rows' original batch positions
                direct = pos.shape[0] == b and np.array_equal(
                    pos, np.arange(b)
                )
                buf = out if direct else np.empty(
                    (local.shape[0], self.input_y, self.input_x,
                     self.input_chan),
                    np.float32,
                )
                for name in self.input_variable_names:
                    c_off = self._chan_offsets[name]
                    lo = self.min_inputs[name] if self.normalise_in else 0.0
                    hi = self.max_inputs[name] if self.normalise_in else 1.0
                    rows = f.read_rows(name, local)
                    if rows.ndim == 1:  # 1-D aux -> constant channel
                        rng = hi - lo
                        vals = (
                            (rows.astype(np.float32) - lo) / rng
                            if rng != 0.0
                            else np.zeros(rows.shape[0], np.float32)
                        )
                        buf[:, :, :, c_off] = vals[:, None, None]
                    else:
                        self._pack(rows, buf, lo, hi, c_off)
                if not direct:
                    out[pos] = buf
            return out
        if kind == "y":
            name = self.output_variable_name
            lo = self.min_output if self.normalise_out else 0.0
            hi = self.max_output if self.normalise_out else 1.0
            out = np.empty(
                (b, self.output_y, self.output_x, self.output_chan),
                np.float32,
            )
            for fn, local, pos in self._locate(idx):
                rows = self.files[fn].read_rows(name, local)
                tmp = np.empty_like(out[:rows.shape[0]])
                self._pack(rows, tmp, lo, hi, 0)
                out[pos] = tmp
            return out
        if kind == "m":
            out = np.ones(
                (b, self.output_y, self.output_x, self.output_chan),
                np.float32,
            )
            if self.mask_variable_name:
                for fn, local, pos in self._locate(idx):
                    rows = self.files[fn].read_rows(
                        self.mask_variable_name, local
                    )
                    tmp = np.empty_like(out[:rows.shape[0]])
                    self._pack(rows, tmp, 0.0, 1.0, 0)
                    out[pos] = tmp
            return out
        raise ValueError(f"unknown gather kind {kind!r}")

    def total_file_bytes(self):
        import os

        return sum(os.path.getsize(p) for p in self.paths)

    def close(self):
        for f in self.files:
            f.close()
