"""Dataset adapter: netCDF/xarray variables -> device-ready arrays.

Equivalent of the reference ``DSDataset`` (``models/ds_dataset.py:20-183``)
redesigned for the TPU path: instead of per-item ``__getitem__`` feeding a
torch DataLoader, the whole dataset is validated, normalised and packed once
into contiguous NHWC float32 arrays that are placed on the device (or across
a mesh) in a single transfer.  Per-item access is retained for evaluation
parity and report tooling.

Behavioral parity preserved:
 * multiple input variables are concatenated along channel
   (``ds_dataset.py:34,142-146``)
 * min-max normalisation per input variable and for the output
   (``ds_dataset.py:99-113``); zero-range inputs normalise to 0.0
 * NaN values in any input or the output raise ``ValueError``
   (``ds_dataset.py:43-58``)
 * normalisation parameter list layout ``[min_inputs, max_inputs, min_output,
   max_output]`` (``ds_dataset.py:80-85``)

Fixed-forward (documented deviations from reference quirks):
 * ``denormalise_input`` advances the channel index per variable (the
   reference forgets to, ``ds_dataset.py:115-127``)
 * when no mask variable is configured the default mask has the *output*
   shape (the reference uses the input shape, ``ds_dataset.py:157``, which
   only broadcasts when input and output sizes coincide)
"""

from __future__ import annotations

import numpy as np

from .. import native


class ArrayDataset:
    def __new__(cls, ds=None, *args, **kwargs):
        # disk-backed path: a DiskStreamDataset passed where a raw
        # xarray-style dataset is expected configures itself and stands in
        # (same normalisation/spec/arrays_nhwc surface, lazy batches) —
        # this is what lets every model's train() run out-of-core without
        # modification (data/diskstream.py).  ``ds`` defaults to None so
        # the zero-arg ``cls.__new__(cls)`` that pickle/copy protocols use
        # keeps working.
        from .diskstream import DiskStreamDataset

        if isinstance(ds, DiskStreamDataset):
            return ds.configure(*args, **kwargs)
        return super().__new__(cls)

    def __init__(
        self,
        ds,
        input_variable_names,
        output_variable_name=None,
        normalise_in=True,
        normalise_out=True,
        mask_variable_name=None,
    ):
        self.ds = ds
        self.input_variable_names = list(input_variable_names)
        self.output_variable_name = output_variable_name
        self.normalise_in = normalise_in
        self.normalise_out = normalise_out
        self.input_spec = []
        self.output_spec = None

        self.min_inputs = {}
        self.max_inputs = {}
        self._input_arrays = []
        for name in self.input_variable_names:
            arr = np.asarray(ds[name].values, dtype=np.float32)
            if arr.ndim != 4:
                raise ValueError(
                    f"input variable {name} must be 4-D (N, chan, y, x), got {arr.shape}"
                )
            lo, hi, n_nan = self._scan(arr)
            if n_nan > 0:
                raise ValueError(
                    f"input variable {name} contains {n_nan} NaN values"
                )
            self._input_arrays.append(arr)
            self.input_spec.append({"name": name, "shape": list(arr.shape[1:])})
            self.min_inputs[name] = lo
            self.max_inputs[name] = hi

        self.n = self._input_arrays[0].shape[0]
        self.input_chan = sum(a.shape[1] for a in self._input_arrays)
        self.input_y = self._input_arrays[0].shape[2]
        self.input_x = self._input_arrays[0].shape[3]

        if mask_variable_name is not None:
            self._mask_array = np.asarray(
                ds[mask_variable_name].values, dtype=np.float32
            )
        else:
            self._mask_array = None

        if self.output_variable_name is not None:
            arr = np.asarray(ds[self.output_variable_name].values, dtype=np.float32)
            lo, hi, n_nan = self._scan(arr)
            if n_nan > 0:
                raise ValueError(
                    f"output variable contains {n_nan} NaN values"
                )
            self._output_array = arr
            self.output_chan, self.output_y, self.output_x = arr.shape[1:]
            self.min_output = lo
            self.max_output = hi
            self.output_spec = {
                "name": self.output_variable_name,
                "shape": list(arr.shape[1:]),
            }
        else:
            self._output_array = None
            self.output_chan = self.output_y = self.output_x = None
            self.min_output = None
            self.max_output = None

    @staticmethod
    def _scan(arr):
        """(min, max, nan_count).

        numpy's SIMD reductions win on this host (single-core VM; the fused
        C++ scan in cae_tools_tpu.native pays off only multi-core, measured
        0.5x here vs 52x for the pack) — so the scan stays numpy and the
        NHWC pack goes native.
        """
        nan_count = int(np.isnan(arr).sum())  # one boolean temporary
        if nan_count == arr.size:
            return float("nan"), float("nan"), nan_count
        return float(np.nanmin(arr)), float(np.nanmax(arr)), nan_count

    # ---- normalisation parameters (checkpoint format surface) -----------
    def set_normalise_output(self, normalise_out):
        self.normalise_out = normalise_out

    def get_normalisation_parameters(self):
        return [self.min_inputs, self.max_inputs, self.min_output, self.max_output]

    def set_normalisation_parameters(self, parameters):
        (self.min_inputs, self.max_inputs, self.min_output, self.max_output) = tuple(
            parameters
        )
        self._norm_version = getattr(self, "_norm_version", 0) + 1

    # ---- shapes ----------------------------------------------------------
    def get_input_shape(self):
        return (self.input_chan, self.input_y, self.input_x)

    def get_output_shape(self):
        return (self.output_chan, self.output_y, self.output_x)

    def get_input_spec(self):
        return self.input_spec

    def get_output_spec(self):
        return self.output_spec

    # ---- normalisation transforms ---------------------------------------
    def normalise_input(self, arr, input_name):
        if not self.normalise_in:
            return arr
        lo = self.min_inputs[input_name]
        hi = self.max_inputs[input_name]
        if hi - lo == 0:
            return np.zeros_like(arr) if hasattr(arr, "shape") else 0.0
        return (arr - lo) / (hi - lo)

    def normalise_output(self, arr):
        if not self.normalise_out:
            return arr
        return (arr - self.min_output) / (self.max_output - self.min_output)

    def denormalise_input(self, arr):
        if not self.normalise_in:
            return arr
        out = np.zeros(arr.shape, dtype=np.float32)
        c = 0
        for name, src in zip(self.input_variable_names, self._input_arrays):
            nchan = src.shape[1]
            lo = self.min_inputs[name]
            hi = self.max_inputs[name]
            out[:, c : c + nchan] = lo + arr[:, c : c + nchan] * (hi - lo)
            c += nchan
        return out

    def denormalise_output(self, arr, force=False):
        if force or self.normalise_out:
            return self.min_output + arr * (self.max_output - self.min_output)
        return arr

    # ---- whole-dataset device-ready arrays -------------------------------
    def packed_inputs_nchw(self) -> np.ndarray:
        """All inputs normalised + channel-concatenated, (N, C, Y, X) f32."""
        parts = [
            np.asarray(self.normalise_input(arr, name), dtype=np.float32)
            for name, arr in zip(self.input_variable_names, self._input_arrays)
        ]
        return np.concatenate(parts, axis=1)

    def packed_outputs_nchw(self):
        if self._output_array is None:
            return None
        return np.asarray(
            self.normalise_output(self._output_array), dtype=np.float32
        )

    def packed_mask_nchw(self) -> np.ndarray:
        if self._mask_array is not None and self._mask_array.size > 0:
            return np.asarray(self._mask_array, dtype=np.float32)
        if self._output_array is not None:
            shape = self._output_array.shape
        else:
            shape = (self.n, self.input_chan, self.input_y, self.input_x)
        return np.ones(shape, dtype=np.float32)

    def arrays_nhwc(self):
        """(inputs, outputs, mask) as NHWC float32 numpy arrays.

        NHWC is the TPU-native conv layout; the NCHW<->NHWC transpose happens
        exactly once here, on the host, before the single device transfer.
        Uses the fused C++ normalise+pack when built (cae_tools_tpu.native),
        falling back to numpy.  Results are memoised per normalisation
        configuration (train() packs and then evaluate() re-requests the
        same arrays — don't redo the multi-GB host pass).
        """
        cache_key = (
            self.normalise_in,
            self.normalise_out,
            getattr(self, "_norm_version", 0),
        )
        cache = getattr(self, "_nhwc_cache", None)
        if cache is None:
            cache = self._nhwc_cache = {}
        if cache_key in cache:
            return cache[cache_key]
        x = np.empty(
            (self.n, self.input_y, self.input_x, self.input_chan), np.float32
        )
        c = 0
        native_ok = True
        for name, src in zip(self.input_variable_names, self._input_arrays):
            lo = self.min_inputs[name] if self.normalise_in else 0.0
            hi = self.max_inputs[name] if self.normalise_in else 1.0
            if not native.normalize_pack(src, x, lo, hi, c):
                native_ok = False
                break
            c += src.shape[1]
        if not native_ok:
            x = np.ascontiguousarray(
                self.packed_inputs_nchw().transpose(0, 2, 3, 1)
            )

        y = None
        if self._output_array is not None:
            src = self._output_array
            lo = self.min_output if self.normalise_out else 0.0
            hi = self.max_output if self.normalise_out else 1.0
            y = np.empty(
                (src.shape[0], src.shape[2], src.shape[3], src.shape[1]),
                np.float32,
            )
            if not native.normalize_pack(src, y, lo, hi, 0):
                y = np.ascontiguousarray(
                    self.packed_outputs_nchw().transpose(0, 2, 3, 1)
                )

        msrc = self.packed_mask_nchw()
        m = np.empty(
            (msrc.shape[0], msrc.shape[2], msrc.shape[3], msrc.shape[1]),
            np.float32,
        )
        if not native.normalize_pack(msrc, m, 0.0, 1.0, 0):
            m = np.ascontiguousarray(msrc.transpose(0, 2, 3, 1))
        cache[cache_key] = (x, y, m)
        return x, y, m

    # ---- per-item access (evaluation/report parity) ----------------------
    def __getitem__(self, index):
        label = f"image{index}"
        in_arr = np.zeros(
            (self.input_chan, self.input_y, self.input_x), dtype=np.float32
        )
        c = 0
        for name, src in zip(self.input_variable_names, self._input_arrays):
            nchan = src.shape[1]
            in_arr[c : c + nchan] = self.normalise_input(src[index], name)
            c += nchan

        if self._output_array is not None:
            out_arr = self.normalise_output(self._output_array[index])
        else:
            out_arr = None

        if self._mask_array is not None and self._mask_array.size > 0:
            mask = self._mask_array[index].astype(np.float32)
        elif self._output_array is not None:
            mask = np.ones(self._output_array.shape[1:], dtype=np.float32)
        else:
            mask = np.ones(
                (self.input_chan, self.input_y, self.input_x), dtype=np.float32
            )
        return (in_arr, out_arr, mask, label)

    def __len__(self):
        return self.n
