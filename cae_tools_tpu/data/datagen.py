"""Synthetic netCDF fixture generation.

Regenerates the reference's test data families (reference
``test/datagen/gen.py:24-149``): a Gaussian ring ("circle"), a tide-modulated
ring with a 1-D auxiliary predictor ("tidal_circle"), and a radial gradient
("curve").  Each sample is rendered on a common grid whose height/width is the
least common multiple of the input and output sizes and then block-averaged
down to the low-res input and high-res output fields.  Values are in a
sea-surface-temperature-like range (~288K plus noise).

Output netCDF schema matches the reference layout so that files are
interchangeable: input var dims ``(n, chan, y1, x1)``, output var dims
``(n, chan, y2, x2)``, auxiliary predictors stored both as 1-D ``<name>_1d``
(attrs ``type=auxilary-predictor``) and broadcast to input-shaped channels.
"""

from __future__ import annotations

import math
import os
import random

import numpy as np
from scipy import ndimage

from ..xrcompat import xr
from .specs import all_specs


def _lcm(a: int, b: int) -> int:
    return a * b // math.gcd(a, b)


def _block_mean(arr: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Average non-overlapping (fy, fx) blocks (xr.coarsen().mean() parity)."""
    h, w = arr.shape
    return arr.reshape(h // fy, fy, w // fx, fx).mean(axis=(1, 3))


class DataGenerator:
    """Generate synthetic low-res/high-res sample pairs for one geometry."""

    def __init__(self, input_size, output_size, pattern="circle", rng=None):
        self.input_size = tuple(input_size)
        self.output_size = tuple(output_size)
        self.pattern = pattern
        self.rng = rng if rng is not None else random.Random()
        self.aux_data: dict[str, np.ndarray] = {}
        self.aux_data_range: dict[str, tuple] = {}
        if pattern == "tidal_circle":
            self.aux_data_range["tide"] = (-1.0, 1.0)
        self.n = 0

    def _render(self, index: int, height: int, width: int, mu: float = 1.0):
        if self.pattern == "circle":
            y, x = np.meshgrid(
                np.linspace(-2, 2, width), np.linspace(-3, 3, height)
            )
            d = np.sqrt(y * y + x * x)
            sigma = 0.2
            g = np.exp(-((d - mu) ** 2) / (2.0 * sigma**2))
            return ndimage.rotate(g, 15)[0:height, 0:width]
        if self.pattern == "tidal_circle":
            if "tide" not in self.aux_data:
                self.aux_data["tide"] = np.zeros((self.n,), dtype=np.float32)
            tide = math.sin(self.rng.random() * 2 * math.pi)
            self.aux_data["tide"][index] = tide
            y, x = np.meshgrid(
                np.linspace(-8, 8, width), np.linspace(-10, 10, height)
            )
            d = np.sqrt(y * y + x * x)
            sigma = 0.2 + 0.1 * tide
            g = np.exp(-((d - mu) ** 2) / (2.0 * sigma**2))
            return ndimage.rotate(g, 15)[0:height, 0:width]
        if self.pattern == "curve":
            y, x = np.meshgrid(
                np.linspace(0, 100, width), np.linspace(0, 100, height)
            )
            cx = cy = 50
            max_d = math.sqrt(50**2 + 50**2)
            return np.sqrt((y - cy) ** 2 + (x - cx) ** 2) / max_d
        raise ValueError(f"unknown pattern {self.pattern!r}")

    def generate_data(self, n: int):
        self.n = n
        self.aux_data = {}

        in_h, in_w = self.input_size
        out_h, out_w = self.output_size
        grid_h = _lcm(out_h, in_h)
        grid_w = _lcm(out_w, in_w)

        input_arr = np.zeros((n, 1, in_h, in_w), dtype=np.float32)
        output_arr = np.zeros((n, 1, out_h, out_w), dtype=np.float32)

        for i in range(n):
            base = (
                288.0
                + 5.0 * self.rng.random()
                + self._render(i, grid_h, grid_w) * self.rng.random() * 5.0
            )
            input_arr[i, 0] = _block_mean(base, grid_h // in_h, grid_w // in_w)
            output_arr[i, 0] = _block_mean(base, grid_h // out_h, grid_w // out_w)

        in_da = xr.DataArray(input_arr, dims=("n", "chan", "y1", "x1"))
        out_da = xr.DataArray(output_arr, dims=("n", "chan", "y2", "x2"))
        aux_das = {}
        for key, values in self.aux_data.items():
            lo, hi = self.aux_data_range[key]
            aux_das[key] = xr.DataArray(
                values,
                dims=("n",),
                attrs={
                    "type": "auxilary-predictor",
                    "min-value": lo,
                    "max-value": hi,
                },
            )
        return in_da, out_da, aux_das


def generate_spec_files(
    spec_name: str, data_root: str, n: int = 100, seed=None, force: bool = False
) -> str:
    """Write train.nc/test.nc for a named geometry spec; returns the folder."""
    spec = all_specs[spec_name]
    i_h, i_w = spec["input_size"]
    o_h, o_w = spec["output_size"]
    folder = os.path.join(data_root, spec_name, f"{i_h}x{i_w}_{o_h}x{o_w}")

    paths = [os.path.join(folder, f) for f in ("train.nc", "test.nc")]
    if not force and all(os.path.exists(p) for p in paths):
        return folder

    os.makedirs(folder, exist_ok=True)
    for file_idx, path in enumerate(paths):
        rng = random.Random(None if seed is None else seed + file_idx)
        dg = DataGenerator(
            spec["input_size"], spec["output_size"], spec["pattern"], rng=rng
        )
        in_da, out_da, aux_das = dg.generate_data(n)

        ds = xr.Dataset()
        ds[spec["output"]] = out_da
        input_names = spec["inputs"]
        ds[input_names[0]] = in_da
        input_idx = 1
        for key, aux in aux_das.items():
            ds[key + "_1d"] = aux
            # broadcast the scalar-per-case predictor to input-shaped channels
            arr = np.broadcast_to(
                np.asarray(aux.data, dtype=np.float32).reshape(n, 1, 1, 1),
                (n, 1, i_h, i_w),
            ).copy()
            ds[input_names[input_idx]] = xr.DataArray(
                arr, dims=("n", "chan", "y1", "x1")
            )
            input_idx += 1
        ds.to_netcdf(path)
    return folder


def main():  # pragma: no cover - CLI convenience
    data_root = os.path.join(os.path.dirname(__file__), "..", "..", "tests", "data")
    for name in all_specs:
        print("generating", name)
        generate_spec_files(name, data_root, n=100)


if __name__ == "__main__":  # pragma: no cover
    main()
