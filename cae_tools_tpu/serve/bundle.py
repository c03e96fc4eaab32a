"""Load and run a serving bundle.  Dependencies: jax + numpy only.

This module deliberately imports nothing else from the package (no model
classes, torch interop, netCDF) so a serving host can vendor the bundle
folder plus this file.  See serve/export.py for the bundle layout.
"""

from __future__ import annotations

import json
import os

import numpy as np


class ServingModel:
    """A deserialized bundle: ``predict(raw NHWC) -> denormalised NCHW``.

    Arbitrary case counts are padded to the exported per-dispatch batch and
    chunked (mirroring models/base.py::_pad_cases); outputs are trimmed back.
    """

    def __init__(self, folder):
        import jax
        from jax import export as jexport

        with open(os.path.join(folder, "manifest.json")) as f:
            self.manifest = json.loads(f.read())
        if self.manifest["format_version"] != 1:
            raise ValueError(
                f"unsupported bundle format {self.manifest['format_version']}"
            )
        with open(os.path.join(folder, "apply.jaxexport"), "rb") as f:
            self._exported = jexport.deserialize(bytearray(f.read()))
        with np.load(os.path.join(folder, "weights.npz")) as z:
            # keys are "<index>|<path>"; order by index into the flat list
            self.leaves = [
                z[k]
                for k in sorted(z.files, key=lambda k: int(k.split("|", 1)[0]))
            ]
        # ml_dtypes leaves (bf16 apply-dtype exports) are stored bit-cast
        # to same-width integers; view them back per the manifest record
        for i, want in enumerate(self.manifest.get("leaf_dtypes", [])):
            if str(self.leaves[i].dtype) != want:
                import ml_dtypes  # jax dependency; bundles stay torch-free

                self.leaves[i] = self.leaves[i].view(np.dtype(want))
        self.batch_size = int(self.manifest["batch_size"])
        self._in_lo = np.asarray(self.manifest["in_lo"], np.float32)
        self._in_scale = np.asarray(self.manifest["in_scale"], np.float32)
        self._out_lo = np.float32(self.manifest["out_lo"])
        self._out_rng = np.float32(self.manifest["out_rng"])

        # bind the graph's device assignment to this host: a DP bundle
        # (manifest "devices" > 1, exported with the batch sharded over a
        # "data" mesh) runs over the first N local devices; a single-device
        # bundle over device 0.  Weights and normalisation scalars are
        # placed once here (replicated on the mesh), not re-uploaded per
        # predict chunk.
        n_dev = int(self.manifest.get("devices", 1))
        if len(jax.devices()) < n_dev:
            raise ValueError(
                f"bundle was exported for {n_dev} devices; this host "
                f"presents {len(jax.devices())}"
            )
        if n_dev > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            self._mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
            repl = NamedSharding(self._mesh, P())
            self._batch_sharding = NamedSharding(self._mesh, P("data"))
        else:
            self._mesh = None
            repl = jax.devices()[0]
            self._batch_sharding = repl
        self._dev_leaves = [jax.device_put(l, repl) for l in self.leaves]
        self._dev_scalars = [
            jax.device_put(v, repl)
            for v in (self._in_lo, self._in_scale, self._out_lo, self._out_rng)
        ]

    @property
    def platforms(self):
        return tuple(self._exported.platforms)

    def predict(self, x_raw_nhwc: np.ndarray) -> np.ndarray:
        """Raw (N, H, W, C) physical inputs -> (N, C', Y, X) predictions."""
        import jax

        x = np.asarray(x_raw_nhwc, np.float32)
        b, h, w, c = self.manifest["input_shape_nhwc"]
        if x.ndim != 4 or x.shape[1:] != (h, w, c):
            raise ValueError(
                f"expected (N, {h}, {w}, {c}) input, got {x.shape}"
            )
        n = x.shape[0]
        if n == 0:
            import ml_dtypes  # noqa: F401  (registers bfloat16 with numpy)

            return np.zeros(
                (0,) + tuple(self.manifest["output_shape_nchw"][1:]),
                np.dtype(self.manifest.get("output_dtype", "float32")),
            )
        n_pad = -(-n // b) * b
        if n_pad != n:
            x = np.concatenate(
                [x, np.repeat(x[-1:], n_pad - n, axis=0)], axis=0
            )
        in_lo, in_scale, out_lo, out_rng = self._dev_scalars
        chunks = [
            np.asarray(
                self._exported.call(
                    self._dev_leaves,
                    jax.device_put(x[i : i + b], self._batch_sharding),
                    in_lo,
                    in_scale,
                    out_lo,
                    out_rng,
                )
            )
            for i in range(0, n_pad, b)
        ]
        return np.concatenate(chunks, axis=0)[:n]


def load_bundle(folder) -> ServingModel:
    return ServingModel(folder)
