"""Device mesh and sharding layout.

The reference is single-device (``base_model.py:129-143``); scale here is
additive (SURVEY.md §2 parallelism note).  Strategy:

 * axis ``"data"`` — batch-dimension data parallelism, the economical
   strategy for small-image autoencoders.  Batches are sharded on their
   leading axis; gradient all-reduce is inserted by XLA when the jitted
   train step consumes sharded batches with replicated params.
 * axis ``"model"`` — optional tensor parallelism for the large
   flatten-adjacent dense layers (e.g. the LinearModel's
   ``(c*y*x) x (C*Y*X)`` weight, 16k x 65k at the reference's production
   geometry): weights are sharded on their output dimension and XLA
   inserts the reduce-scatter/all-gather pair over ICI.

Defaults keep every parameter replicated, which is optimal at the bundled
benchmark sizes; `shard_params_tp` opts large dense weights into TP.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_data=None, n_model=1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    dev_arr = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(dev_arr, axis_names=("data", "model"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, arr):
    """Place a host array onto the mesh, sharded on its leading axis.

    The leading axis is padded to a multiple of the data-axis size with
    repeated rows if needed; callers that care must mask the tail (training
    already pads to batch multiples host-side, so this is a no-op there).
    """
    n_data = mesh.shape["data"]
    n = arr.shape[0]
    if n % n_data != 0:
        pad = n_data - n % n_data
        arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)
    return jax.device_put(arr, batch_sharding(mesh, arr.ndim))


def shard_params_tp(params, mesh: Mesh, min_size: int = 1 << 20):
    """Place params on the mesh; large dense kernels sharded over "model".

    Any 2-D weight with >= ``min_size`` elements is sharded on its output
    (last) dimension; everything else is replicated.  Returns the params
    pytree as committed device arrays.
    """
    repl = replicated_sharding(mesh)
    n_model = int(mesh.shape["model"])

    def place(leaf):
        ndim = getattr(leaf, "ndim", None)
        if ndim is None:  # non-array leaf (python scalar)
            return leaf
        if (
            ndim == 2
            and leaf.size >= min_size
            and leaf.shape[1] % n_model == 0
            and n_model > 1
        ):
            return jax.device_put(
                leaf, NamedSharding(mesh, P(None, "model"))
            )
        return jax.device_put(leaf, repl)

    return jax.tree_util.tree_map(place, params)
