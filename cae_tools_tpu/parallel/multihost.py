"""Multi-host (multi-process) utilities.

The reference has no distributed backend (SURVEY.md §2 parallelism note);
the TPU-native equivalent is JAX's multi-controller runtime: one Python
process per host, ICI collectives inside a slice, DCN across slices.  These
helpers cover the standard recipe (SURVEY.md §5 "Distributed communication
backend"):

 * :func:`initialize` — ``jax.distributed.initialize`` wrapper, no-op when
   single-process (so the same entry point works everywhere)
 * :func:`global_batch_from_local` — assemble a globally-sharded batch from
   per-host local shards via ``jax.make_array_from_process_local_data``
 * :func:`is_primary` — rank-0 check for logging/checkpoint writes
"""

from __future__ import annotations

import os

import jax


def _looks_like_tpu_pod() -> bool:
    """Heuristic for a multi-host TPU pod slice (one process per host)."""
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return "," in hosts


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Start the multi-controller runtime when configured; else no-op.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    arguments are omitted (standard cluster launcher environment).  On a
    Cloud TPU pod slice with no explicit coordinator (the standard launch —
    JAX auto-detects peers from TPU metadata), an argless
    ``jax.distributed.initialize()`` is issued so multi-host runs can't
    silently degrade into independent single-host jobs.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        if _looks_like_tpu_pod():
            jax.distributed.initialize()
            return True
        return False  # single-process run
    kwargs = {"coordinator_address": coordinator_address}
    num_processes = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    return True


def is_primary() -> bool:
    return jax.process_index() == 0


def global_batch_from_local(mesh, local_arr, ndim=None):
    """Build a global batch-sharded array from this host's local rows.

    Each process loads only its own slice of the case dimension (host-local
    netCDF reads); the returned jax.Array is globally sharded on the mesh's
    "data" axis without any host gathering the full batch.
    """
    from .mesh import batch_sharding

    ndim = ndim if ndim is not None else local_arr.ndim
    return jax.make_array_from_process_local_data(
        batch_sharding(mesh, ndim), local_arr
    )
