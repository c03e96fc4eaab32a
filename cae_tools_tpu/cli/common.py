"""Shared CLI helpers: dataset opening and 1-D auxiliary-variable broadcast.

The reference CLIs accept variables stored per-case as 1-D ``(box,)`` arrays
(e.g. tide height) and broadcast them to ``(box, 1, y, x)`` channels before
training/applying (``cli/train_cae.py:73-109``, ``cli/apply_cae.py:74-85``).
"""

from __future__ import annotations

import numpy as np

from ..xrcompat import xr


def add_devices_flag(parser):
    """``--devices N|all`` — DP mesh size for train/apply (additive to the
    single-device reference; SURVEY.md §2 parallelism note)."""
    parser.add_argument(
        "--devices", type=str, default=None,
        help="run data-parallel over N accelerator devices "
        "('all' = every visible device; default: single device)",
    )
    return parser


def mesh_from_flag(value):
    """Resolve ``--devices`` to a jax mesh (or None for single-device).

    Accepts ``N`` (N-way data parallelism), ``NxM`` (N-way data x M-way
    model/tensor parallelism — e.g. ``4x2``), or ``all``/``auto``."""
    if not value:
        return None
    import jax

    from ..parallel.mesh import get_mesh

    available = len(jax.devices())
    n_model = 1
    value = str(value).strip().lower()
    try:
        if value in ("all", "auto"):
            n = available
        elif "x" in value:
            d, m = value.split("x", 1)
            n_data, n_model = int(d), int(m)
            if n_data < 1 or n_model < 1:
                raise ValueError(value)  # 8x0 etc: reject, don't silently
            n = n_data * n_model        # fall through to single-device
        else:
            n = int(value)
            if n < 1:
                raise ValueError(value)
    except ValueError:
        raise SystemExit(
            f"--devices {value!r} not understood: use N, NxM (e.g. 4x2), "
            "or all/auto"
        )
    if n > available:
        raise SystemExit(
            f"--devices {value} requests {n} devices but only {available} "
            f"visible ({[d.platform for d in jax.devices()][:4]}...)"
        )
    if n <= 1:
        return None
    return get_mesh(n_data=n // n_model, n_model=n_model)


def enable_cli_compile_cache():
    """Persistent XLA compile cache for CLI runs (utils/compile_cache.py).

    On the tunneled TPU a cold conv graph costs 100-300+ s to remote-
    compile; caching makes repeat train/apply invocations start warm.
    Call before the first compilation; no-op when disabled/unavailable."""
    from ..utils.compile_cache import enable_compile_cache

    return enable_compile_cache()


def open_inputs(paths):
    """Open one or more netCDF files concatenated on the case dimension."""
    return xr.open_mfdataset(paths, concat_dim="box", combine="nested")


def broadcast_scalar_vars(ds, variable_names, case_dimension):
    """Expand any 1-D (case,) variable to (case, 1, y, x) in place."""
    dims = ds.dims
    y_name = "y1" if "y1" in dims else "y"
    x_name = "x1" if "x1" in dims else "x"
    y_dim = dims.get(y_name)
    x_dim = dims.get(x_name)
    for var in variable_names:
        if ds[var].dims == (case_dimension,):
            if y_dim is None or x_dim is None:
                raise ValueError(
                    f"cannot broadcast 1-D variable {var!r}: no y/x dimensions in dataset"
                )
            print(
                f"Variable '{var}' does not follow the dimension (box, channel, y, x). Extending dimensions..."
            )
            values = np.asarray(ds[var].values)
            expanded = np.broadcast_to(
                values[:, None, None, None].astype(np.float32),
                (values.shape[0], 1, y_dim, x_dim),
            ).copy()
            del ds[var]
            ds[var] = xr.DataArray(
                expanded, dims=(case_dimension, "channel", y_name, x_name)
            )
    return ds
