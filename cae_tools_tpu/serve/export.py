"""Export a trained model folder into a standalone serving bundle.

Bundle layout (a folder):

* ``apply.jaxexport`` — serialized :func:`jax.export.export` artifact of the
  serving function ``fn(leaves, x_raw, in_lo, in_scale, out_lo, out_rng)``
  at a fixed per-dispatch batch, where ``leaves`` is the flat
  ``jax.tree_util.tree_flatten((params, state))`` leaf list (the treedef is
  baked into the exported graph, so the loader never reconstructs pytree
  structure — a flat list always matches).  The graph folds the per-channel
  input normalisation affine, the model's eval forward (including the fused
  Pallas decoder tail with the output denormalisation folded into its final
  activation, models/base.py::_forward_denorm_nchw_p), and the NCHW output
  layout — one compiled call from raw physical inputs to denormalised
  predictions.
* ``weights.npz`` — the leaves, keyed ``"<index>|<tree path>"`` (the path
  part is informational; the loader orders by index).
* ``manifest.json`` — model type, batch, input/output specs, normalisation
  scalars, platforms, export metadata.

Normalisation scalars ride as *arguments* (mirroring the product apply
path), so a bundle served against a recalibrated sensor range reuses the
same compiled graph.

No reference counterpart (the reference deploys by re-running the training
package, ``cli/apply_cae.py:28-92``); additive subsystem.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

FORMAT_VERSION = 1

#: Pallas kernels lower to this custom call on TPU; jax.export flags any
#: custom call as non-portable unless explicitly allowed.  Serving bundles
#: are same-platform artifacts (the manifest records the platform list), so
#: allowing it is sound.
_TPU_CUSTOM_CALLS = ("tpu_custom_call",)


# --------------------------------------------------------------------------
# serving function
# --------------------------------------------------------------------------

def build_serving_fn(mt, treedef):
    """Pure fn: raw NHWC input batch -> denormalised NCHW f32 predictions.

    ``leaves`` is the flat (params, state) leaf list for ``treedef``.
    ``in_lo``/``in_scale`` are per-channel (C,) vectors (input min and
    1/(max-min), 0 for degenerate ranges — matching
    data/dataset.py::normalise_input); ``out_lo``/``out_rng`` are the output
    denormalisation scalars fed to the model's fused denorm forward.
    """

    def fn(leaves, x_raw, in_lo, in_scale, out_lo, out_rng):
        params, state = jax.tree_util.tree_unflatten(treedef, leaves)
        x = (x_raw.astype(jnp.float32) - in_lo) * in_scale
        return mt._forward_denorm_nchw_p(params, state, x, out_lo, out_rng)

    return fn


def _channel_norm_vectors(mt):
    """Per-channel input (lo, scale) from the model's normalisation list."""
    min_inputs, max_inputs, min_out, max_out = mt.normalisation_parameters
    lo_c, scale_c = [], []
    for item in mt.input_spec:
        name, n_chan = item["name"], int(item["shape"][0])
        if getattr(mt, "normalise_input", True):
            lo, hi = float(min_inputs[name]), float(max_inputs[name])
            # degenerate range: dataset maps the variable to all-zeros;
            # scale 0 with lo as the anchor reproduces that
            scale = 1.0 / (hi - lo) if hi != lo else 0.0
        else:
            lo, scale = 0.0, 1.0
        lo_c += [lo] * n_chan
        scale_c += [scale] * n_chan
    if getattr(mt, "normalise_output", True):
        out_lo, out_rng = float(min_out), float(max_out) - float(min_out)
    else:
        out_lo, out_rng = 0.0, 1.0
    return (
        np.asarray(lo_c, np.float32),
        np.asarray(scale_c, np.float32),
        out_lo,
        out_rng,
    )


def _leaf_names(params_state):
    """Readable ``index|path`` npz keys for the flat leaf list."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params_state)
    return [
        f"{i:04d}|" + jax.tree_util.keystr(path).strip("[]").replace("']['", ".")
        for i, (path, _) in enumerate(flat)
    ]


# --------------------------------------------------------------------------
# export
# --------------------------------------------------------------------------

def export_bundle(model_folder, out_folder, batch_size=None, platforms=None,
                  devices=None):
    """Export a trained model folder into a serving bundle folder.

    ``batch_size`` fixes the per-dispatch batch of the exported graph
    (default: the model's training batch size); the bundle loader pads and
    chunks arbitrary case counts onto it.  ``platforms`` (e.g.
    ``["tpu"]``, ``["cpu"]``) defaults to the current JAX backend.
    ``devices=N`` exports a data-parallel graph: each dispatch batch is
    sharded over an N-device mesh (weights replicated, XLA partitions the
    forward per device) — the serving host must present >= N devices.
    Returns the manifest dict.
    """
    from ..models import load_model

    return export_model(
        load_model(model_folder), out_folder,
        batch_size=batch_size, platforms=platforms, devices=devices,
    )


def export_model(mt, out_folder, batch_size=None, platforms=None,
                 devices=None):
    """Export an in-memory trained model instance (see :func:`export_bundle`)."""
    from jax import export as jexport

    if batch_size is None:
        batch_size = int(getattr(mt, "batch_size", 16) or 16)
    batch_size = int(batch_size)

    n_dev = int(devices) if devices else 1
    if n_dev > 1:
        if batch_size % n_dev:
            raise ValueError(
                f"batch_size {batch_size} not divisible by devices {n_dev}"
            )
        if len(jax.devices()) < n_dev:
            raise ValueError(
                f"devices={n_dev} requested but only "
                f"{len(jax.devices())} JAX devices present at export time"
            )

    c_in, y_in, x_in = mt.input_shape
    in_lo, in_scale, out_lo, out_rng = _channel_norm_vectors(mt)

    # the apply-dtype cast happens on stored params in the product path
    # (models/base.py::_apply_params_state); the export flattens raw
    # params, so replicate it here — bf16 weights at rest halve both the
    # bundle size and the serving-time weight HBM traffic
    apply_dtype = getattr(mt, "apply_dtype", None)
    params_state = (mt.params, mt.state)
    if apply_dtype:
        jdt = jnp.dtype(apply_dtype)

        def _cast(leaf):
            arr = jnp.asarray(leaf)
            if jnp.issubdtype(arr.dtype, jnp.floating):
                return arr.astype(jdt)
            return arr

        params_state = jax.tree_util.tree_map(_cast, params_state)

    leaves, treedef = jax.tree_util.tree_flatten(params_state)
    fn = build_serving_fn(mt, treedef)

    def aval(leaf):
        arr = np.asarray(leaf)
        return jax.ShapeDtypeStruct(arr.shape, arr.dtype)

    args = (
        [aval(l) for l in leaves],
        jax.ShapeDtypeStruct((batch_size, y_in, x_in, c_in), np.float32),
        jax.ShapeDtypeStruct((c_in,), np.float32),
        jax.ShapeDtypeStruct((c_in,), np.float32),
        jax.ShapeDtypeStruct((), np.float32),
        jax.ShapeDtypeStruct((), np.float32),
    )
    if n_dev > 1:
        # DP export: the dispatch batch is sharded over an n_dev "data"
        # mesh, weights/scalars replicated; the graph is baked for
        # exactly n_dev devices (jax.export records the assignment) and
        # the loader re-binds it to the serving host's first n_dev
        # devices (bundle.py::ServingModel).
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
        repl = NamedSharding(mesh, P())
        batched = NamedSharding(mesh, P("data"))
        jitted = jax.jit(
            fn,
            in_shardings=([repl] * len(leaves), batched, repl, repl, repl, repl),
            out_shardings=batched,
        )
    else:
        jitted = jax.jit(fn)
    disabled = [
        jexport.DisabledSafetyCheck.custom_call(t) for t in _TPU_CUSTOM_CALLS
    ]
    # cross-platform export: the fused Pallas tail lowers to a TPU-only
    # custom call chosen at trace time by the CURRENT backend — exporting
    # for a different (or more than one) platform must trace the portable
    # XLA forward instead, or the bundle can't execute on its target
    cross_platform = bool(platforms) and (
        len(set(platforms)) > 1
        or list(platforms)[0] != jax.default_backend()
    )
    env_override = {"CAE_TPU_FUSED_DECODER": "0"} if cross_platform else {}
    saved_env = {k: os.environ.get(k) for k in env_override}
    os.environ.update(env_override)
    try:
        exported = jexport.export(
            jitted,
            platforms=list(platforms) if platforms else None,
            disabled_checks=disabled,
        )(*args)
    finally:
        for k, v in saved_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    blob = exported.serialize()

    os.makedirs(out_folder, exist_ok=True)
    with open(os.path.join(out_folder, "apply.jaxexport"), "wb") as f:
        f.write(blob)
    names = _leaf_names(params_state)
    # npz cannot round-trip ml_dtypes (bfloat16 reloads as raw void):
    # store such leaves bit-cast to a same-width integer and record the
    # true dtypes for the loader to view back
    leaf_dtypes = []
    stored = {}
    for n, l in zip(names, leaves):
        arr = np.asarray(l)
        leaf_dtypes.append(str(arr.dtype))
        if arr.dtype.kind not in "fiub":  # ml_dtypes (bf16 etc.)
            arr = arr.view(np.dtype(f"u{arr.dtype.itemsize}"))
        stored[n] = arr
    np.savez(os.path.join(out_folder, "weights.npz"), **stored)

    out_c, out_y, out_x = mt.output_shape
    manifest = {
        "format_version": FORMAT_VERSION,
        "model_type": type(mt).__name__,
        "model_id": getattr(mt, "model_id", None),
        "batch_size": batch_size,
        "input_spec": mt.input_spec,
        "output_spec": mt.output_spec,
        "input_shape_nhwc": [batch_size, y_in, x_in, c_in],
        "output_shape_nchw": [batch_size, out_c, out_y, out_x],
        "in_lo": in_lo.tolist(),
        "in_scale": in_scale.tolist(),
        "out_lo": out_lo,
        "out_rng": out_rng,
        "platforms": list(exported.platforms),
        "devices": int(exported.nr_devices),
        "apply_dtype": str(apply_dtype) if apply_dtype else "float32",
        "output_dtype": mt._out_dtype(),
        "leaf_dtypes": leaf_dtypes,
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
    }
    with open(os.path.join(out_folder, "manifest.json"), "w") as f:
        f.write(json.dumps(manifest, indent=1))
    return manifest
