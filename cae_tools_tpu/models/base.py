"""Abstract model lifecycle.

API parity with the reference ``BaseModel`` (``models/base_model.py:28-203``):
holds input/output specs (name+shape dicts) and a uuid4 ``model_id``; provides
the shared ``apply()`` (batch score -> denormalise -> write prediction
variable into the dataset) and ``evaluate()`` (denormalised ModelMetric
accumulation); persists ``input_spec.json``/``output_spec.json``.

TPU redesign: subclasses expose a pure ``_forward(params, state, x_nhwc)``
function; ``apply``/``evaluate`` pad the case dimension to a batch multiple,
run a single jitted ``lax.map`` over batch chunks (one dispatch for the whole
dataset instead of a Python batch loop with per-batch host syncs), and copy
back once.
"""

from __future__ import annotations

import json
import math
import os
import uuid

import numpy as np

import jax
import jax.numpy as jnp

from ..data.dataset import ArrayDataset
from ..xrcompat import xr
from .metrics import ModelMetric

#: auto per-dispatch apply batch on TPU (see BaseModel.apply_chunk_size);
#: 512 is past the occupancy knee for the flagship geometries (measured
#: scaling in BASELINE.md "Batch scaling") while keeping per-chunk
#: activations ~100s of MB.  CAE_TPU_APPLY_CHUNK overrides.
_AUTO_APPLY_CHUNK = int(os.environ.get("CAE_TPU_APPLY_CHUNK", "512"))


class BaseModel:
    def __init__(self):
        self.input_spec = None
        self.output_spec = None
        self.model_id = str(uuid.uuid4())
        self.mesh = None  # optional jax.sharding.Mesh for multi-chip runs
        #: per-dispatch batch of the apply ``lax.map`` (None = auto).  The
        #: reference scores with the *training* batch size
        #: (``base_model.py:145-152``, default 10) — on TPU such tiny
        #: per-step batches are occupancy-starved (measured: the flagship
        #: fused apply runs 33k img/s at b128 vs 187k device-side at
        #: b512+), so auto picks ``_AUTO_APPLY_CHUNK`` there and keeps
        #: ``batch_size`` elsewhere (small CPU-test compiles).
        self.apply_chunk_size = None
        self._apply_cache = {}

    # ---- spec accessors (base_model.py:35-61) -----------------------------
    def set_input_spec(self, input_spec):
        self.input_spec = input_spec

    def get_input_spec(self):
        return self.input_spec

    def set_output_spec(self, output_spec):
        self.output_spec = output_spec

    def get_output_spec(self):
        return self.output_spec

    def get_input_variable_names(self):
        if self.input_spec is None:
            return None
        return [item["name"] for item in self.input_spec]

    def get_output_variable_name(self):
        if self.output_spec is None:
            return None
        return self.output_spec["name"]

    def set_model_id(self, model_id):
        self.model_id = model_id

    def get_model_id(self):
        return self.model_id

    def set_mesh(self, mesh):
        self.mesh = mesh
        self._apply_cache = {}  # placement/chunking depends on the mesh
        self._tp_placed = None

    def set_apply_dtype(self, dtype):
        """Parameter storage dtype for the apply path (None = keep f32).

        ``"bfloat16"`` stores weights at rest in bf16, halving weight HBM
        traffic on the fast (``--precision default``) path; activations and
        accumulation stay f32, so output error stays at the 1-pass-bf16
        level (weights are bf16-rounded by the MXU there anyway).
        """
        self.apply_dtype = dtype
        self._apply_cache = {}

    def set_output_dtype(self, dtype):
        """Prediction *output* dtype for the apply path (None = float32).

        ``"bfloat16"`` (opt-in, serving only) writes the prediction in
        bf16 on device: the fused Pallas apply sits at its f32
        output-write floor (BASELINE.md round 4 trace — the tail is 80.8%
        of device time, HBM-write-bound), so halving the output bytes
        breaks that floor, and the device->host transfer halves too.
        Relative error ~2e-3 — OUTSIDE the <=1e-5 reference parity
        contract; netCDF writes cast back to f32 on host (netCDF has no
        bf16), so this changes throughput and rounding, not file formats.
        """
        self.output_dtype = dtype
        self._apply_cache = {}

    def _out_dtype(self) -> str:
        return getattr(self, "output_dtype", None) or "float32"

    def _tp_place(self, params, state):
        """On a mesh with a populated "model" axis, shard large dense
        kernels over it (tensor parallelism — parallel/mesh.py:60); the
        production case is the LinearModel's (c*y*x) x (C*Y*X) weight.
        No-op (replication) for everything else.

        The placed tree is cached per (params, state) identity: apply is
        called per dataset/chunk and re-walking the tree with device_puts
        every call costs host round-trips (ms-scale each on the tunneled
        TPU).  ``tp_min_size`` mirrors the Trainer knob so train-time and
        apply-time placement agree."""
        if self.mesh is None or int(self.mesh.shape.get("model", 1)) <= 1:
            return params, state
        cached = getattr(self, "_tp_placed", None)
        if cached is not None and cached[0] is params and cached[1] is state:
            return cached[2]
        from ..parallel.mesh import shard_params_tp

        min_size = getattr(self, "tp_min_size", 1 << 20)
        placed = (
            shard_params_tp(params, self.mesh, min_size=min_size),
            shard_params_tp(state, self.mesh, min_size=min_size),
        )
        self._tp_placed = (params, state, placed)
        return placed

    def _apply_params_state(self):
        """Params/state as fed to the apply graphs (optionally bf16-cast,
        TP-sharded when the mesh has a model axis)."""
        dtype = getattr(self, "apply_dtype", None)
        if not dtype:
            return self._tp_place(self.params, self.state)
        cached = getattr(self, "_cast_params", None)
        if cached is None or cached[0] is not self.params:
            jdt = jnp.dtype(dtype)

            def cast(leaf):
                arr = jnp.asarray(leaf)
                if jnp.issubdtype(arr.dtype, jnp.floating):
                    return arr.astype(jdt)
                return arr

            self._cast_params = (
                self.params,
                jax.tree_util.tree_map(cast, self.params),
                jax.tree_util.tree_map(cast, self.state),
            )
        return self._tp_place(self._cast_params[1], self._cast_params[2])

    # ---- LR schedule selection (CLI --scheduler-type fix-forward:
    # the reference parses the flag but never wires it, cli/train_cae.py:41)
    def _schedule_kwargs(self, default_schedule="constant"):
        torch_names = {
            "StepLR": "step",
            "ExponentialLR": "exponential",
            "CosineAnnealingLR": "cosine",
            "ReduceLROnPlateau": "plateau",
        }
        requested = getattr(self, "scheduler_type", None)
        schedule = torch_names.get(requested, default_schedule)
        return {
            "schedule": schedule,
            "lr_step_size": getattr(self, "lr_step_size", 500),
            "lr_gamma": getattr(self, "lr_gamma", 0.5),
        }

    def _augment_fn(self):
        """Paired train-batch augmentation from ``model.augment`` (None=off);
        fix-forward of the reference's inert transforms (SURVEY §4)."""
        from ..ops.augment import make_augment

        return make_augment(
            getattr(self, "augment", None),
            rotate_degrees=getattr(self, "rotate_degrees", 30.0),
            crop_scale=getattr(self, "crop_scale", (0.6, 1.0)),
        )

    def _configure_checkpointing(self, trainer, model_path):
        """Wire orbax mid-train checkpointing (train/checkpoint.py) into a
        trainer: ``model.checkpoint_interval`` epochs between snapshots
        under ``<model_path>/orbax``, and ``model.resume_from_checkpoint``
        (set by the CLI's --continue-training) restores the latest snapshot
        including optimizer moments — exact resume, unlike the reference's
        from-scratch optimizer on retrain (cli/train_cae.py:111-125)."""
        trainer.checkpoint_folder = model_path or None
        trainer.checkpoint_interval = int(
            getattr(self, "checkpoint_interval", 0) or 0
        )
        trainer.resume = bool(getattr(self, "resume_from_checkpoint", False))
        # stale-snapshot guard: never resume an orbax snapshot older than
        # the model folder's cumulative epoch count (the folder weights
        # would be silently rewound — see checkpoint.resume_trainer)
        hist = getattr(self, "history", None) or {}
        trainer.resume_min_step = int(hist.get("nr_epochs", 0) or 0)
        if (
            not trainer.resume
            and trainer.resume_min_step == 0
            and model_path
            and os.path.isdir(os.path.join(model_path, "orbax"))
        ):
            # fresh from-scratch train into a folder with a leftover orbax
            # lineage: purge it — its steps would collide with the new
            # run's numbering (orbax silently skips re-saving an existing
            # step) and a later --continue-training could restore the dead
            # lineage's weights over the retrained model
            import shutil

            print(
                "[checkpoint] removing stale orbax snapshots from a "
                "previous training run in " + model_path
            )
            shutil.rmtree(os.path.join(model_path, "orbax"))

    def _fused_tail_base_ok(self):
        """Shared gates for the fused Pallas train tails (every family):
        ``CAE_TPU_FUSED_TRAIN_TAIL=1|0`` override, TPU backend default,
        no tensor-parallel "model" axis (the kernel would compute
        redundantly per model-axis device; DP shards ride shard_map), and
        no additional loss term (the fused SSE/stats forms compute the
        base loss only — UNET-family ``--additional-loss`` must keep the
        XLA loss).  ``--precision highest`` also keeps the XLA loss
        unless explicitly overridden: the train kernels' MXU interleave
        rides 1-pass bf16 input rounding (deliberate at the default
        precision — see ``ops/pallas/train_tail``), which would silently
        undercut an explicit maximum-accuracy request."""
        choice = os.environ.get("CAE_TPU_FUSED_TRAIN_TAIL")
        if choice is not None and choice != "1":
            return False
        if choice is None and jax.default_backend() != "tpu":
            return False
        if choice is None:
            from ..ops import convops

            if convops.get_precision() == jax.lax.Precision.HIGHEST:
                return False
        if self.mesh is not None and int(self.mesh.shape.get("model", 1)) > 1:
            return False
        if getattr(self, "additional_loss", None):
            return False
        return True

    def _make_trainer(self, loss_fn, config, train_data):
        """Device-resident trainer by default; streaming for huge datasets
        or when ``model.streaming = True``."""
        from ..ops.augment import wrap_loss_with_augment
        from ..train.stream import data_disk_backed, data_nbytes, pick_trainer

        loss_fn = wrap_loss_with_augment(loss_fn, self._augment_fn())
        force = "streaming" if (
            getattr(self, "streaming", False) or data_disk_backed(train_data)
        ) else None
        trainer = pick_trainer(
            loss_fn,
            config,
            mesh=self.mesh,
            data_bytes=data_nbytes(train_data),
            force=force,
        )
        if hasattr(self, "tp_min_size"):
            # keep train-time TP placement in sync with the model's
            # apply-time knob (_tp_place) instead of the Trainer default
            trainer.tp_min_size = self.tp_min_size
        return trainer

    # ---- subclass compute hook -------------------------------------------
    def _forward_eval_p(self, params, state, x):
        """Pure eval-mode forward on an (B, H, W, C) batch -> (B, H', W', C').

        Takes params/state explicitly so jitted callers pass them as
        arguments — closed-over weights would be baked into the HLO as
        constants (a problem at production weight sizes and on
        remote-compile backends).
        """
        raise NotImplementedError

    def _forward_eval(self, x):
        return self._forward_eval_p(self.params, self.state, x)

    def _pad_cases(self, x_np):
        if getattr(x_np, "disk_backed", False):
            raise NotImplementedError(
                "whole-dataset apply on a disk-backed dataset would "
                "materialize it; run apply_cae on in-RAM (per-file) inputs "
                "— training and evaluation are the streamed paths"
            )
        n = x_np.shape[0]
        cs = getattr(self, "apply_chunk_size", None)
        if cs is not None:
            bs = max(1, int(cs))
        elif jax.default_backend() == "tpu":
            # auto: large chunks for occupancy, capped at the case count
            # (padding is wasted compute)
            bs = max(1, min(_AUTO_APPLY_CHUNK, n))
        else:
            bs = max(1, int(self.batch_size))
        if self.mesh is not None:
            # DP apply: each lax.map step is a batch sharded over the mesh's
            # "data" axis, so the per-chunk batch must divide evenly
            n_data = int(self.mesh.shape["data"])
            bs = -(-bs // n_data) * n_data
        chunks = max(1, math.ceil(n / bs))
        n_pad = chunks * bs
        if n_pad != n:
            x_np = np.concatenate(
                [x_np, np.repeat(x_np[-1:], n_pad - n, axis=0)], axis=0
            )
        return x_np, n, bs, chunks, n_pad

    def _put_chunked(self, x_np, chunks, bs):
        """Host->device placement of the (chunks, bs, ...) batch stack.

        With a mesh set, the per-chunk batch axis is sharded over "data"
        (params stay replicated; XLA partitions the forward per-device and
        the final gather is the single device->host copy)."""
        xb = x_np.reshape((chunks, bs) + x_np.shape[1:])
        if self.mesh is None:
            return jnp.asarray(xb)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            xb,
            NamedSharding(
                self.mesh, P(None, "data", *([None] * (xb.ndim - 2)))
            ),
        )

    def _predict_normalised(self, x_np: np.ndarray) -> np.ndarray:
        """Run the model over all cases; input/output are NHWC numpy."""
        x_np, n, bs, chunks, n_pad = self._pad_cases(x_np)
        key = ("predict", x_np.shape, bs)  # includes padded N -> chunk count
        if key not in self._apply_cache:

            @jax.jit
            def run(params, state, xb):
                yb = jax.lax.map(
                    lambda b: self._forward_eval_p(params, state, b), xb
                )
                yb = yb.astype(jnp.float32)
                return yb.reshape((n_pad,) + yb.shape[2:])

            self._apply_cache[key] = run
        params, state = self._apply_params_state()
        out = np.asarray(
            self._apply_cache[key](
                params, state, self._put_chunked(x_np, chunks, bs)
            )
        )
        return out[:n]

    def _forward_denorm_nchw_p(self, params, state, x, lo, rng):
        """Eval forward fused with output denormalisation -> NCHW f32.

        ``lo``/``rng`` are traced f32 scalars (min_output, max-min).
        Default: forward, then the affine + layout hop in XLA — which
        fuses them into the graph's trailing elementwise ops for free.
        Models whose apply path *ends inside a Pallas kernel* (ConvAE,
        VarAE, UNET fused tails) override this to fold the affine into
        the kernel's final activation instead: Pallas is a fusion
        barrier, so the XLA form costs a full-resolution HBM read+write
        there.
        """
        # denormalise in f32: Kelvin-scale values quantise badly in bf16
        # (~0.25 absolute at 292K)
        y = self._forward_eval_p(params, state, x).astype(jnp.float32)
        y = lo + y * rng
        od = self._out_dtype()
        if od != "float32":  # opt-in serving dtype (set_output_dtype)
            y = y.astype(jnp.dtype(od))
        if y.shape[-1] == 1:  # NHWC -> NCHW is a free reshape
            return y.reshape(y.shape[0], 1, y.shape[1], y.shape[2])
        return jnp.transpose(y, (0, 3, 1, 2))

    def _predict_denorm_nchw(self, x_np: np.ndarray, lo: float, hi: float):
        """Fused predict + denormalise + NHWC->NCHW transpose on device.

        One jit dispatch and one device->host copy for the whole dataset —
        the reference's per-batch score loop + host-side denormalise
        (``base_model.py:145-152``) collapsed into the compiled graph.
        The normalisation scalars ride as traced arguments, so models
        applied to differently-normalised datasets share one executable.
        """
        x_np, n, bs, chunks, n_pad = self._pad_cases(x_np)
        key = ("predict_denorm", x_np.shape, bs)
        if key not in self._apply_cache:

            @jax.jit
            def run(params, state, xb, lo_s, rng_s):
                yb = jax.lax.map(
                    lambda b: self._forward_denorm_nchw_p(
                        params, state, b, lo_s, rng_s
                    ),
                    xb,
                )
                return yb.reshape((n_pad,) + yb.shape[2:])

            self._apply_cache[key] = run
        params, state = self._apply_params_state()
        out = np.asarray(
            self._apply_cache[key](
                params, state, self._put_chunked(x_np, chunks, bs),
                jnp.float32(lo), jnp.float32(hi - lo),
            )
        )
        return out[:n]

    # ---- evaluation (base_model.py:69-100) --------------------------------
    def evaluate(self, dataset: ArrayDataset, device=None):
        """Denormalised metric collection over a dataset.

        Default: host-side ModelMetric (float64, bit-parity with the
        reference's scipy path).  Set ``model.fast_eval = True`` for the
        jitted device-side reduction (metrics.fast_metrics) on large
        datasets — identical math in float32.
        """
        dataset.set_normalise_output(False)
        x, y_not_norm, mask = dataset.arrays_nhwc()
        if getattr(x, "disk_backed", False):
            return self._evaluate_disk(dataset, x, y_not_norm, mask)
        scores = self._predict_normalised(x)
        scores = dataset.denormalise_output(scores, force=True)
        if getattr(self, "fast_eval", False):
            from .metrics import fast_metrics

            result = fast_metrics(
                jnp.asarray(y_not_norm), jnp.asarray(scores), jnp.asarray(mask)
            )
            return {k: float(v) for k, v in result.items()}
        mm = ModelMetric()
        for i in range(x.shape[0]):
            mm.accumulate(y_not_norm[i], scores[i], mask[i])
        return mm.get_metrics()

    def _evaluate_disk(self, dataset, x, y_not_norm, mask, chunk_rows=256):
        """Chunked evaluate over a disk-backed dataset: materialize
        ``chunk_rows`` cases at a time, predict, accumulate — host memory
        stays O(chunk) regardless of dataset size.  Chunks are padded to a
        fixed size (repeating the last row) so every chunk reuses one
        compiled apply graph."""
        n = x.shape[0]
        cs = min(chunk_rows, n)
        mm = ModelMetric()
        for s in range(0, n, cs):
            idx = np.arange(s, min(n, s + cs))
            valid = idx.shape[0]
            if valid < cs:
                idx = np.concatenate(
                    [idx, np.broadcast_to(idx[-1:], (cs - valid,))]
                )
            xb = x[idx]
            yb = y_not_norm[idx]
            mb = mask[idx]
            scores = self._predict_normalised(xb)
            scores = dataset.denormalise_output(scores, force=True)
            for i in range(valid):
                mm.accumulate(yb[i], scores[i], mb[i])
        return mm.get_metrics()

    # ---- inference into a dataset (base_model.py:102-152) -----------------
    def apply(
        self,
        score_ds,
        input_variables,
        prediction_variable="model_output",
        channel_dimension="model_output_channel",
        y_dimension="model_output_y",
        x_dimension="model_output_x",
        mask_variable_name=None,
    ):
        """Apply the model to input data, extending ``score_ds`` in place."""
        n_dimension = score_ds[input_variables[0]].dims[0]

        ds = ArrayDataset(
            score_ds,
            input_variables,
            input_variables[0],
            normalise_in=self.normalise_input,
            mask_variable_name=mask_variable_name,
        )
        ds.set_normalisation_parameters(self.normalisation_parameters)
        x, _, _ = ds.arrays_nhwc()
        if ds.normalise_out:
            lo, hi = ds.min_output, ds.max_output
        else:
            lo, hi = 0.0, 1.0
        scores_nchw = self._predict_denorm_nchw(x, lo, hi)
        if scores_nchw.dtype not in (np.float32, np.float64):
            # reduced-precision output dtype (set_output_dtype): the device
            # compute + transfer ran narrow; netCDF has no bf16, widen here
            scores_nchw = scores_nchw.astype(np.float32)
        score_ds[prediction_variable] = xr.DataArray(
            scores_nchw,
            dims=(n_dimension, channel_dimension, y_dimension, x_dimension),
        )

    def dump_metrics(self, title, metrics):
        print("\n" + title)
        for key in metrics:
            print(f"\t{key:30s}:{metrics[key]}")

    # ---- persistence (base_model.py:162-180) ------------------------------
    def save(self, to_folder):
        if self.input_spec is not None:
            with open(os.path.join(to_folder, "input_spec.json"), "w") as f:
                f.write(json.dumps(self.input_spec))
        if self.output_spec is not None:
            with open(os.path.join(to_folder, "output_spec.json"), "w") as f:
                f.write(json.dumps(self.output_spec))

    def load(self, from_folder):
        input_spec_path = os.path.join(from_folder, "input_spec.json")
        if os.path.exists(input_spec_path):
            with open(input_spec_path) as f:
                self.input_spec = json.loads(f.read())
        output_spec_path = os.path.join(from_folder, "output_spec.json")
        if os.path.exists(output_spec_path):
            with open(output_spec_path) as f:
                self.output_spec = json.loads(f.read())

    # ---- stubs ------------------------------------------------------------
    def train(
        self,
        input_variables,
        output_variable,
        training_ds,
        testing_ds,
        model_path="",
        training_paths="",
        testing_paths="",
        mask_variable_name=None,
    ):
        raise NotImplementedError

    def summary(self):
        raise NotImplementedError

    def get_parameters(self):
        raise NotImplementedError
