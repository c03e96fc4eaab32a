"""Compiled training loop.

TPU-first redesign of the reference's per-batch Python loop
(``conv_ae_model.py:185-203,328-334``): the whole dataset is resident on the
device (mesh), every epoch is a ``lax.scan`` over batches inside one jitted
function, and multi-epoch spans between test evaluations run as a second
``lax.scan`` level — one XLA dispatch per ``test_interval`` epochs instead of
per batch.  Shuffling is a per-epoch ``jax.random.permutation`` traced into
the graph; the trailing partial batch is padded with zero-weight samples so
all shapes are static while *loss and loss-gradient* semantics match torch's
smaller final batch exactly.  Known deviation: BatchNorm *batch statistics*
in that trailing batch still see the pad rows (duplicates of real samples),
where torch normalizes over the smaller real batch — weight-masked BN would
need mask plumbing through every module.  Exact parity when
``n % batch_size == 0`` (the tested contract); otherwise the effect is a
slightly duplicate-biased BN mean/var on one batch per epoch.

Optimizers replicate the reference's exactly:
 * ``adam_l2`` — torch ``Adam(weight_decay=wd)``: L2 term added to the
   gradient *before* the Adam moments (``conv_ae_model.py:310``)
 * ``adamw`` — torch ``AdamW`` decoupled decay (``unet.py:457``)
and the LR schedule mirrors torch ``CosineAnnealingLR(T_max, eta_min)``
stepped per epoch while ``epoch < T_max`` (``unet.py:459,486-487``; note the
reference passes ``eta_min=lr`` making it constant — that default is kept).

Loss functions have the signature::

    loss_fn(params, state, rng, batch, train) -> (loss, (new_state, aux))

where ``batch`` maps array names ("x", "y", "m", ...) to a batch slice plus
"w", the per-sample weight vector, and ``aux`` is a dict of scalar metrics.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import batch_sharding, replicated_sharding


@dataclass
class TrainConfig:
    batch_size: int = 10
    nr_epochs: int = 500
    test_interval: int = 10
    lr: float = 0.001
    weight_decay: float = 1e-5
    optimizer: str = "adam_l2"  # "adam_l2" | "adamw"
    # "constant" | "cosine" | "step" | "exponential" | "plateau"
    schedule: str = "constant"
    t_max: int = 500
    eta_min: Optional[float] = None  # None -> lr (reference unet.py:459)
    lr_step_size: int = 500  # for "step" (torch StepLR semantics per epoch)
    lr_gamma: float = 0.5  # decay factor for "step"/"exponential"
    plateau_patience: int = 10  # "plateau": torch ReduceLROnPlateau defaults
    plateau_factor: float = 0.1
    plateau_threshold: float = 1e-4  # relative improvement threshold
    seed: int = 0


def _build_optimizer(optimizer: str, learning_rate, weight_decay):
    if optimizer == "adam_l2":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(learning_rate),
        )
    if optimizer == "adamw":
        return optax.adamw(
            learning_rate=learning_rate,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=weight_decay,
        )
    raise ValueError(f"unknown optimizer {optimizer!r}")


def make_injected_optimizer(
    optimizer: str, learning_rate=1e-3, weight_decay=1e-5
) -> optax.GradientTransformation:
    """Optimizer with lr/wd living in ``opt_state.hyperparams`` (arrays),
    so they can be changed between steps (plateau schedule) or vmapped over
    a trials axis (hpo.vmap_search) without retracing."""
    return optax.inject_hyperparams(
        lambda learning_rate, weight_decay: _build_optimizer(
            optimizer, learning_rate, weight_decay
        )
    )(learning_rate=learning_rate, weight_decay=weight_decay)


def make_optimizer(config: TrainConfig, schedule_fn) -> optax.GradientTransformation:
    if config.schedule == "plateau":
        # dynamic lr adjusted by the host loop on test-loss plateaus
        # (torch ReduceLROnPlateau semantics)
        return make_injected_optimizer(
            config.optimizer, config.lr, config.weight_decay
        )
    return _build_optimizer(config.optimizer, schedule_fn, config.weight_decay)


def batch_weights(n_real: int, n_padded: int, batch: int, steps: int):
    """Per-sample weights for a padded static batch plan: 1 for real rows,
    0 for the trailing pad — torch's smaller-final-batch loss semantics."""
    w = jnp.concatenate(
        [
            jnp.ones((n_real,), jnp.float32),
            jnp.zeros((n_padded - n_real,), jnp.float32),
        ]
    )
    return w.reshape(steps, batch)


class Trainer:
    """Owns opt/loop state and the jit caches for one training run."""

    def __init__(
        self,
        loss_fn: Callable,
        config: TrainConfig,
        mesh=None,
        donate: bool = True,
    ):
        self.loss_fn = loss_fn
        self.config = config
        self.mesh = mesh
        self.donate = donate
        self._epoch_of_step = None  # set in fit()
        #: orbax mid-train checkpointing (train/checkpoint.py), configured
        #: by the model via BaseModel._configure_checkpointing: save
        #: params+state+opt_state every `checkpoint_interval` epochs under
        #: `checkpoint_folder`/orbax; `resume` restores the latest snapshot
        #: (including optimizer moments — the reference's
        #: --continue-training restarts them, cli/train_cae.py:111-125)
        self.checkpoint_folder = None
        self.checkpoint_interval = 0
        self.resume = False
        #: snapshots older than this many epochs are ignored on resume
        #: (the model folder's weights are newer; checkpoint.resume_trainer)
        self.resume_min_step = 0
        #: jitted (run_epochs, eval_loss, tx) per data geometry — reusing
        #: them across fit() calls (continue-training, HPO trials, the
        #: UNET double fit) skips the 75-85 s remote recompile per call
        self._compiled = {}

        from ..utils.profiling import ThroughputMeter

        self.meter = ThroughputMeter("train")

        base = config.lr
        if config.schedule == "cosine":
            eta_min = config.eta_min if config.eta_min is not None else config.lr

            def lr_for_epoch(epoch):
                e = jnp.minimum(epoch, config.t_max)
                return eta_min + (base - eta_min) * 0.5 * (
                    1.0 + jnp.cos(jnp.pi * e / config.t_max)
                )

        elif config.schedule == "step":
            # torch StepLR per-epoch: lr * gamma^(epoch // step_size)
            def lr_for_epoch(epoch):
                return base * config.lr_gamma ** (epoch // config.lr_step_size)

        elif config.schedule == "exponential":
            def lr_for_epoch(epoch):
                return base * config.lr_gamma**epoch

        elif config.schedule == "plateau":
            self._current_lr = config.lr

            def lr_for_epoch(epoch):
                return self._current_lr

        else:

            def lr_for_epoch(epoch):
                return jnp.asarray(config.lr, jnp.float32)

        self.lr_for_epoch = lr_for_epoch

    # ------------------------------------------------------------------
    def _prep(self, data: dict, batch_size: int):
        """Static batching plan for a data dict of (N, ...) arrays."""
        n = next(iter(data.values())).shape[0]
        steps = max(1, math.ceil(n / batch_size))
        n_pad = steps * batch_size
        return n, steps, n_pad

    def _place(self, data: dict):
        if self.mesh is not None:
            # shard_batch pads the leading axis to a mesh-divisible size by
            # repeating rows; padded rows are never indexed (batch index
            # plans only reference the first n real cases)
            from ..parallel.mesh import shard_batch

            return {k: shard_batch(self.mesh, np.asarray(v)) for k, v in data.items()}
        return {k: jnp.asarray(v) for k, v in data.items()}

    # ------------------------------------------------------------------
    def _graphs(self, n, steps, n_pad, tn, tsteps, tn_pad):
        """Jitted train/eval graphs for one data geometry, cached on the
        instance so repeat fits (continue-training, HPO trials, the UNET
        double fit) reuse compiled executables instead of re-tracing."""
        cfg = self.config
        key = (n, steps, n_pad, tn, tsteps, tn_pad, cfg.batch_size)
        if key in self._compiled:
            return self._compiled[key]

        loss_fn = self.loss_fn
        schedule_fn = lambda step: self.lr_for_epoch(step // steps)
        tx = make_optimizer(cfg, schedule_fn)
        train_w = batch_weights(n, n_pad, cfg.batch_size, steps)
        test_w = batch_weights(tn, tn_pad, cfg.batch_size, tsteps)

        # NOTE: the dataset is passed as a jit *argument*, never a closure —
        # closed-over device arrays are baked into the HLO as constants,
        # which bloats the program (and overflows remote-compile payload
        # limits on the tunneled-TPU environment) at production data sizes.
        def epoch_fn(data):
            def fn(carry, rng):
                params, state, opt_state = carry
                perm_rng, drop_rng = jax.random.split(rng)
                perm = jax.random.permutation(perm_rng, n)
                idx = jnp.concatenate(
                    [perm, jnp.broadcast_to(perm[:1], (n_pad - n,))]
                ).reshape(steps, cfg.batch_size)
                step_rngs = jax.random.split(drop_rng, steps)

                def step_fn(c, scan_in):
                    params, state, opt_state = c
                    bidx, bw, brng = scan_in
                    batch = {k: v[bidx] for k, v in data.items()}
                    batch["w"] = bw
                    (loss, (new_state, aux)), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(params, state, brng, batch, True)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, new_state, opt_state), (loss, aux)

                (params, state, opt_state), (losses, auxes) = jax.lax.scan(
                    step_fn, (params, state, opt_state), (idx, train_w, step_rngs)
                )
                epoch_loss = jnp.mean(losses)
                epoch_aux = jax.tree_util.tree_map(jnp.mean, auxes)
                return (params, state, opt_state), (epoch_loss, epoch_aux)

            return fn

        @partial(jax.jit, static_argnames=("n_epochs",), donate_argnums=(0,))
        def run_epochs(carry, rng, data, n_epochs):
            rngs = jax.random.split(rng, n_epochs)
            carry, (losses, auxes) = jax.lax.scan(epoch_fn(data), carry, rngs)
            return carry, (losses[-1], jax.tree_util.tree_map(lambda a: a[-1], auxes))

        test_idx = jnp.concatenate(
            [jnp.arange(tn), jnp.broadcast_to(jnp.arange(1), (tn_pad - tn,))]
        ).reshape(tsteps, cfg.batch_size)

        @jax.jit
        def eval_loss(params, state, data):
            def step_fn(_, scan_in):
                bidx, bw = scan_in
                batch = {k: v[bidx] for k, v in data.items()}
                batch["w"] = bw
                loss, (_, aux) = loss_fn(
                    params, state, jax.random.PRNGKey(0), batch, False
                )
                return None, (loss, aux)

            _, (losses, auxes) = jax.lax.scan(
                step_fn, None, (test_idx, test_w)
            )
            return jnp.mean(losses), jax.tree_util.tree_map(jnp.mean, auxes)

        self._compiled[key] = (tx, run_epochs, eval_loss)
        return self._compiled[key]

    # ------------------------------------------------------------------
    def fit(
        self,
        params,
        state,
        train_data: dict,
        test_data: dict,
        history: dict,
        log_fn=None,
        nr_epochs: Optional[int] = None,
        epoch_offset: int = 0,
    ):
        """Run the training loop; returns (params, state, history)."""
        cfg = self.config
        nr_epochs = nr_epochs if nr_epochs is not None else cfg.nr_epochs
        n, steps, n_pad = self._prep(train_data, cfg.batch_size)
        tn, tsteps, tn_pad = self._prep(test_data, cfg.batch_size)

        train_data = self._place(train_data)
        test_data = self._place(test_data)
        # fresh buffers: the scan carry is donated inside run_epochs, which
        # would otherwise invalidate the caller's param arrays
        copy = lambda a: jnp.array(a, copy=True)
        params = jax.tree_util.tree_map(copy, params)
        state = jax.tree_util.tree_map(copy, state)
        tp = self.mesh is not None and int(self.mesh.shape.get("model", 1)) > 1
        if self.mesh is not None:
            repl = replicated_sharding(self.mesh)
            if tp:
                # tensor parallelism: large dense kernels sharded over the
                # "model" axis (LinearModel's (c*y*x) x (C*Y*X) weight is
                # the production case); XLA propagates the sharding through
                # fwd/bwd/Adam and inserts the ICI collectives
                from ..parallel.mesh import shard_params_tp

                params = shard_params_tp(
                    params, self.mesh,
                    min_size=getattr(self, "tp_min_size", 1 << 20),
                )
            else:
                params = jax.device_put(params, repl)
            state = jax.device_put(state, repl)

        tx, run_epochs, eval_loss = self._graphs(
            n, steps, n_pad, tn, tsteps, tn_pad
        )
        opt_state = tx.init(params)
        if tp:
            # Adam moments mirror the param shapes; give the big-kernel
            # moments the same "model"-axis sharding as their params
            from ..parallel.mesh import shard_params_tp

            opt_state = shard_params_tp(
                opt_state, self.mesh,
                min_size=getattr(self, "tp_min_size", 1 << 20),
            )

        # ---- orbax resume: params + BN state + optimizer moments ---------
        from .checkpoint import resume_trainer

        restored, ckpt_base = resume_trainer(
            self, {"params": params, "state": state, "opt_state": opt_state}
        )
        if restored is not None:
            params = restored["params"]
            state = restored["state"]
            opt_state = restored.get("opt_state", opt_state)
            if self.mesh is not None:
                repl = replicated_sharding(self.mesh)
                if tp:
                    # keep the model-axis sharding through the resume:
                    # replicating here would silently drop TP for the
                    # whole resumed run (and can OOM a kernel that
                    # only fits sharded)
                    from ..parallel.mesh import shard_params_tp

                    min_size = getattr(self, "tp_min_size", 1 << 20)
                    params = shard_params_tp(
                        params, self.mesh, min_size=min_size
                    )
                    opt_state = shard_params_tp(
                        opt_state, self.mesh, min_size=min_size
                    )
                else:
                    params = jax.device_put(params, repl)
                    opt_state = jax.device_put(opt_state, repl)
                state = jax.device_put(state, repl)

        if cfg.schedule == "plateau":
            # sync the host-side LR tracker with the live injected
            # hyperparams: a restored opt_state carries the last decayed
            # rate, and a second fit() re-inits at cfg.lr — either way a
            # stale tracker would make the next plateau trip set a wrong
            # (possibly higher) LR
            try:
                self._current_lr = float(
                    np.asarray(opt_state.hyperparams["learning_rate"])
                )
            except Exception:
                self._current_lr = cfg.lr

        # ---- host loop: record/print at the reference cadence -----------
        from ..utils.profiling import trace as profile_trace

        rng = jax.random.PRNGKey(cfg.seed)
        carry = (params, state, opt_state)
        last_ckpt_epoch = 0
        epoch = 0
        train_loss = test_loss = 0.0
        plateau_best = float("inf")
        plateau_bad = 0
        profile_ctx = profile_trace()
        profile_ctx.__enter__()
        try:
            while epoch < nr_epochs:
                # run up to the next test checkpoint (e % interval == 0).
                # The 1-then-(interval-1) split is deliberate: the test
                # epoch's OWN train loss must be reported (reference
                # cadence), so the scan must end exactly there.  Cost: two
                # dispatches per interval and (for nr % interval != 0) a
                # third static n_epochs executable; an aligned-chunk
                # scheme would save one dispatch per interval but report
                # the wrong epoch's train loss.
                chunk = 1 if epoch % cfg.test_interval == 0 else min(
                    cfg.test_interval - (epoch % cfg.test_interval),
                    nr_epochs - epoch,
                )
                rng, sub = jax.random.split(rng)
                with self.meter.measure(images=chunk * n, steps=chunk * steps):
                    carry, (train_loss, train_aux) = run_epochs(
                        carry, sub, train_data, n_epochs=chunk
                    )
                    jax.block_until_ready(carry[0])
                epoch += chunk
                e_now = epoch - 1
                if e_now % cfg.test_interval == 0:
                    test_loss, test_aux = eval_loss(carry[0], carry[1], test_data)
                    train_loss = float(train_loss)
                    test_loss = float(test_loss)
                    history["train_loss"].append(train_loss)
                    history["test_loss"].append(test_loss)
                    if cfg.schedule == "plateau":
                        improved = test_loss < plateau_best * (
                            1.0 - cfg.plateau_threshold
                        )
                        if improved:
                            plateau_best = test_loss
                            plateau_bad = 0
                        else:
                            plateau_bad += 1
                            if plateau_bad > cfg.plateau_patience:
                                self._current_lr *= cfg.plateau_factor
                                plateau_bad = 0
                                p_, s_, o_ = carry
                                o_.hyperparams["learning_rate"] = jnp.asarray(
                                    self._current_lr, jnp.float32
                                )
                                carry = (p_, s_, o_)
                    if log_fn is not None:
                        log_fn(
                            epoch_offset + e_now,
                            train_loss,
                            test_loss,
                            jax.tree_util.tree_map(float, train_aux),
                            jax.tree_util.tree_map(float, test_aux),
                            float(self.lr_for_epoch(e_now)),
                        )
                if (
                    self.checkpoint_interval > 0
                    and self.checkpoint_folder
                    and epoch - last_ckpt_epoch >= self.checkpoint_interval
                ):
                    self._save_snapshot(ckpt_base + epoch, carry)
                    last_ckpt_epoch = epoch
        except KeyboardInterrupt:
            # preserve partially-trained weights (reference unet.py:483-507
            # semantics): stop cleanly, return the current carry
            print("Training interrupted. Performing cleanup...")
        finally:
            profile_ctx.__exit__(None, None, None)
        if (
            self.checkpoint_interval > 0
            and self.checkpoint_folder
            and epoch > last_ckpt_epoch
        ):
            # final snapshot: makes orbax/latest == the returned weights, so
            # a later --continue-training resumes the Adam moments exactly
            self._save_snapshot(ckpt_base + epoch, carry)
        params, state, opt_state = carry
        return params, state, float(train_loss), float(test_loss)

    def _save_snapshot(self, step, carry):
        from . import checkpoint as ckpt

        params, state, opt_state = carry[0], carry[1], carry[2]
        ckpt.save_checkpoint(
            self.checkpoint_folder, step, params, state, opt_state=opt_state
        )
