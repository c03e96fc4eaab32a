"""Streaming training path: host-resident data, double-buffered device feed.

The default trainer (`train.loop.Trainer.fit`) keeps the whole dataset
device-resident — optimal at the reference's scale but impossible when the
dataset exceeds HBM.  This module provides the large-data path promised in
SURVEY.md §7: batches are sliced on the host per step, transferred with
``jax.device_put`` (async) while the previous step computes, and consumed by
a single jitted ``train_step`` — a classic two-deep host->device pipeline.

The per-step math is identical to the compiled path (same loss_fn contract,
same optimizers/schedules); only the batch delivery differs, so models can
switch via ``model.streaming = True`` (or automatically above a size
threshold) without behavioral change beyond shuffle RNG provenance.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import batch_sharding, replicated_sharding
from .loop import TrainConfig, Trainer, make_optimizer

#: device-resident training is used below this many data bytes
DEVICE_RESIDENT_LIMIT_BYTES = 4 << 30


def data_nbytes(data: dict) -> int:
    # use the declared nbytes when present: disk-backed lazy arrays
    # (data/diskstream.py DiskArray) must not be materialized to be sized
    return sum(
        v.nbytes if hasattr(v, "nbytes") else np.asarray(v).nbytes
        for v in data.values()
    )


def data_disk_backed(data: dict) -> bool:
    return any(getattr(v, "disk_backed", False) for v in data.values())


class StreamingTrainer(Trainer):
    """Trainer variant feeding batches host->device with double buffering.

    ``use_global_batch``: None (auto — on when ``jax.process_count() > 1``)
    or an explicit bool.  When on, each process feeds only its local rows
    and batches are assembled as globally-sharded arrays via
    ``jax.make_array_from_process_local_data`` — the multi-host recipe.
    """

    use_global_batch: bool | None = None

    def _stream_graphs(self, steps):
        """Jitted per-batch step/eval graphs, cached across fit() calls
        (same rationale as Trainer._graphs: refits must not re-trace)."""
        cache = getattr(self, "_stream_compiled", None)
        if cache is None:
            cache = self._stream_compiled = {}
        if steps in cache:
            return cache[steps]
        cfg = self.config
        loss_fn = self.loss_fn
        schedule_fn = lambda step: self.lr_for_epoch(step // steps)
        tx = make_optimizer(cfg, schedule_fn)

        @jax.jit
        def train_step(params, state, opt_state, rng, batch):
            (loss, (new_state, aux)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, state, rng, batch, True)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_state, opt_state, loss, aux

        @jax.jit
        def eval_step(params, state, batch):
            loss, (_, aux) = loss_fn(
                params, state, jax.random.PRNGKey(0), batch, False
            )
            return loss, aux

        cache[steps] = (tx, train_step, eval_step)
        return cache[steps]

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
        cfg = self.config
        nr_epochs = nr_epochs if nr_epochs is not None else cfg.nr_epochs
        n = next(iter(train_data.values())).shape[0]
        steps = max(1, math.ceil(n / cfg.batch_size))
        tn = next(iter(test_data.values())).shape[0]
        tsteps = max(1, math.ceil(tn / cfg.batch_size))

        copy = lambda a: jnp.array(a, copy=True)
        params = jax.tree_util.tree_map(copy, params)
        state = jax.tree_util.tree_map(copy, state)
        if self.mesh is not None:
            repl = replicated_sharding(self.mesh)
            params = jax.device_put(params, repl)
            state = jax.device_put(state, repl)
        tx, train_step, eval_step = self._stream_graphs(steps)
        opt_state = tx.init(params)

        # ---- orbax resume (see Trainer.fit twin) -------------------------
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
                params, state, opt_state = jax.device_put(
                    (params, state, opt_state), repl
                )
        if self.config.schedule == "plateau":
            # keep the host LR tracker in sync with the live injected
            # hyperparams across resume / refit (see Trainer.fit twin)
            try:
                self._current_lr = float(
                    np.asarray(opt_state.hyperparams["learning_rate"])
                )
            except Exception:
                self._current_lr = self.config.lr
        last_ckpt_epoch = 0
        epochs_done = 0

        multihost = self.use_global_batch
        if multihost is None:
            multihost = jax.process_count() > 1

        def put(batch):
            if self.mesh is not None:
                n_data = self.mesh.shape["data"]
                # each process only needs its share of the global batch to
                # be device-divisible
                local_div = max(1, n_data // jax.process_count())
                bs = next(iter(batch.values())).shape[0]
                pad = (-bs) % (local_div if multihost else n_data)
                if pad:
                    # pad to a mesh-divisible batch; padded rows carry zero
                    # weight so loss/grad semantics are unchanged
                    batch = {
                        k: np.concatenate(
                            [v, np.zeros((pad,) + v.shape[1:], v.dtype)]
                            if k == "w"
                            else [v, np.repeat(v[-1:], pad, axis=0)],
                            axis=0,
                        )
                        for k, v in batch.items()
                    }
                if multihost:
                    # multi-controller path: this process holds only its own
                    # rows; assemble the globally-sharded batch without any
                    # host gathering the full array (SURVEY §5 recipe)
                    from ..parallel.multihost import global_batch_from_local

                    return {
                        k: global_batch_from_local(self.mesh, np.asarray(v))
                        for k, v in batch.items()
                    }
                return {
                    k: jax.device_put(v, batch_sharding(self.mesh, np.ndim(v)))
                    for k, v in batch.items()
                }
            return {k: jnp.asarray(v) for k, v in batch.items()}

        def host_batches(data, count, order):
            """Yield padded fixed-size batches with per-sample weights."""
            bs = cfg.batch_size
            for s in range(count):
                idx = order[s * bs : (s + 1) * bs]
                w = np.ones((bs,), np.float32)
                if idx.shape[0] < bs:
                    w[idx.shape[0] :] = 0.0
                    idx = np.concatenate(
                        [idx, np.broadcast_to(idx[:1], (bs - idx.shape[0],))]
                    )
                batch = {k: v[idx] for k, v in data.items()}
                batch["w"] = w
                yield batch

        def prefetched(iterator):
            """Keep one transferred batch in flight ahead of compute."""
            pending = None
            for batch in iterator:
                ready = put(batch)  # async transfer starts immediately
                if pending is not None:
                    yield pending
                pending = ready
            if pending is not None:
                yield pending

        host_rng = np.random.default_rng(cfg.seed)
        test_order = np.arange(tn)
        train_loss = test_loss = 0.0
        train_aux = test_aux = {}
        plateau_best = float("inf")
        plateau_bad = 0

        try:
            for epoch in range(nr_epochs):
                order = host_rng.permutation(n)
                losses, auxes = [], []
                rng = jax.random.PRNGKey(cfg.seed * 100003 + epoch)
                with self.meter.measure(images=n, steps=steps):
                    for batch in prefetched(host_batches(train_data, steps, order)):
                        rng, sub = jax.random.split(rng)
                        params, state, opt_state, loss, aux = train_step(
                            params, state, opt_state, sub, batch
                        )
                        losses.append(loss)
                        auxes.append(aux)
                    jax.block_until_ready(params)
                train_loss = float(np.mean([float(l) for l in losses]))
                train_aux = {
                    k: float(np.mean([float(a[k]) for a in auxes]))
                    for k in (auxes[0] if auxes else {})
                }

                if epoch % cfg.test_interval == 0:
                    tlosses, tauxes = [], []
                    for batch in prefetched(
                        host_batches(test_data, tsteps, test_order)
                    ):
                        loss, aux = eval_step(params, state, batch)
                        tlosses.append(loss)
                        tauxes.append(aux)
                    test_loss = float(np.mean([float(l) for l in tlosses]))
                    test_aux = {
                        k: float(np.mean([float(a[k]) for a in tauxes]))
                        for k in (tauxes[0] if tauxes else {})
                    }
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
                                opt_state.hyperparams["learning_rate"] = (
                                    jnp.asarray(self._current_lr, jnp.float32)
                                )
                    if log_fn is not None:
                        log_fn(
                            epoch_offset + epoch,
                            train_loss,
                            test_loss,
                            train_aux,
                            test_aux,
                            float(self.lr_for_epoch(epoch)),
                        )
                epochs_done = epoch + 1
                if (
                    self.checkpoint_interval > 0
                    and self.checkpoint_folder
                    and epochs_done - last_ckpt_epoch >= self.checkpoint_interval
                ):
                    self._save_snapshot(
                        ckpt_base + epochs_done, (params, state, opt_state)
                    )
                    last_ckpt_epoch = epochs_done
        except KeyboardInterrupt:
            print("Training interrupted. Performing cleanup...")

        if (
            self.checkpoint_interval > 0
            and self.checkpoint_folder
            and epochs_done > last_ckpt_epoch
        ):
            self._save_snapshot(
                ckpt_base + epochs_done, (params, state, opt_state)
            )
        return params, state, float(train_loss), float(test_loss)


def pick_trainer(loss_fn, config: TrainConfig, mesh=None, data_bytes=0, force=None):
    """Device-resident trainer below the HBM budget, streaming above it."""
    if force == "streaming" or (
        force is None and data_bytes > DEVICE_RESIDENT_LIMIT_BYTES
    ):
        return StreamingTrainer(loss_fn, config, mesh=mesh)
    return Trainer(loss_fn, config, mesh=mesh)
