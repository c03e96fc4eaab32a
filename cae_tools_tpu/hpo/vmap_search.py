"""Mesh-parallel hyperparameter trials via vmap.

BASELINE.json config 5 asks for "parallel trials across DP mesh replicas".
The reference runs Optuna trials *sequentially* as subprocesses
(``hypar_optim.py:76``); here, trials that share one architecture but differ
in continuous knobs (learning rate, weight decay, loss lambdas, dropout
rates, init seed) are trained
simultaneously: the whole compiled epoch x batch training loop is ``vmap``-ed
over a trials axis, and that axis is sharded across the mesh's "data"
devices — each device trains its own replica, no collectives needed.

Architecture-changing knobs (latent/fc/batch/kernel sizes) alter shapes, so
they cannot live on a vmap axis; grid-search those with
:class:`cae_tools_tpu.hpo.HyperOptimizer` (in-process mode) and use this for
the inner continuous sweep — the classic two-level TPU sweep.
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..parallel.mesh import replicated_sharding
from ..train.loop import batch_weights, make_injected_optimizer


def vmap_trials(
    loss_fn: Callable,
    init_fn: Callable,
    train_data: dict,
    test_data: dict,
    learning_rates,
    weight_decays,
    batch_size: int = 10,
    nr_epochs: int = 100,
    seed: int = 0,
    mesh=None,
    optimizer: str = "adamw",
    knobs: dict = None,
    make_loss_fn: Callable = None,
):
    """Train one model per trial simultaneously.

    loss_fn(params, state, rng, batch, train) -> (loss, (new_state, aux))
    init_fn(rng) -> (params, state)

    ``optimizer`` must match the optimizer the winning configuration will be
    retrained with — "adamw" (decoupled decay; the UNET/config-5 sweep
    target) or "adam_l2" (torch Adam(weight_decay=...); Conv/Linear/VarAE).
    The trials axis is padded to a mesh-divisible count when sharded.

    Beyond (lr, wd), any *traceable* continuous knob can ride the trials
    axis: pass ``knobs`` as ``{name: per-trial array}`` together with
    ``make_loss_fn({name: traced scalar}) -> loss_fn``, which is invoked
    once inside the vmapped trace with that trial's scalars (loss lambdas,
    dropout rates, ...).  Structural knobs (layer counts, fc/latent sizes)
    change shapes and must stay grid-searched outside.

    Returns (final_test_losses [T], params_stack, state_stack); trial i used
    learning_rates[i] / weight_decays[i] / knobs[*][i] and an independent
    init.
    """
    lrs = jnp.asarray(learning_rates, jnp.float32)
    wds = jnp.asarray(weight_decays, jnp.float32)
    knobs = {
        k: jnp.asarray(v, jnp.float32) for k, v in (knobs or {}).items()
    }
    assert lrs.shape == wds.shape
    for k, v in knobs.items():
        assert v.shape == lrs.shape, (k, v.shape, lrs.shape)
    n_requested = lrs.shape[0]
    if mesh is not None:
        n_data = mesh.shape["data"]
        pad = (-n_requested) % n_data
        if pad:
            lrs = jnp.concatenate([lrs, jnp.repeat(lrs[-1:], pad)])
            wds = jnp.concatenate([wds, jnp.repeat(wds[-1:], pad)])
            knobs = {
                k: jnp.concatenate([v, jnp.repeat(v[-1:], pad)])
                for k, v in knobs.items()
            }
    n_trials = lrs.shape[0]

    n = next(iter(train_data.values())).shape[0]
    steps = max(1, math.ceil(n / batch_size))
    n_pad = steps * batch_size
    tn = next(iter(test_data.values())).shape[0]
    tsteps = max(1, math.ceil(tn / batch_size))
    tn_pad = tsteps * batch_size

    train_w = batch_weights(n, n_pad, batch_size, steps)
    test_w = batch_weights(tn, tn_pad, batch_size, tsteps)
    test_idx = jnp.concatenate(
        [jnp.arange(tn), jnp.broadcast_to(jnp.arange(1), (tn_pad - tn,))]
    ).reshape(tsteps, batch_size)

    import optax

    tx = make_injected_optimizer(optimizer)

    def train_one(lr, wd, trial_knobs, trial_rng, data, tdata):
        fn = make_loss_fn(trial_knobs) if make_loss_fn is not None else loss_fn
        params, state = init_fn(trial_rng)
        opt_state = tx.init(params)
        opt_state.hyperparams["learning_rate"] = lr
        opt_state.hyperparams["weight_decay"] = wd

        def epoch_fn(carry, rng):
            params, state, opt_state = carry
            perm_rng, drop_rng = jax.random.split(rng)
            perm = jax.random.permutation(perm_rng, n)
            idx = jnp.concatenate(
                [perm, jnp.broadcast_to(perm[:1], (n_pad - n,))]
            ).reshape(steps, batch_size)
            step_rngs = jax.random.split(drop_rng, steps)

            def step_fn(c, scan_in):
                params, state, opt_state = c
                bidx, bw, brng = scan_in
                batch = {k: v[bidx] for k, v in data.items()}
                batch["w"] = bw
                (loss, (new_state, _aux)), grads = jax.value_and_grad(
                    fn, has_aux=True
                )(params, state, brng, batch, True)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, new_state, opt_state), loss

            (params, state, opt_state), losses = jax.lax.scan(
                step_fn, (params, state, opt_state), (idx, train_w, step_rngs)
            )
            return (params, state, opt_state), jnp.mean(losses)

        rngs = jax.random.split(jax.random.fold_in(trial_rng, 7), nr_epochs)
        (params, state, opt_state), _ = jax.lax.scan(
            epoch_fn, (params, state, opt_state), rngs
        )

        def eval_step(_, scan_in):
            bidx, bw = scan_in
            batch = {k: v[bidx] for k, v in tdata.items()}
            batch["w"] = bw
            loss, _ = fn(params, state, jax.random.PRNGKey(0), batch, False)
            return None, loss

        _, tlosses = jax.lax.scan(eval_step, None, (test_idx, test_w))
        return jnp.mean(tlosses), params, state

    trial_rngs = jax.random.split(jax.random.PRNGKey(seed), n_trials)

    vmapped = jax.vmap(train_one, in_axes=(0, 0, 0, 0, None, None))

    data = {k: jnp.asarray(v) for k, v in train_data.items()}
    tdata = {k: jnp.asarray(v) for k, v in test_data.items()}
    if mesh is not None:
        # shard the trials axis over the mesh's data devices: each device
        # trains its own replica(s); shared datasets are replicated
        from jax.sharding import NamedSharding, PartitionSpec as P

        trial_sharding = NamedSharding(mesh, P("data"))
        repl = replicated_sharding(mesh)
        lrs = jax.device_put(lrs, trial_sharding)
        wds = jax.device_put(wds, trial_sharding)
        knobs = {k: jax.device_put(v, trial_sharding) for k, v in knobs.items()}
        trial_rngs = jax.device_put(trial_rngs, trial_sharding)
        data = jax.device_put(data, repl)
        tdata = jax.device_put(tdata, repl)

    run = jax.jit(vmapped)
    test_losses, params_stack, state_stack = run(
        lrs, wds, knobs, trial_rngs, data, tdata
    )
    # drop padded duplicate trials
    test_losses = np.asarray(test_losses)[:n_requested]
    take = lambda a: a[:n_requested]
    params_stack = jax.tree_util.tree_map(take, params_stack)
    state_stack = jax.tree_util.tree_map(take, state_stack)
    return test_losses, params_stack, state_stack
