"""Compiled adversarial (WGAN-GP) training loop for ``resunet_gan``.

The reference accepts ``--method resunet_gan`` but never shipped a GAN
(``cli/train_cae.py:42,127-138``); its UNET carries a WGAN-GP
``compute_gradient_penalty`` leftover (``unet.py:277-293``) that marks the
intent.  This trainer realises it TPU-first, with the same structure as
:class:`~cae_tools_tpu.train.loop.Trainer` — whole dataset device-resident,
epoch = ``lax.scan`` over batches, multi-epoch spans between test
evaluations as a second scan level, one XLA dispatch per ``test_interval``
epochs — but alternating two optimizers inside the compiled step:

 1. ``n_critic`` critic updates (statically unrolled): Wasserstein loss
    ``E[D(fake)] - E[D(real)]`` plus ``lambda_gp`` * gradient penalty
    (`ops.losses.gradient_penalty`), Adam(b1=0, b2=0.9) per the WGAN-GP
    paper; the generator forward feeding the critic is ``stop_gradient``-ed.
 2. one generator update: the UNET content loss (masked MSE + Pearson,
    via the model's ``_make_content_loss``) plus
    ``lambda_adv * -E[D(G(x))]``, using the model's configured optimizer
    and LR schedule.

Padded trailing batches use the same per-sample-weight scheme as the base
trainer; Wasserstein expectations are weight-averaged so pad rows don't
bias the critic.  The gradient penalty interpolates over the whole static
batch (pad rows are repeats of real rows, so the penalty stays on-support).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..ops import losses as L
from ..parallel.mesh import replicated_sharding
from .loop import TrainConfig, Trainer, batch_weights, make_optimizer


class GANTrainer(Trainer):
    """Two-player trainer; ``params`` must carry the critic under ``"disc"``.

    ``fit`` keeps the base :class:`Trainer` signature and return value so
    model classes can swap it in via ``_make_trainer``; the returned params
    include the updated critic (persisted for ``--continue-training``).
    """

    def __init__(
        self,
        loss_fn: Callable,
        config: TrainConfig,
        *,
        net_apply: Callable,
        content_loss: Callable,
        critic_apply: Callable,
        lambda_adv: float = 1e-3,
        lambda_gp: float = 10.0,
        n_critic: int = 1,
        critic_lr: Optional[float] = None,
        augment_fn: Optional[Callable] = None,
        mesh=None,
        donate: bool = True,
    ):
        if n_critic < 1:
            raise ValueError("n_critic must be >= 1")
        if config.schedule == "plateau":
            raise ValueError(
                "ReduceLROnPlateau is not supported by the adversarial "
                "trainer (critic/generator losses do not plateau jointly)"
            )
        super().__init__(loss_fn, config, mesh=mesh, donate=donate)
        self.net_apply = net_apply
        self.content_loss = content_loss
        self.critic_apply = critic_apply
        self.lambda_adv = float(lambda_adv)
        self.lambda_gp = float(lambda_gp)
        self.n_critic = int(n_critic)
        self.critic_lr = critic_lr
        self.augment_fn = augment_fn

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
        cfg = self.config
        nr_epochs = nr_epochs if nr_epochs is not None else cfg.nr_epochs
        n, steps, n_pad = self._prep(train_data, cfg.batch_size)
        tn, tsteps, tn_pad = self._prep(test_data, cfg.batch_size)

        train_data = self._place(train_data)
        test_data = self._place(test_data)
        copy = lambda a: jnp.array(a, copy=True)
        d_params = jax.tree_util.tree_map(copy, params["disc"])
        g_params = jax.tree_util.tree_map(
            copy, {k: v for k, v in params.items() if k != "disc"}
        )
        state = jax.tree_util.tree_map(copy, state)
        if self.mesh is not None:
            repl = replicated_sharding(self.mesh)
            g_params = jax.device_put(g_params, repl)
            d_params = jax.device_put(d_params, repl)
            state = jax.device_put(state, repl)

        g_tx, d_tx, run_epochs, eval_loss = self._gan_graphs(
            n, steps, n_pad, tn, tsteps, tn_pad
        )
        g_opt = g_tx.init(g_params)
        d_opt = d_tx.init(d_params)

        # ---- orbax resume (two-player carry; see Trainer.fit twin) -------
        from .checkpoint import resume_trainer

        restored, ckpt_base = resume_trainer(
            self,
            {
                "params": g_params, "state": state, "opt_state": g_opt,
                "d_params": d_params, "d_opt": d_opt,
            },
        )
        if restored is not None:
            g_params = restored["params"]
            state = restored["state"]
            g_opt = restored.get("opt_state", g_opt)
            d_params = restored.get("d_params", d_params)
            d_opt = restored.get("d_opt", d_opt)
            if self.mesh is not None:
                repl = replicated_sharding(self.mesh)
                g_params, state, g_opt, d_params, d_opt = jax.device_put(
                    (g_params, state, g_opt, d_params, d_opt), repl
                )

        from ..utils.profiling import trace as profile_trace

        rng = jax.random.PRNGKey(cfg.seed)
        carry = (g_params, state, d_params, g_opt, d_opt)
        last_ckpt_epoch = 0
        epoch = 0
        train_loss = test_loss = 0.0
        profile_ctx = profile_trace()
        profile_ctx.__enter__()
        try:
            while epoch < nr_epochs:
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
                    test_loss, test_aux = eval_loss(
                        carry[0], carry[1], test_data
                    )
                    train_loss = float(train_loss)
                    test_loss = float(test_loss)
                    history["train_loss"].append(train_loss)
                    history["test_loss"].append(test_loss)
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
            print("Training interrupted. Performing cleanup...")
        finally:
            profile_ctx.__exit__(None, None, None)
        if (
            self.checkpoint_interval > 0
            and self.checkpoint_folder
            and epoch > last_ckpt_epoch
        ):
            self._save_snapshot(ckpt_base + epoch, carry)
        g_params, state, d_params, _, _ = carry
        params = dict(g_params)
        params["disc"] = d_params
        return params, state, float(train_loss), float(test_loss)

    def _save_snapshot(self, step, carry):
        from . import checkpoint as ckpt

        g_params, state, d_params, g_opt, d_opt = carry
        ckpt.save_checkpoint(
            self.checkpoint_folder, step, g_params, state,
            opt_state=g_opt, extra={"d_params": d_params, "d_opt": d_opt},
        )

    # ------------------------------------------------------------------
    def _gan_graphs(self, n, steps, n_pad, tn, tsteps, tn_pad):
        """Jitted two-player train/eval graphs per data geometry, cached on
        the instance (same rationale as Trainer._graphs)."""
        cfg = self.config
        key = (n, steps, n_pad, tn, tsteps, tn_pad, cfg.batch_size)
        cache = getattr(self, "_gan_compiled", None)
        if cache is None:
            cache = self._gan_compiled = {}
        if key in cache:
            return cache[key]

        schedule_fn = lambda step: self.lr_for_epoch(step // steps)
        g_tx = make_optimizer(cfg, schedule_fn)
        # WGAN-GP critic optimizer (Gulrajani et al. 2017: Adam b1=0, b2=0.9)
        d_tx = optax.adam(
            self.critic_lr if self.critic_lr is not None else cfg.lr,
            b1=0.0,
            b2=0.9,
        )

        train_w = batch_weights(n, n_pad, cfg.batch_size, steps)
        test_w = batch_weights(tn, tn_pad, cfg.batch_size, tsteps)

        net_apply = self.net_apply
        content_loss = self.content_loss
        critic_apply = self.critic_apply
        lam_adv, lam_gp, n_crit = self.lambda_adv, self.lambda_gp, self.n_critic
        augment_fn = self.augment_fn
        eval_loss_fn = self.loss_fn

        def epoch_fn(data):
            def fn(carry, rng):
                g_params, state, d_params, g_opt, d_opt = carry
                perm_rng, drop_rng = jax.random.split(rng)
                perm = jax.random.permutation(perm_rng, n)
                idx = jnp.concatenate(
                    [perm, jnp.broadcast_to(perm[:1], (n_pad - n,))]
                ).reshape(steps, cfg.batch_size)
                step_rngs = jax.random.split(drop_rng, steps)

                def step_fn(c, scan_in):
                    g_params, state, d_params, g_opt, d_opt = c
                    bidx, bw, brng = scan_in
                    batch = {k: v[bidx] for k, v in data.items()}
                    batch["w"] = bw
                    keys = jax.random.split(brng, 2 + 2 * n_crit)
                    r_aug, r_g = keys[0], keys[1]
                    r_fakes = keys[2:2 + n_crit]
                    r_gps = keys[2 + n_crit:]
                    if augment_fn is not None:
                        # one draw per step: critic and generator see the
                        # same augmented pair
                        batch = augment_fn(r_aug, batch)
                    wsum = jnp.maximum(jnp.sum(bw), 1.0)
                    wmean = lambda s: jnp.sum(s * bw) / wsum

                    # -- critic: fake from the current generator, no grads
                    # through it (unet.py:277-293 gradient-penalty semantics).
                    # A FRESH generator sample (new dropout rng) is drawn per
                    # critic iteration per WGAN-GP (Gulrajani et al. 2017);
                    # the real minibatch is shared across the n_critic
                    # iterations (deviation from the paper's fresh minibatch
                    # per critic step — the compiled epoch scan owns the
                    # batch schedule).
                    wdist = gp_val = 0.0
                    for i in range(n_crit):
                        fake, _ = net_apply(
                            g_params, state, batch["x"], True, rng=r_fakes[i]
                        )
                        fake = jax.lax.stop_gradient(fake)

                        def d_loss_fn(dp):
                            s_real = critic_apply(dp, batch["y"], batch["x"])
                            s_fake = critic_apply(dp, fake, batch["x"])
                            wdist = wmean(s_real) - wmean(s_fake)
                            gp = L.gradient_penalty(
                                r_gps[i],
                                lambda img: critic_apply(dp, img, batch["x"]),
                                batch["y"],
                                fake,
                            )
                            return -wdist + lam_gp * gp, (wdist, gp)

                        (_, (wdist, gp_val)), d_grads = jax.value_and_grad(
                            d_loss_fn, has_aux=True
                        )(d_params)
                        d_updates, d_opt = d_tx.update(d_grads, d_opt, d_params)
                        d_params = optax.apply_updates(d_params, d_updates)

                    # -- generator: content + adversarial term
                    def g_loss_fn(gp_):
                        out, new_state = net_apply(
                            gp_, state, batch["x"], True, rng=r_g
                        )
                        content, aux = content_loss(out, batch)
                        adv = -wmean(critic_apply(d_params, out, batch["x"]))
                        aux = dict(aux)
                        aux["adv"] = adv
                        aux["wasserstein"] = wdist
                        aux["gp"] = gp_val
                        return content + lam_adv * adv, (new_state, aux)

                    (loss, (new_state, aux)), grads = jax.value_and_grad(
                        g_loss_fn, has_aux=True
                    )(g_params)
                    g_updates, g_opt = g_tx.update(grads, g_opt, g_params)
                    g_params = optax.apply_updates(g_params, g_updates)
                    return (
                        (g_params, new_state, d_params, g_opt, d_opt),
                        (loss, aux),
                    )

                (g_params, state, d_params, g_opt, d_opt), (losses, auxes) = (
                    jax.lax.scan(
                        step_fn,
                        (g_params, state, d_params, g_opt, d_opt),
                        (idx, train_w, step_rngs),
                    )
                )
                epoch_loss = jnp.mean(losses)
                epoch_aux = jax.tree_util.tree_map(jnp.mean, auxes)
                return (
                    (g_params, state, d_params, g_opt, d_opt),
                    (epoch_loss, epoch_aux),
                )

            return fn

        @partial(jax.jit, static_argnames=("n_epochs",), donate_argnums=(0,))
        def run_epochs(carry, rng, data, n_epochs):
            rngs = jax.random.split(rng, n_epochs)
            carry, (losses, auxes) = jax.lax.scan(epoch_fn(data), carry, rngs)
            return carry, (
                losses[-1],
                jax.tree_util.tree_map(lambda a: a[-1], auxes),
            )

        test_idx = jnp.concatenate(
            [jnp.arange(tn), jnp.broadcast_to(jnp.arange(1), (tn_pad - tn,))]
        ).reshape(tsteps, cfg.batch_size)

        @jax.jit
        def eval_loss(g_params, state, data):
            # content loss only (the scrapeable test_mse: line must stay a
            # reconstruction metric, not a moving adversarial target)
            def step_fn(_, scan_in):
                bidx, bw = scan_in
                batch = {k: v[bidx] for k, v in data.items()}
                batch["w"] = bw
                loss, (_, aux) = eval_loss_fn(
                    g_params, state, jax.random.PRNGKey(0), batch, False
                )
                return None, (loss, aux)

            _, (losses, auxes) = jax.lax.scan(step_fn, None, (test_idx, test_w))
            return jnp.mean(losses), jax.tree_util.tree_map(jnp.mean, auxes)

        cache[key] = (g_tx, d_tx, run_epochs, eval_loss)
        return cache[key]
