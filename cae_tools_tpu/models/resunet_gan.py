"""Adversarially-trained residual UNet — the ``resunet_gan`` method.

The reference CLI accepts ``--method resunet_gan`` (``cli/train_cae.py:42``)
but never constructs it (``cli/train_cae.py:127-138``), and its UNET class
carries an unused WGAN-GP ``compute_gradient_penalty`` method
(``unet.py:277-293``) marking the intended design.  This class provides the
capability: the generator is the :class:`UNETRes` residual UNet, trained
with the UNET content loss (masked MSE + Pearson) plus a
``lambda_adv``-weighted Wasserstein adversarial term from a conditional
PatchGAN critic (``nn.modules.PatchCritic``), critic regularised with the
``lambda_gp`` gradient penalty — the WGAN-GP recipe the leftover implies.

Lifecycle/persistence follow the UNET folder format, with the critic stored
additively in ``disc.weights`` so ``--continue-training`` resumes both
players.  The test-loss stdout line remains the content MSE (``test_mse:``
format scraped by ``hypar_optim.py:82``), never the adversarial loss.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

from ..nn import modules as M
from ..nn import torchio
from .unet_model import UNETRes


class ResUNetGAN(UNETRes):
    MODEL_TYPE = "ResUNetGAN"
    DB_TYPE = "ResUNetGAN"

    def __init__(
        self,
        lambda_adv=1e-3,
        lambda_gp=10.0,
        n_critic=1,
        critic_base_channels=32,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.lambda_adv = lambda_adv
        self.lambda_gp = lambda_gp
        self.n_critic = n_critic
        self.critic_base_channels = critic_base_channels
        self.critic = None  # nn.modules.PatchCritic

    def get_parameters(self):
        p = super().get_parameters()
        p["lambda_adv"] = self.lambda_adv
        p["lambda_gp"] = self.lambda_gp
        p["n_critic"] = self.n_critic
        p["critic_base_channels"] = self.critic_base_channels
        return p

    # ---- module construction ----------------------------------------------
    def _build_modules(self):
        super()._build_modules()
        self.critic = M.PatchCritic(
            image_shape=tuple(self.output_shape),
            cond_channels=self.input_shape[0],
            base_channels=self.critic_base_channels,
        )

    def _init_params(self, rng):
        super()._init_params(rng)
        self.params["disc"] = self.critic.init(jax.random.fold_in(rng, 7))

    def _critic_apply(self, d_params, img, x_lowres):
        """Score images conditioned on the bilinear-upsampled input."""
        _, oy, ox = self.output_shape
        cond = jax.image.resize(
            x_lowres,
            (x_lowres.shape[0], oy, ox, x_lowres.shape[3]),
            method="bilinear",
        )
        return self.critic.apply(d_params, img, cond=cond)

    def _net_apply(self, params, state, x, train, rng=None):
        # the generator forward must not see the critic params (grads for
        # the generator step are taken over everything it receives)
        g_params = {k: v for k, v in params.items() if k != "disc"}
        return super()._net_apply(g_params, state, x, train, rng=rng)

    # ---- training -----------------------------------------------------------
    def _make_trainer(self, loss_fn, config, train_data):
        from ..train.gan import GANTrainer
        from ..train.stream import (DEVICE_RESIDENT_LIMIT_BYTES,
                                    data_disk_backed, data_nbytes)

        # the adversarial trainer is device-resident only (no streaming
        # twin); fail fast instead of silently bypassing the pick_trainer
        # size check every other model family goes through
        if data_disk_backed(train_data):
            raise ValueError(
                "resunet_gan has no streaming trainer; disk-backed "
                "datasets (--host-memory-budget) require a "
                "non-adversarial method"
            )
        if getattr(self, "streaming", False):
            raise ValueError(
                "resunet_gan has no streaming trainer; unset "
                "model.streaming or use a non-adversarial method"
            )
        nbytes = data_nbytes(train_data)
        if nbytes > DEVICE_RESIDENT_LIMIT_BYTES:
            raise ValueError(
                f"training data ({nbytes / 1e9:.2f} GB) exceeds the "
                f"device-resident budget "
                f"({DEVICE_RESIDENT_LIMIT_BYTES / 1e9:.2f} GB) and "
                "resunet_gan has no streaming trainer; reduce the dataset "
                "or train on a larger mesh"
            )
        return GANTrainer(
            loss_fn,
            config,
            mesh=self.mesh,
            net_apply=self._net_apply,
            content_loss=self._make_content_loss(),
            critic_apply=self._critic_apply,
            lambda_adv=self.lambda_adv,
            lambda_gp=self.lambda_gp,
            n_critic=self.n_critic,
            augment_fn=self._augment_fn(),
        )

    # ---- persistence ---------------------------------------------------------
    def save(self, to_folder):
        super().save(to_folder)
        torchio.save_state_dict(
            os.path.join(to_folder, "disc.weights"),
            torchio.flatten_pytree(self.params["disc"]),
        )

    def load(self, from_folder):
        super().load(from_folder)
        with open(os.path.join(from_folder, "parameters.json")) as f:
            parameters = json.loads(f.read())
        self.lambda_adv = parameters.get("lambda_adv", 1e-3)
        self.lambda_gp = parameters.get("lambda_gp", 10.0)
        self.n_critic = parameters.get("n_critic", 1)
        self.critic_base_channels = parameters.get("critic_base_channels", 32)
        self.critic = M.PatchCritic(
            image_shape=tuple(self.output_shape),
            cond_channels=self.input_shape[0],
            base_channels=self.critic_base_channels,
        )
        self.params["disc"] = torchio.unflatten_pytree(
            torchio.load_state_dict(os.path.join(from_folder, "disc.weights"))
        )
