"""UNet-style skip-connection autoencoder — the production model for LST
downscaling in the reference (``models/unet.py:200-695``).

Parity surface:
 * hyperparameters incl. ``dropout_rate``, ``lambda_l1``, ``lambda_pearson``
   (``unet.py:201-204``) and the ``get_parameters`` dict (``unet.py:255-275``)
 * loss = masked MSE + lambda_pearson * (1 - masked Pearson)
   (``unet.py:316-321``), AdamW + CosineAnnealingLR(T_max=500, eta_min=lr)
   stepped per epoch while epoch < T_max (``unet.py:457-459,486-487``)
 * stdout: the ``test_mse:`` line format that ``hypar_optim.py:82`` regex
   scrapes, plus the ``learn rate:`` line (``unet.py:495-496``)
 * KeyboardInterrupt-safe training (``unet.py:483-507``)
 * model folder: same JSON files.  Checkpoints written by the *reference*
   (torch state dicts per ``unet.py:551-633``, which exist only for
   hand-authored layer specs whose concat channel math closes) are detected
   on load and mapped onto the raw-concat compat decoder
   (``UNetDecoder(compat_concat=True)``); models trained here with
   auto-solved specs use the spec-closing attention+project+fuse decoder
   and a flat pytree weights format (the reference has no corresponding
   architecture to exchange with).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import ArrayDataset
from ..nn import modules as M
from ..nn import torchio
from ..ops import losses as L
from ..train.loop import TrainConfig
from ..utils.model_database import ModelDatabase
from .base import BaseModel
from .sizer import ModelSpec, create_model_spec


class UNET(BaseModel):
    MODEL_TYPE = "UNET"
    DB_TYPE = "UNET"

    def __init__(
        self,
        normalise_input=True,
        normalise_output=True,
        batch_size=10,
        nr_epochs=500,
        test_interval=10,
        encoded_dim_size=32,
        fc_size=128,
        lr=0.001,
        weight_decay=1e-5,
        dropout_rate=0.1,
        use_gpu=True,
        conv_kernel_size=3,
        conv_stride=2,
        conv_input_layer_count=None,
        conv_output_layer_count=None,
        database_path=None,
        lambda_l1=0.001,
        lambda_pearson=1,
    ):
        super().__init__()
        self.normalise_input = normalise_input
        self.normalise_output = normalise_output
        self.normalisation_parameters = None
        self.input_shape = self.output_shape = None
        self.batch_size = batch_size
        self.nr_epochs = nr_epochs
        self.test_interval = test_interval
        self.encoded_dim_size = encoded_dim_size
        self.fc_size = fc_size
        self.lr = lr
        self.weight_decay = weight_decay
        self.dropout_rate = dropout_rate
        self.use_gpu = use_gpu
        self.conv_kernel_size = conv_kernel_size
        self.conv_stride = conv_stride
        self.conv_input_layer_count = conv_input_layer_count
        self.conv_output_layer_count = conv_output_layer_count
        self.spec = None
        self.history = {"train_loss": [], "test_loss": [], "nr_epochs": 0}
        self.db = ModelDatabase(database_path) if database_path else None
        self.lambda_l1 = lambda_l1
        self.lambda_pearson = lambda_pearson

        self.encoder = None  # nn.modules.UNetEncoder
        self.decoder = None  # nn.modules.UNetDecoder
        self.params = None
        self.state = None

    def get_parameters(self):
        return {
            "type": self.MODEL_TYPE,
            "input_shape": list(self.input_shape),
            "output_shape": list(self.output_shape),
            "batch_size": self.batch_size,
            "test_interval": self.test_interval,
            "encoded_dim_size": self.encoded_dim_size,
            "fc_size": self.fc_size,
            "lr": self.lr,
            "lambda_pearson": self.lambda_pearson,
            "weight_decay": self.weight_decay,
            "dropout_rate": self.dropout_rate,
            "normalise_input": self.normalise_input,
            "normalise_output": self.normalise_output,
            "conv_kernel_size": self.conv_kernel_size,
            "conv_stride": self.conv_stride,
            "conv_input_layer_count": self.conv_input_layer_count,
            "conv_output_layer_count": self.conv_output_layer_count,
            "model_id": self.get_model_id(),
        }

    # ---- module construction ----------------------------------------------
    def _skip_shapes(self):
        # post-ReLU activations of every encoder layer except the last
        # (unet.py:104-111); shapes in encoder order as (C, Y, X)
        return [
            tuple(l.get_output_dimensions())
            for l in self.spec.get_input_layers()[:-1]
        ]

    def _build_modules(self):
        self.encoder = M.UNetEncoder(
            self.spec.get_input_layers(),
            self.encoded_dim_size,
            self.fc_size,
            dropout_rate=self.dropout_rate,
        )
        self.decoder = M.UNetDecoder(
            self.spec.get_output_layers(),
            self.encoded_dim_size,
            self.fc_size,
            dropout_rate=self.dropout_rate,
            skip_shapes=self._skip_shapes(),
        )

    def _init_params(self, rng):
        enc_p, enc_s = self.encoder.init(jax.random.fold_in(rng, 0))
        dec_p, dec_s = self.decoder.init(jax.random.fold_in(rng, 1))
        self.params = {"encoder": enc_p, "decoder": dec_p}
        self.state = {"encoder": enc_s, "decoder": dec_s}

    def _net_apply(self, params, state, x, train, rng=None):
        """Full network forward; overridden by residual variants."""
        r_enc = r_dec = None
        if rng is not None:
            r_enc, r_dec = jax.random.split(rng)
        (z, skips), enc_s = self.encoder.apply(
            params["encoder"], state["encoder"], x, train, rng=r_enc
        )
        out, dec_s = self.decoder.apply(
            params["decoder"], state["decoder"], z, skips, train, rng=r_dec
        )
        return out, {"encoder": enc_s, "decoder": dec_s}

    def _use_fused_decoder(self):
        """Fused Pallas tail on the apply path (TPU default; the skip-free
        trailing decoder stages carry ~95% of the apply HBM traffic).
        ``CAE_TPU_FUSED_DECODER=1|0`` overrides; geometry must satisfy
        ``decoder_kernel.unet_tail_start_index``."""
        choice = os.environ.get("CAE_TPU_FUSED_DECODER")
        if choice is not None and choice != "1":
            return False
        if choice is None and jax.default_backend() != "tpu":
            return False
        from ..ops.pallas.decoder_kernel import unet_tail_start_index

        return (
            self.decoder is not None
            and unet_tail_start_index(self.decoder) is not None
        )

    def _unet_core_eval(self, params, state, x):
        """Eval-mode encoder+decoder forward; fused tail when it applies."""
        (z, skips), _ = self.encoder.apply(
            params["encoder"], state["encoder"], x, train=False
        )
        if self._use_fused_decoder():
            from ..ops.pallas.decoder_kernel import (
                unet_decoder_apply_fused_tail,
            )

            return unet_decoder_apply_fused_tail(
                self.decoder, params["decoder"], state["decoder"], z, skips,
                interpret=jax.default_backend() != "tpu",
            )
        out, _ = self.decoder.apply(
            params["decoder"], state["decoder"], z, skips, train=False
        )
        return out

    def _forward_eval_p(self, params, state, x):
        return self._unet_core_eval(params, state, x)

    def _forward_denorm_nchw_p(self, params, state, x, lo, rng):
        # product apply: denorm affine folded into the fused Pallas tail
        # (see ConvAEModel._forward_denorm_nchw_p).  UNETRes overrides this
        # back to the XLA default — its residual head runs *after* the
        # core, and XLA fuses the affine into the head for free there.
        if not self._use_fused_decoder():
            return super()._forward_denorm_nchw_p(params, state, x, lo, rng)
        from ..ops.pallas.decoder_kernel import unet_decoder_apply_fused_tail

        (z, skips), _ = self.encoder.apply(
            params["encoder"], state["encoder"], x, train=False
        )
        return unet_decoder_apply_fused_tail(
            self.decoder, params["decoder"], state["decoder"], z, skips,
            interpret=jax.default_backend() != "tpu",
            denorm=(lo, rng), nchw_out=True, out_dtype=self._out_dtype(),
        )

    def _make_content_loss(self):
        """Content-loss term on a network output: masked MSE + Pearson
        (+ optional ``--additional-loss``).  Split from the forward pass so
        the adversarial trainer (``ResUNetGAN``) can reuse it."""
        lambda_pearson = self.lambda_pearson

        # optional additional term (--additional-loss); the reference
        # instantiates VGGPerceptualLoss but never adds any of the three
        # advertised losses to the training loss (unet.py:253, SURVEY §2.9;
        # contrastive/histogram are dead flags upstream) — here the flag
        # actually engages them
        additional = getattr(self, "additional_loss", None)
        percep = None
        percep_params = None
        lambda_additional = getattr(self, "lambda_additional", 1.0)
        if additional in ("perceptual", "contrastive"):
            percep = M.PerceptualFeatureLoss()
            percep_params = percep.init(
                in_channels=self.output_shape[0],
                filter_bank=getattr(self, "perceptual_weights", None),
            )
        elif additional not in (None, "histogram"):
            raise ValueError(
                f"unknown additional loss {additional!r}; expected "
                "'perceptual', 'contrastive' or 'histogram'"
            )

        def content_loss(out, batch):
            w = batch["w"][:, None, None, None]
            mask = jnp.broadcast_to(batch["m"], out.shape) * w
            mse = L.masked_mse(out, batch["y"], mask)
            corr = L.masked_pearson(out, batch["y"], mask)  # (N, C)
            wsum = jnp.maximum(jnp.sum(batch["w"]), 1.0)
            corr_mean = jnp.sum(
                jnp.mean(corr, axis=1) * batch["w"]
            ) / wsum
            pearson_loss = 1.0 - corr_mean
            loss = mse + lambda_pearson * pearson_loss
            if additional == "perceptual":
                loss = loss + lambda_additional * percep.loss(
                    percep_params, out, batch["y"]
                )
            elif additional == "contrastive":
                loss = loss + lambda_additional * L.contrastive_loss(
                    percep.embed(percep_params, out),
                    percep.embed(percep_params, batch["y"]),
                )
            elif additional == "histogram":
                loss = loss + lambda_additional * L.histogram_loss(
                    out, batch["y"]
                )
            aux = {"mse": mse, "pearson_loss": pearson_loss}
            return loss, aux

        return content_loss

    def _use_fused_train_tail(self):
        """Fused ConvT+sigmoid+masked-stats Pallas pair on the training
        loss (TPU default).  The final decoder stage's full-resolution
        output, activation-grad and loss-grad dominate the train step's HBM
        traffic; the fused pair reduces the stage to 7 per-(image, channel)
        masked moments in VMEM (``ops/pallas/train_tail.py``) from which
        masked MSE + Pearson are exact (``ops/losses.py::*_from_stats``).
        ``CAE_TPU_FUSED_TRAIN_TAIL=1|0`` overrides; requires the plain-UNET
        forward (residual variants override ``_net_apply``), a sigmoid
        head, no ``--additional-loss`` (those need the full-resolution
        output) and ``train_tail.last_stage_eligible`` geometry.  Under a
        data-parallel mesh the kernel runs per batch shard via
        ``shard_map``; meshes with a tensor-parallel "model" axis >1 keep
        the XLA loss.  f32 VPU tap math; the MXU interleave rides 1-pass
        bf16 input rounding — deliberate for gradients (see the
        ``train_tail`` module docstring).
        """
        if not self._fused_tail_base_ok():
            return False
        if type(self)._net_apply is not UNET._net_apply:
            return False  # residual heads have their own fused form
        from ..ops.pallas.train_tail import last_stage_eligible

        return (
            self.decoder is not None
            and self.decoder.final_sigmoid
            and last_stage_eligible(self.decoder.layers[-1])
        )

    # shared env/backend/mesh/additional-loss gates: BaseModel._fused_tail_base_ok

    def _make_fused_loss_fn(self):
        from ..ops.pallas.train_tail import last_stage_masked_stats

        encoder, decoder = self.encoder, self.decoder
        lambda_pearson = self.lambda_pearson
        interpret = jax.default_backend() != "tpu"
        mesh = self.mesh

        def loss_fn(params, state, rng, batch, train):
            r_enc = r_dec = None
            if rng is not None:
                r_enc, r_dec = jax.random.split(rng)
            (z, skips), enc_s = encoder.apply(
                params["encoder"], state["encoder"], batch["x"], train,
                rng=r_enc,
            )
            h, dec_s = decoder.apply_head(
                params["decoder"], state["decoder"], z, skips, train,
                rng=r_dec,
            )
            cp = params["decoder"]["convs"][-1]
            stats = last_stage_masked_stats(
                cp["w"], cp["b"], h, batch["y"], batch["m"],
                interpret=interpret, mesh=mesh,
            )
            w = batch["w"]
            mse = L.masked_mse_from_stats(stats, w)
            corr = L.masked_pearson_from_stats(stats, w)  # (N, C)
            wsum = jnp.maximum(jnp.sum(w), 1.0)
            corr_mean = jnp.sum(jnp.mean(corr, axis=1) * w) / wsum
            pearson_loss = 1.0 - corr_mean
            loss = mse + lambda_pearson * pearson_loss
            aux = {"mse": mse, "pearson_loss": pearson_loss}
            return loss, ({"encoder": enc_s, "decoder": dec_s}, aux)

        return loss_fn

    def _make_loss_fn(self):
        if self._use_fused_train_tail():
            return self._make_fused_loss_fn()

        content_loss = self._make_content_loss()
        net_apply = self._net_apply

        def loss_fn(params, state, rng, batch, train):
            out, new_state = net_apply(params, state, batch["x"], train, rng=rng)
            loss, aux = content_loss(out, batch)
            return loss, (new_state, aux)

        return loss_fn

    # ---- training (unet.py:388-529) ----------------------------------------
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
        train_ds = ArrayDataset(
            training_ds,
            input_variables,
            output_variable,
            normalise_in=self.normalise_input,
            normalise_out=self.normalise_output,
            mask_variable_name=mask_variable_name,
        )
        self.set_input_spec(train_ds.get_input_spec())
        self.set_output_spec(train_ds.get_output_spec())
        self.normalisation_parameters = train_ds.get_normalisation_parameters()

        test_ds = ArrayDataset(
            testing_ds,
            input_variables,
            output_variable,
            normalise_in=self.normalise_input,
            normalise_out=self.normalise_output,
            mask_variable_name=mask_variable_name,
        )
        test_ds.set_normalisation_parameters(self.normalisation_parameters)

        self.input_shape = train_ds.get_input_shape()
        self.output_shape = train_ds.get_output_shape()

        if not self.spec:
            (input_chan, input_y, input_x) = self.input_shape
            (output_chan, output_y, output_x) = self.output_shape
            self.spec = create_model_spec(
                input_size=(input_y, input_x),
                input_channels=input_chan,
                output_size=(output_y, output_x),
                output_channels=output_chan,
                kernel_size=self.conv_kernel_size,
                stride=self.conv_stride,
                input_layer_count=self.conv_input_layer_count,
                output_layer_count=self.conv_output_layer_count,
            )

        if self.encoder is None or self.params is None:
            self._build_modules()
            self._init_params(jax.random.PRNGKey(int(time.time_ns()) % (2**31)))

        print(f"Running on device: {jax.devices()[0].platform}")
        start = time.time()

        x_tr, y_tr, m_tr = train_ds.arrays_nhwc()
        x_te, y_te, m_te = test_ds.arrays_nhwc()

        config = TrainConfig(
            batch_size=self.batch_size,
            nr_epochs=self.nr_epochs,
            test_interval=self.test_interval,
            lr=self.lr,
            weight_decay=self.weight_decay,
            optimizer="adamw",
            t_max=500,
            eta_min=self.lr,  # reference quirk: scheduler is a no-op (unet.py:459)
            **self._schedule_kwargs("cosine"),
        )
        trainer = self._make_trainer(
            self._make_loss_fn(), config, {"x": x_tr, "y": y_tr, "m": m_tr}
        )
        self._configure_checkpointing(trainer, model_path)

        def log_fn(epoch, train_loss, test_loss, train_aux, test_aux, lr):
            print(
                f"epoch: {epoch}, train_mse: {train_aux['mse']:.6f}, "
                f"train_pearson_loss: {train_aux['pearson_loss']:.4f}, "
                f"test_mse: {test_aux['mse']:.6f}, "
                f"test_pearson_loss: {test_aux['pearson_loss']:.4f}"
            )
            print(f"learn rate: {lr:.6f}")

        params, state = self.params, self.state
        train_loss = test_loss = 0.0
        try:
            params, state, train_loss, test_loss = trainer.fit(
                self.params,
                self.state,
                {"x": x_tr, "y": y_tr, "m": m_tr},
                {"x": x_te, "y": y_te, "m": m_te},
                self.history,
                log_fn=log_fn,
            )
        except KeyboardInterrupt:
            print("Training interrupted. Performing cleanup...")
        finally:
            elapsed = time.time() - start

        self.params = jax.device_get(params)
        self.state = jax.device_get(state)
        self._apply_cache = {}

        self.history["nr_epochs"] += self.nr_epochs
        print("elapsed:" + str(elapsed))

        if self.db:
            self.db.add_training_result(
                self.get_model_id(),
                self.DB_TYPE,
                output_variable,
                input_variables,
                self.summary(),
                model_path,
                training_paths,
                train_loss,
                testing_paths,
                test_loss,
                self.get_parameters(),
                self.spec.save(),
            )
        if model_path:
            self.save(model_path)

        metrics = {}
        metrics["test"] = self.evaluate(test_ds)
        metrics["train"] = self.evaluate(train_ds)
        self.dump_metrics("Test Metrics", metrics["test"])
        self.dump_metrics("Train Metrics", metrics["train"])

        if self.db:
            self.db.add_evaluation_result(
                self.get_model_id(), training_paths, testing_paths, metrics
            )

    def summary(self):
        if self.spec:
            s = "Model Summary:\n"
            for input_spec in self.spec.input_layers:
                s += str(input_spec)
            s += "\tFully Connected Layer:\n"
            s += f"\t\tsize={self.fc_size}\n"
            s += "\tLatent Vector:\n"
            s += f"\t\tsize={self.encoded_dim_size}\n"
            s += "\tFully Connected Layer:\n"
            s += f"\t\tsize={self.fc_size}\n"
            for output_spec in self.spec.output_layers:
                s += str(output_spec)
            return s
        return "Model has not been trained - no layers assigned yet"

    # ---- persistence -------------------------------------------------------
    def save(self, to_folder):
        os.makedirs(to_folder, exist_ok=True)
        if self.decoder.compat_concat:
            # reference-architecture model: persist in the reference's torch
            # key format so checkpoints stay loadable by the reference
            # library after fine-tuning here (two-way interop)
            torchio.save_state_dict(
                os.path.join(to_folder, "encoder.weights"),
                torchio.unet_encoder_to_state_dict(
                    self.encoder, self.params["encoder"], self.state["encoder"]
                ),
            )
            torchio.save_state_dict(
                os.path.join(to_folder, "decoder.weights"),
                torchio.unet_decoder_compat_to_state_dict(
                    self.decoder, self.params["decoder"], self.state["decoder"]
                ),
            )
        else:
            torchio.save_state_dict(
                os.path.join(to_folder, "encoder.weights"),
                torchio.flatten_pytree(
                    {
                        "params": self.params["encoder"],
                        "state": self.state["encoder"],
                    }
                ),
            )
            torchio.save_state_dict(
                os.path.join(to_folder, "decoder.weights"),
                torchio.flatten_pytree(
                    {
                        "params": self.params["decoder"],
                        "state": self.state["decoder"],
                    }
                ),
            )
        with open(os.path.join(to_folder, "normalisation.weights"), "w") as f:
            f.write(json.dumps(self.normalisation_parameters))
        with open(os.path.join(to_folder, "parameters.json"), "w") as f:
            f.write(json.dumps(self.get_parameters()))
        with open(os.path.join(to_folder, "spec.json"), "w") as f:
            f.write(json.dumps(self.spec.save()))
        with open(os.path.join(to_folder, "history.json"), "w") as f:
            f.write(json.dumps(self.history))
        with open(os.path.join(to_folder, "summary.txt"), "w") as f:
            f.write(self.summary())
        super().save(to_folder)

    def load(self, from_folder):
        with open(os.path.join(from_folder, "normalisation.weights")) as f:
            self.normalisation_parameters = json.loads(f.read())
        with open(os.path.join(from_folder, "parameters.json")) as f:
            parameters = json.loads(f.read())
            if "model_id" in parameters:
                self.set_model_id(parameters["model_id"])
            self.input_shape = tuple(parameters["input_shape"])
            self.output_shape = tuple(parameters["output_shape"])
            self.batch_size = parameters["batch_size"]
            self.test_interval = parameters["test_interval"]
            self.encoded_dim_size = parameters["encoded_dim_size"]
            self.fc_size = parameters["fc_size"]
            self.lr = parameters["lr"]
            self.weight_decay = parameters["weight_decay"]
            self.dropout_rate = parameters.get("dropout_rate", 0.1)
            self.lambda_pearson = parameters.get("lambda_pearson", 1)
            self.normalise_input = parameters["normalise_input"]
            self.normalise_output = parameters["normalise_output"]
            self.conv_kernel_size = parameters.get("conv_kernel_size", None)
            self.conv_stride = parameters.get("conv_stride", None)
            self.conv_input_layer_count = parameters.get(
                "conv_input_layer_count", None
            )
            self.conv_output_layer_count = parameters.get(
                "conv_output_layer_count", None
            )
        with open(os.path.join(from_folder, "history.json")) as f:
            self.history = json.loads(f.read())
        with open(os.path.join(from_folder, "spec.json")) as f:
            self.spec = ModelSpec()
            self.spec.load(json.loads(f.read()))

        self._build_modules()
        enc_sd = torchio.load_state_dict(
            os.path.join(from_folder, "encoder.weights")
        )
        dec_sd = torchio.load_state_dict(
            os.path.join(from_folder, "decoder.weights")
        )
        if any(k.startswith("encoder_cnn.") for k in enc_sd):
            # reference-written checkpoint (unet.py:551-633 torch format,
            # hand-authored spec): rebuild with the raw-concat compat decoder
            self.decoder.compat_concat = True
            enc_p, enc_s = torchio.unet_encoder_from_state_dict(
                self.encoder, enc_sd
            )
            dec_p, dec_s = torchio.unet_decoder_compat_from_state_dict(
                self.decoder, dec_sd
            )
            self.params = {"encoder": enc_p, "decoder": dec_p}
            self.state = {"encoder": enc_s, "decoder": dec_s}
        else:
            enc = torchio.unflatten_pytree(enc_sd)
            dec = torchio.unflatten_pytree(dec_sd)
            self.params = {"encoder": enc["params"], "decoder": dec["params"]}
            self.state = {"encoder": enc["state"], "decoder": dec["state"]}
        self._apply_cache = {}
        super().load(from_folder)


class UNETRes(UNET):
    """Residual UNet ("unet_res" method).

    The reference CLI accepts ``--method unet_res`` and ``BaseModel.apply``
    device-moves a ``unet_res`` attribute (``base_model.py:140-141``), but no
    implementation shipped.  This variant predicts a *residual* over a
    bilinear-upsampled, 1x1-projected input base estimate: the UNet decoder
    runs without its final sigmoid and its output is added to the base —
    usually faster to converge for super-resolution because the identity
    mapping is free.
    """

    MODEL_TYPE = "UNETRes"
    DB_TYPE = "UNETRes"

    def _build_modules(self):
        super()._build_modules()
        self.decoder.final_sigmoid = False

    def _init_params(self, rng):
        super()._init_params(rng)
        cin = self.input_shape[0]
        cout = self.output_shape[0]
        self.params["base_proj"] = {
            "w": jnp.full((1, 1, cin, cout), 1.0 / cin, jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32),
        }
        # zero-ish residual start: initial output ~= the upsampled base
        self.params["res_scale"] = jnp.asarray(0.01, jnp.float32)

    def _residual_head(self, params, x, out):
        """base(bilinear-up, 1x1-projected input) + res_scale * out."""
        from ..ops.convops import conv2d

        _, oy, ox = self.output_shape
        up = jax.image.resize(
            x, (x.shape[0], oy, ox, x.shape[3]), method="bilinear"
        )
        base = conv2d(up, params["base_proj"]["w"]) + params["base_proj"]["b"]
        return base + params["res_scale"] * out

    def _net_apply(self, params, state, x, train, rng=None):
        out, new_state = super()._net_apply(params, state, x, train, rng=rng)
        return self._residual_head(params, x, out), new_state

    def _forward_eval_p(self, params, state, x):
        # fused-tail-capable core (linear final act), then the residual head
        out = self._unet_core_eval(params, state, x)
        return self._residual_head(params, x, out)

    def _forward_denorm_nchw_p(self, params, state, x, lo, rng):
        # the residual head runs after the core in XLA, which fuses the
        # denorm affine into it for free — do NOT inherit UNET's
        # fold-into-kernel form (it would skip the head)
        return BaseModel._forward_denorm_nchw_p(
            self, params, state, x, lo, rng
        )

    def _use_fused_train_tail(self):
        """Residual form of the fused training tail: the whole residual
        head (bilinear-up base + 1x1 projection + res_scale * ConvT) and
        the masked loss fuse in VMEM — bilinear resize rides two separable
        MXU matmuls (``train_tail.last_stage_residual_stats``).  Needs the
        base-projection input narrow enough for the VMEM guard."""
        if not self._fused_tail_base_ok():
            return False
        if self.decoder is None or self.decoder.final_sigmoid:
            return False
        from ..ops.pallas.train_tail import residual_stats_eligible

        return self.input_shape is not None and residual_stats_eligible(
            self.decoder.layers[-1], self.input_shape[0]
        )

    def _make_fused_loss_fn(self):
        from ..ops.pallas.train_tail import last_stage_residual_stats

        encoder, decoder = self.encoder, self.decoder
        lambda_pearson = self.lambda_pearson
        interpret = jax.default_backend() != "tpu"
        mesh = self.mesh

        def loss_fn(params, state, rng, batch, train):
            r_enc = r_dec = None
            if rng is not None:
                r_enc, r_dec = jax.random.split(rng)
            (z, skips), enc_s = encoder.apply(
                params["encoder"], state["encoder"], batch["x"], train,
                rng=r_enc,
            )
            h, dec_s = decoder.apply_head(
                params["decoder"], state["decoder"], z, skips, train,
                rng=r_dec,
            )
            cp = params["decoder"]["convs"][-1]
            bp = params["base_proj"]
            stats = last_stage_residual_stats(
                cp["w"], cp["b"], params["res_scale"], bp["w"], bp["b"],
                h, batch["x"], batch["y"], batch["m"],
                interpret=interpret, mesh=mesh,
            )
            w = batch["w"]
            mse = L.masked_mse_from_stats(stats, w)
            corr = L.masked_pearson_from_stats(stats, w)  # (N, C)
            wsum = jnp.maximum(jnp.sum(w), 1.0)
            corr_mean = jnp.sum(jnp.mean(corr, axis=1) * w) / wsum
            pearson_loss = 1.0 - corr_mean
            loss = mse + lambda_pearson * pearson_loss
            aux = {"mse": mse, "pearson_loss": pearson_loss}
            return loss, ({"encoder": enc_s, "decoder": dec_s}, aux)

        return loss_fn

    def save(self, to_folder):
        super().save(to_folder)
        torchio.save_state_dict(
            os.path.join(to_folder, "residual.weights"),
            torchio.flatten_pytree(
                {
                    "base_proj": self.params["base_proj"],
                    "res_scale": self.params["res_scale"],
                }
            ),
        )

    def load(self, from_folder):
        super().load(from_folder)
        blob = torchio.unflatten_pytree(
            torchio.load_state_dict(os.path.join(from_folder, "residual.weights"))
        )
        self.params["base_proj"] = blob["base_proj"]
        self.params["res_scale"] = blob["res_scale"]
