"""Plain convolutional autoencoder model.

Lifecycle, hyperparameters, checkpoint folder format and stdout surface match
the reference ``ConvAEModel`` (``models/conv_ae_model.py:33-380``): Encoder ->
Decoder with MSE loss, Adam with L2 weight decay, epoch loop with
``test_interval`` evaluation cadence and loss history, optional sqlite
tracking, auto-save to ``model_path`` and post-train metric evaluation.

The compute path is TPU-native: NHWC Flax-free functional modules
(`nn.modules.ConvEncoder/ConvDecoder`), a fully compiled epoch x batch
``lax.scan`` training loop (`train.Trainer`) with the whole dataset resident
on the device/mesh, and a single-dispatch batched apply.

Checkpoint folder contents (interchangeable with the reference):
``encoder.weights``/``decoder.weights`` (torch state_dicts),
``normalisation.weights`` (JSON), ``parameters.json``, ``spec.json``,
``history.json``, ``summary.txt``, ``input_spec.json``, ``output_spec.json``.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from ..data.dataset import ArrayDataset
from ..nn import modules as M
from ..nn import torchio
from ..train.loop import TrainConfig
from ..utils.model_database import ModelDatabase
from .base import BaseModel
from .sizer import ModelSpec, create_model_spec


class ConvAEModel(BaseModel):
    MODEL_TYPE = "ConvAEModel"
    DB_TYPE = "ConvAE"

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
        use_gpu=True,
        conv_kernel_size=3,
        conv_stride=2,
        conv_input_layer_count=None,
        conv_output_layer_count=None,
        database_path=None,
    ):
        """Create a convolutional autoencoder general model.

        Parameters mirror the reference ctor (``conv_ae_model.py:35-57``);
        ``use_gpu`` is accepted for API compatibility (device selection is
        JAX-platform driven here).
        """
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
        self.use_gpu = use_gpu
        self.conv_kernel_size = conv_kernel_size
        self.conv_stride = conv_stride
        self.conv_input_layer_count = conv_input_layer_count
        self.conv_output_layer_count = conv_output_layer_count
        self.spec = None
        self.history = {"train_loss": [], "test_loss": [], "nr_epochs": 0}
        self.db = ModelDatabase(database_path) if database_path else None

        self.encoder = None  # nn.modules.ConvEncoder
        self.decoder = None
        self.params = None  # {"encoder": ..., "decoder": ...}
        self.state = None

    # ---- persistence surface (conv_ae_model.py:81-183) --------------------
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
            "weight_decay": self.weight_decay,
            "normalise_input": self.normalise_input,
            "normalise_output": self.normalise_output,
            "conv_kernel_size": self.conv_kernel_size,
            "conv_stride": self.conv_stride,
            "conv_input_layer_count": self.conv_input_layer_count,
            "conv_output_layer_count": self.conv_output_layer_count,
            "model_id": self.get_model_id(),
        }

    def save(self, to_folder):
        os.makedirs(to_folder, exist_ok=True)
        torchio.save_state_dict(
            os.path.join(to_folder, "encoder.weights"),
            torchio.conv_encoder_to_state_dict(
                self.encoder, self.params["encoder"], self.state["encoder"]
            ),
        )
        torchio.save_state_dict(
            os.path.join(to_folder, "decoder.weights"),
            torchio.conv_decoder_to_state_dict(
                self.decoder, self.params["decoder"], self.state["decoder"]
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

    def _load_parameters(self, parameters):
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
        self.normalise_input = parameters["normalise_input"]
        self.normalise_output = parameters["normalise_output"]
        self.conv_kernel_size = parameters.get("conv_kernel_size", None)
        self.conv_stride = parameters.get("conv_stride", None)
        self.conv_input_layer_count = parameters.get("conv_input_layer_count", None)
        self.conv_output_layer_count = parameters.get("conv_output_layer_count", None)

    def load(self, from_folder):
        with open(os.path.join(from_folder, "normalisation.weights")) as f:
            self.normalisation_parameters = json.loads(f.read())
        with open(os.path.join(from_folder, "parameters.json")) as f:
            self._load_parameters(json.loads(f.read()))
        with open(os.path.join(from_folder, "history.json")) as f:
            self.history = json.loads(f.read())
        with open(os.path.join(from_folder, "spec.json")) as f:
            self.spec = ModelSpec()
            self.spec.load(json.loads(f.read()))

        self._build_modules()
        enc_sd = torchio.load_state_dict(
            os.path.join(from_folder, "encoder.weights")
        )
        enc_p, enc_s = torchio.conv_encoder_from_state_dict(self.encoder, enc_sd)
        dec_sd = torchio.load_state_dict(
            os.path.join(from_folder, "decoder.weights")
        )
        dec_p, dec_s = torchio.conv_decoder_from_state_dict(self.decoder, dec_sd)
        self.params = {"encoder": enc_p, "decoder": dec_p}
        self.state = {"encoder": enc_s, "decoder": dec_s}
        self._apply_cache = {}
        super().load(from_folder)

    # ---- model construction ----------------------------------------------
    def _build_modules(self):
        self.encoder = M.ConvEncoder(
            self.spec.get_input_layers(), self.encoded_dim_size, self.fc_size
        )
        self.decoder = M.ConvDecoder(
            self.spec.get_output_layers(), self.encoded_dim_size, self.fc_size
        )

    def _init_params(self, rng):
        enc_p, enc_s = self.encoder.init(jax.random.fold_in(rng, 0))
        dec_p, dec_s = self.decoder.init(jax.random.fold_in(rng, 1))
        self.params = {"encoder": enc_p, "decoder": dec_p}
        self.state = {"encoder": enc_s, "decoder": dec_s}

    def _use_fused_decoder(self):
        """Fused Pallas decoder tail on the apply path (TPU default).

        ``CAE_TPU_FUSED_DECODER=1|0`` overrides; geometry must satisfy
        ``decoder_kernel.tail_start_index``.  Tap math is f32 VPU; the
        parity-interleave matmuls follow the conv-precision ladder
        (``decoder_kernel._ilv_mode`` — at the HIGH default the 2-pass
        compensated interleave measures 1.3e-6 vs the XLA path).
        """
        choice = os.environ.get("CAE_TPU_FUSED_DECODER")
        if choice is not None and choice != "1":
            return False
        if choice is None and jax.default_backend() != "tpu":
            return False
        from ..ops.pallas.decoder_kernel import tail_start_index

        return (
            self.decoder is not None
            and tail_start_index(self.decoder) is not None
        )

    def _forward_eval_p(self, params, state, x):
        z, _ = self.encoder.apply(
            params["encoder"], state["encoder"], x, train=False
        )
        if self._use_fused_decoder():
            from ..ops.pallas.decoder_kernel import decoder_apply_fused_tail

            return decoder_apply_fused_tail(
                self.decoder, params["decoder"], state["decoder"], z,
                interpret=jax.default_backend() != "tpu",
            )
        y, _ = self.decoder.apply(
            params["decoder"], state["decoder"], z, train=False
        )
        return y

    def _forward_denorm_nchw_p(self, params, state, x, lo, rng):
        # product apply: fold the denormalisation affine into the Pallas
        # tail's final activation and emit NCHW natively — saves the
        # full-resolution XLA affine pass the kernel boundary would
        # otherwise force (see BaseModel._forward_denorm_nchw_p)
        if not self._use_fused_decoder():
            return super()._forward_denorm_nchw_p(params, state, x, lo, rng)
        from ..ops.pallas.decoder_kernel import decoder_apply_fused_tail

        z, _ = self.encoder.apply(
            params["encoder"], state["encoder"], x, train=False
        )
        return decoder_apply_fused_tail(
            self.decoder, params["decoder"], state["decoder"], z,
            interpret=jax.default_backend() != "tpu",
            denorm=(lo, rng), nchw_out=True, out_dtype=self._out_dtype(),
        )

    def _use_fused_train_tail(self):
        """Fused ConvT+sigmoid+SSE Pallas pair on the training loss (TPU
        default).  Shared env/backend/mesh gates live in
        ``BaseModel._fused_tail_base_ok``; the final decoder stage must
        additionally satisfy ``train_tail.last_stage_eligible``.  Under a
        data-parallel mesh the kernel runs per batch shard via
        ``shard_map`` (``train_tail._shard_map_batch``).  f32 VPU tap
        math; the MXU interleave rides 1-pass bf16 input rounding —
        deliberate for gradients (see the ``train_tail`` module
        docstring), with loss-curve parity test-asserted vs XLA.
        """
        if not self._fused_tail_base_ok():
            return False
        from ..ops.pallas.train_tail import last_stage_eligible

        return (
            self.decoder is not None
            and last_stage_eligible(self.decoder.layers[-1])
        )

    def _make_loss_fn(self):
        encoder, decoder = self.encoder, self.decoder

        if self._use_fused_train_tail():
            from ..ops.pallas.train_tail import last_stage_sse

            interpret = jax.default_backend() != "tpu"
            mesh = self.mesh
            o_c, o_h, o_w = decoder.layers[-1].get_output_dimensions()
            denom = float(o_c * o_h * o_w)

            def loss_fn(params, state, rng, batch, train):
                z, enc_s = encoder.apply(
                    params["encoder"], state["encoder"], batch["x"], train
                )
                h, dec_s = decoder.apply_head(
                    params["decoder"], state["decoder"], z, train
                )
                cp = params["decoder"]["convs"][-1]
                sse = last_stage_sse(
                    cp["w"], cp["b"], h, batch["y"], interpret=interpret,
                    mesh=mesh,
                )
                per_sample = sse / denom
                w = batch["w"]
                loss = jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)
                return loss, ({"encoder": enc_s, "decoder": dec_s}, {})

            return loss_fn

        def loss_fn(params, state, rng, batch, train):
            z, enc_s = encoder.apply(
                params["encoder"], state["encoder"], batch["x"], train
            )
            out, dec_s = decoder.apply(
                params["decoder"], state["decoder"], z, train
            )
            per_sample = jnp.mean((out - batch["y"]) ** 2, axis=(1, 2, 3))
            w = batch["w"]
            loss = jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)
            return loss, ({"encoder": enc_s, "decoder": dec_s}, {})

        return loss_fn

    # ---- training (conv_ae_model.py:241-359) ------------------------------
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
        """Train (or continue training) on xarray-style datasets of
        (N, CHAN, Y, X) variables."""
        train_ds = ArrayDataset(
            training_ds,
            input_variables,
            output_variable,
            normalise_in=self.normalise_input,
            normalise_out=self.normalise_output,
            mask_variable_name=mask_variable_name,
        )
        self.normalisation_parameters = train_ds.get_normalisation_parameters()
        self.set_input_spec(train_ds.get_input_spec())
        self.set_output_spec(train_ds.get_output_spec())

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

        x_tr, y_tr, _ = train_ds.arrays_nhwc()
        x_te, y_te, _ = test_ds.arrays_nhwc()

        config = TrainConfig(
            batch_size=self.batch_size,
            nr_epochs=self.nr_epochs,
            test_interval=self.test_interval,
            lr=self.lr,
            weight_decay=self.weight_decay,
            optimizer="adam_l2",
            **self._schedule_kwargs("constant"),
        )
        trainer = self._make_trainer(
            self._make_loss_fn(), config, {"x": x_tr, "y": y_tr}
        )
        self._configure_checkpointing(trainer, model_path)

        def log_fn(epoch, train_loss, test_loss, train_aux, test_aux, lr):
            print("%5d %.6f %.6f" % (epoch, train_loss, test_loss))

        params, state, train_loss, test_loss = trainer.fit(
            self.params,
            self.state,
            {"x": x_tr, "y": y_tr},
            {"x": x_te, "y": y_te},
            self.history,
            log_fn=log_fn,
        )
        self.params = jax.device_get(params)
        self.state = jax.device_get(state)
        self._apply_cache = {}

        elapsed = time.time() - start
        self.history["nr_epochs"] = self.history["nr_epochs"] + self.nr_epochs
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
        """Text summary of the layer structure (conv_ae_model.py:362-380)."""
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
