"""Single dense-layer baseline model.

Parity with reference ``LinearModel`` (``models/linear_model.py:30-349``):
flatten -> Linear -> unflatten, MSE loss, Adam with L2 decay, same lifecycle,
history, database hooks and metrics; weights persisted to a single ``weights``
file (torch state dict of the reference's ``Linear`` module,
``linear_model.py:85-86``).

Fix-forward (SURVEY.md §4 quirks): the ctor initialises the base class once
(the reference calls ``super().__init__()`` mid-train which resets the
model_id, ``linear_model.py:198``), and the database hook uses the correct
``testing_paths`` variable (reference references an undefined name,
``linear_model.py:281``).
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


class LinearModel(BaseModel):
    MODEL_TYPE = "LinearModel"

    def __init__(
        self,
        normalise_input=True,
        normalise_output=True,
        batch_size=10,
        nr_epochs=500,
        test_interval=10,
        lr=0.001,
        weight_decay=1e-5,
        use_gpu=True,
        database_path=None,
    ):
        """Create a simple linear model (``linear_model.py:32-47``)."""
        super().__init__()
        self.normalise_input = normalise_input
        self.normalise_output = normalise_output
        self.normalisation_parameters = None
        self.input_shape = self.output_shape = None
        self.batch_size = batch_size
        self.nr_epochs = nr_epochs
        self.test_interval = test_interval
        self.lr = lr
        self.weight_decay = weight_decay
        self.use_gpu = use_gpu
        self.history = {"train_loss": [], "test_loss": [], "nr_epochs": 0}
        self.db = ModelDatabase(database_path) if database_path else None

        self.linear = None  # nn.modules.LinearMap
        self.params = None
        self.state = {}

    def get_parameters(self):
        return {
            "model_id": self.get_model_id(),
            "type": self.MODEL_TYPE,
            "input_shape": list(self.input_shape),
            "output_shape": list(self.output_shape),
            "batch_size": self.batch_size,
            "test_interval": self.test_interval,
            "lr": self.lr,
            "weight_decay": self.weight_decay,
            "normalise_input": self.normalise_input,
            "normalise_output": self.normalise_output,
        }

    def save(self, to_folder):
        os.makedirs(to_folder, exist_ok=True)
        torchio.save_state_dict(
            os.path.join(to_folder, "weights"),
            torchio.linear_to_state_dict(self.linear, self.params),
        )
        with open(os.path.join(to_folder, "normalisation.weights"), "w") as f:
            f.write(json.dumps(self.normalisation_parameters))
        with open(os.path.join(to_folder, "parameters.json"), "w") as f:
            f.write(json.dumps(self.get_parameters()))
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
            self.lr = parameters["lr"]
            self.weight_decay = parameters["weight_decay"]
            self.normalise_input = parameters["normalise_input"]
            self.normalise_output = parameters["normalise_output"]
        with open(os.path.join(from_folder, "history.json")) as f:
            self.history = json.loads(f.read())

        self.linear = M.LinearMap(self.input_shape, self.output_shape)
        sd = torchio.load_state_dict(os.path.join(from_folder, "weights"))
        self.params = torchio.linear_from_state_dict(self.linear, sd)
        self.state = {}
        self._apply_cache = {}
        super().load(from_folder)

    def _forward_eval_p(self, params, state, x):
        y, _ = self.linear.apply(params, state, x, train=False)
        return y

    def _make_loss_fn(self):
        linear = self.linear

        def loss_fn(params, state, rng, batch, train):
            out, _ = linear.apply(params, state, batch["x"], train)
            per_sample = jnp.mean((out - batch["y"]) ** 2, axis=(1, 2, 3))
            w = batch["w"]
            loss = jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)
            return loss, ({}, {})

        return loss_fn

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

        if self.linear is None or self.params is None:
            self.linear = M.LinearMap(self.input_shape, self.output_shape)
            self.params, self.state = self.linear.init(
                jax.random.PRNGKey(int(time.time_ns()) % (2**31))
            )

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
        self.state = jax.device_get(state) if state else {}
        self._apply_cache = {}

        elapsed = time.time() - start
        self.history["nr_epochs"] = self.history["nr_epochs"] + self.nr_epochs
        print("elapsed:" + str(elapsed))

        if self.db:
            self.db.add_training_result(
                self.get_model_id(),
                "Linear",
                output_variable,
                input_variables,
                self.summary(),
                model_path,
                training_paths,
                train_loss,
                testing_paths,
                test_loss,
                self.get_parameters(),
                {},
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
        if self.input_shape:
            s = "Model Summary:\n"
            s += "\tInput shape:\n"
            s += f"\t\tsize={self.input_shape}\n"
            s += "\tOutput shape:\n"
            s += f"\t\tsize={self.output_shape}\n"
            return s
        return "Model has not been trained"
