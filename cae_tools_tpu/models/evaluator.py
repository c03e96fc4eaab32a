"""Model evaluation + HTML reporting.

Parity with reference ``ModelEvaluator`` (``models/model_evaluator.py:43-347``):
loads whichever model type the folder's ``parameters.json`` declares,
computes denormalised metrics over concatenated train/test netCDFs (optional
sqlite write), and renders an ``index.html`` containing: metric tables,
per-case mae/mse histograms, an optional netcdf2html case browser (soft
import), the training-parameter table and the log10 loss-history plot.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

from ..data.dataset import ArrayDataset
from ..utils.html import (
    Html5Builder,
    PIXELATED_IMG_STYLE,
    TableFragment,
    figure_fragment,
)
from ..utils.model_database import ModelDatabase
from ..xrcompat import xr


def _concat_paths(paths, case_variable=None, case_dimension=None):
    """Open ``paths`` and concatenate along the case dimension.

    The dim is ``case_dimension`` if given, else the leading dim of
    ``case_variable`` (the evaluator's output variable) — never guessed
    from "the first variable in the file", whose leading dim can be a
    coordinate axis (lat/lon) or nothing at all (0-d scalars)."""
    datasets = [xr.open_dataset(p) for p in paths]
    if not datasets:
        return None
    if len(datasets) == 1:
        return datasets[0]
    dim = case_dimension
    if dim is None and case_variable and case_variable in datasets[0]:
        dim = datasets[0][case_variable].dims[0]
    if dim is None:
        first = next(iter(datasets[0].variables.values()))
        dim = first.dims[0]
    return xr.concat(datasets, dim=dim)


class ModelEvaluator:
    def __init__(
        self,
        training_paths,
        testing_paths,
        output_html_folder="",
        model_output_variable="",
        model_path="",
        database_path="",
        input_variables=None,
        sample_count=None,
        x_coordinate="",
        y_coordinate="",
        time_coordinate="",
    ):
        self.training_paths = training_paths if training_paths else []
        self.testing_paths = testing_paths if testing_paths else []
        self.output_html_folder = output_html_folder
        self.model_path = model_path
        self.model_output_variable = model_output_variable or "model_output"
        self.database_path = database_path
        self.db = ModelDatabase(database_path) if database_path else None
        self.input_variables = input_variables if input_variables is not None else []
        self.sample_count = sample_count
        self.x_coordinate = x_coordinate
        self.y_coordinate = y_coordinate
        self.time_coordinate = time_coordinate

        self.output_html_path = (
            os.path.join(self.output_html_folder, "index.html")
            if self.output_html_folder
            else None
        )

        from . import load_model

        self.model = load_model(self.model_path)
        print(f"Evaluating model id={self.model.get_model_id()}")
        self.model_input_variables = self.model.get_input_variable_names()
        self.output_variable = self.model.get_output_variable_name()
        for input_variable in self.input_variables:
            if input_variable not in self.model_input_variables:
                raise Exception(f"requested {input_variable} is not a model input")

    # ------------------------------------------------------------------
    def compute_measure(self, dataset, idx, measure):
        # every channel, consistent with the case browser's |error| panels
        # (identical to the reference for the usual 1-channel outputs)
        predicted = np.asarray(dataset[self.model_output_variable][idx].values)
        actual = np.asarray(dataset[self.output_variable][idx].values)
        if measure == "mae":
            return float(np.mean(np.abs(predicted - actual)))
        if measure == "mse":
            return float(np.mean((predicted - actual) ** 2))
        raise ValueError("Unknown measure: " + measure)

    def run(self):
        case_dimension, train_ds, test_ds, metrics = self.evaluate_model_metrics()
        if self.output_html_path:
            self.build_html(case_dimension, train_ds, test_ds, metrics)

    # ------------------------------------------------------------------
    def evaluate_model_metrics(self):
        train_ds = _concat_paths(self.training_paths, self.output_variable)
        test_ds = _concat_paths(self.testing_paths, self.output_variable)

        some_ds = train_ds if train_ds is not None else test_ds
        case_dimension = some_ds[self.output_variable].dims[0]

        training_count = 0 if train_ds is None else train_ds[self.output_variable].shape[0]
        testing_count = 0 if test_ds is None else test_ds[self.output_variable].shape[0]
        print(
            "Evaluating training cases: %d, test cases: %d"
            % (training_count, testing_count)
        )

        metrics = {}
        for key, ds in (("test", test_ds), ("train", train_ds)):
            if ds is None:
                continue
            dsdata = ArrayDataset(
                ds,
                self.model.get_input_variable_names(),
                self.model.get_output_variable_name(),
                normalise_in=self.model.normalise_input,
                normalise_out=False,
            )
            dsdata.set_normalisation_parameters(self.model.normalisation_parameters)
            metrics[key] = self.model.evaluate(dsdata)
            self.model.dump_metrics(f"{key.capitalize()} Metrics", metrics[key])

        if self.db:
            self.db.add_evaluation_result(
                self.model.get_model_id(),
                ",".join(self.training_paths),
                ",".join(self.testing_paths),
                metrics,
            )
        return case_dimension, train_ds, test_ds, metrics

    # ------------------------------------------------------------------
    def build_html(self, case_dimension, train_ds, test_ds, model_metrics):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns

        # apply the model if scores are absent (model_evaluator.py:154-158)
        for partition, ds in [("train", train_ds), ("test", test_ds)]:
            if ds is not None and self.model_output_variable not in ds:
                print(f"Applying model to generate {partition} scores")
                self.model.apply(
                    ds,
                    input_variables=self.model.get_input_variable_names(),
                    prediction_variable=self.model_output_variable,
                )

        os.makedirs(self.output_html_folder, exist_ok=True)

        builder = Html5Builder(language="en")
        builder.head().add_element("title").add_text("Model Evaluation")
        builder.head().add_element("style").add_text(PIXELATED_IMG_STYLE)

        builder.body().add_element("h2", {"id": "heading"}).add_text("Model Metrics")
        for label, key in [("Test Metrics", "test"), ("Train Metrics", "train")]:
            if key in model_metrics:
                builder.body().add_element("h3").add_text(label)
                tbl = TableFragment()
                tbl.add_row(["Metric Name", "Metric Value"])
                for k, v in model_metrics[key].items():
                    tbl.add_row([k, f"{v:0.3f}"])
                builder.body().add_fragment(tbl)

        builder.body().add_element("h2", {"id": "heading"}).add_text(
            "Model Evaluation Results"
        )

        training_losses = None
        training_parameters = None
        if self.model_path:
            with open(os.path.join(self.model_path, "history.json")) as f:
                training_losses = json.loads(f.read())
            with open(os.path.join(self.model_path, "parameters.json")) as f:
                training_parameters = json.loads(f.read())

        converter_config = self._converter_config(train_ds, test_ds, case_dimension)

        for partition, ds in [("test", test_ds), ("train", train_ds)]:
            if ds is None:
                continue
            builder.body().add_element("h3").add_text(partition)
            n = ds[self.output_variable].shape[0]

            for measure in ["mae", "mse"]:
                values = [self.compute_measure(ds, idx, measure) for idx in range(n)]
                ds[measure] = xr.DataArray(
                    np.asarray(values, dtype=np.float64), dims=(case_dimension,)
                )
                fig, ax = plt.subplots()
                sns.histplot(values, ax=ax)
                ax.set_title(measure)
                builder.body().add_fragment(figure_fragment(fig))
                plt.close(fig)

            case_summary_built = False
            if converter_config:
                case_output_folder = os.path.join(self.output_html_folder, partition)
                try:
                    from netcdf2html.api.netcdf2html_converter import (
                        Netcdf2HtmlConverter,
                    )

                    converter = Netcdf2HtmlConverter(
                        converter_config,
                        ds,
                        case_output_folder,
                        title=partition,
                        sample_count=self.sample_count,
                    )
                    converter.run()
                    case_summary_built = True
                except Exception:
                    print("Unable to create case summary")
            if not case_summary_built and self.sample_count != 0:
                # built-in case browser: the reference depends on the
                # external netcdf2html package here (model_evaluator.py:
                # 298-307, soft import that silently skips when absent);
                # this renders an equivalent per-case page natively
                try:
                    self.build_case_browser(partition, ds)
                    case_summary_built = True
                except Exception as e:  # report pages must never kill eval
                    print(f"Unable to create case summary ({e})")
            if case_summary_built:
                builder.body().add_element("p").add_element(
                    "a", {"href": partition + "/index.html"}
                ).add_text(f"Case summary for partition {partition}")

            if not training_parameters and "training_parameters" in ds.attrs:
                training_parameters = json.loads(ds.attrs["training_parameters"])

        if training_parameters or training_losses:
            builder.body().add_element("h2").add_text("Training Summary")

        if training_parameters:
            builder.body().add_element("h2").add_text("Training Parameters")
            tbl = TableFragment()
            tbl.add_row(["Parameter Name", "Parameter Value"])
            if training_losses:
                tbl.add_row(["total epochs", str(training_losses["nr_epochs"])])
            for k, v in training_parameters.items():
                tbl.add_row([k, str(v)])
            builder.body().add_fragment(tbl)

        if training_losses and training_losses["train_loss"]:
            import pandas as pd

            all_losses = [(v, "train") for v in training_losses["train_loss"]] + [
                (v, "test") for v in training_losses["test_loss"]
            ]
            data_plot = pd.DataFrame(
                {
                    "log_loss": [math.log10(max(t[0], 1e-12)) for t in all_losses],
                    "type": [t[1] for t in all_losses],
                    "test_iteration": list(range(len(training_losses["train_loss"])))
                    + list(range(len(training_losses["test_loss"]))),
                }
            )
            fig, ax = plt.subplots()
            sns.lineplot(data_plot, x="test_iteration", y="log_loss", hue="type", ax=ax)
            ax.set_title("history")
            builder.body().add_fragment(figure_fragment(fig, w=768))
            plt.close(fig)

        with open(self.output_html_path, "w") as f:
            f.write(builder.get_html())

    #: hard cap on rendered cases so report size stays bounded even when
    #: --sample-count is not given
    CASE_BROWSER_MAX = 64

    def build_case_browser(self, partition, ds):
        """Write ``<html-folder>/<partition>/index.html``: per case, one row
        of pixelated panels — each model input, the target, the prediction
        and the |error| map — on shared per-variable color scales, with the
        per-case mae/mse in the heading.  Native stand-in for the external
        ``netcdf2html`` case browser the reference soft-imports."""
        from ..utils.html import array_png_data_uri

        folder = os.path.join(self.output_html_folder, partition)
        os.makedirs(folder, exist_ok=True)
        out_v, pred_v = self.output_variable, self.model_output_variable
        n = ds[out_v].shape[0]
        count = n if self.sample_count is None else min(n, self.sample_count)
        count = min(count, self.CASE_BROWSER_MAX)

        input_vars = self.input_variables or self.model_input_variables or []
        grid_inputs = [v for v in input_vars if ds[v].values.ndim == 4]
        scalar_inputs = [v for v in input_vars if ds[v].values.ndim != 4]

        def var_range(name):
            a = np.asarray(ds[name].values[:count], dtype=np.float64)
            return float(np.nanmin(a)), float(np.nanmax(a))

        ranges = {v: var_range(v) for v in grid_inputs}
        t_lo, t_hi = var_range(out_v)
        p_lo, p_hi = var_range(pred_v)
        ranges[out_v] = ranges[pred_v] = (min(t_lo, p_lo), max(t_hi, p_hi))
        err = np.abs(  # (count, C, Y, X) — every channel, not just 0
            np.asarray(ds[pred_v].values[:count], dtype=np.float64)
            - np.asarray(ds[out_v].values[:count], dtype=np.float64)
        )
        err_hi = float(np.nanmax(err)) if err.size else 1.0

        builder = Html5Builder(language="en")
        builder.head().add_element("title").add_text(
            f"Case summary - {partition}"
        )
        builder.head().add_element("style").add_text(
            PIXELATED_IMG_STYLE
            + "\nfigure { display: inline-block; margin: 4px; text-align: center; }"
            + "\nfigcaption { font-family: sans-serif; font-size: 12px; }"
        )
        builder.body().add_element("h2").add_text(
            f"Case summary for partition {partition}"
        )
        if count < n:
            builder.body().add_element("p").add_text(
                f"Showing the first {count} of {n} cases"
            )

        def panel(row, name, arr2d, lo, hi, cmap="coolwarm"):
            fig = row.add_element("figure")
            fig.add_element(
                "img",
                {
                    "src": array_png_data_uri(arr2d, vmin=lo, vmax=hi, cmap=cmap),
                    "alt": name,
                    "width": 192,
                },
            )
            fig.add_element("figcaption").add_text(name)

        def channel_panels(row, name, arr3d, lo, hi, cmap="coolwarm"):
            # one panel per channel (multi-channel variables were
            # previously silently collapsed to channel 0)
            n_chan = arr3d.shape[0]
            for c in range(n_chan):
                label = name if n_chan == 1 else f"{name} [ch {c}]"
                panel(row, label, arr3d[c], lo, hi, cmap)

        for idx in range(count):
            # build_html stores the per-case series on the dataset before
            # building the browser; reuse instead of re-reducing (C,Y,X)
            if "mae" in ds and "mse" in ds:
                mae = float(ds["mae"].values[idx])
                mse = float(ds["mse"].values[idx])
            else:
                mae = self.compute_measure(ds, idx, "mae")
                mse = self.compute_measure(ds, idx, "mse")
            builder.body().add_element("h3").add_text(
                f"case {idx} (mae={mae:0.4f}, mse={mse:0.4f})"
            )
            if scalar_inputs:
                parts = []
                for v in scalar_inputs:
                    val = np.asarray(ds[v].values[idx]).ravel()
                    parts.append(f"{v}={float(val[0]):0.4g}")
                builder.body().add_element("p").add_text(", ".join(parts))
            row = builder.body().add_element("div")
            for v in grid_inputs:
                lo, hi = ranges[v]
                channel_panels(row, v, np.asarray(ds[v].values[idx]), lo, hi)
            lo, hi = ranges[out_v]
            channel_panels(row, out_v, np.asarray(ds[out_v].values[idx]), lo, hi)
            channel_panels(row, pred_v, np.asarray(ds[pred_v].values[idx]), lo, hi)
            channel_panels(row, "|error|", err[idx], 0.0, err_hi, cmap="magma")

        with open(os.path.join(folder, "index.html"), "w") as f:
            f.write(builder.get_html())

    def _converter_config(self, train_ds, test_ds, case_dimension):
        """Optional netcdf2html map-tile config (model_evaluator.py:221-254)."""
        if not (self.x_coordinate and self.y_coordinate and self.time_coordinate):
            return None
        target_vmin = target_vmax = None
        input_vmins, input_vmaxes = {}, {}
        for ds in [train_ds, test_ds]:
            if ds is None:
                continue
            for v in [self.output_variable, self.model_output_variable]:
                if v not in ds:
                    continue
                tmin = float(ds[v].min(skipna=True))
                tmax = float(ds[v].max(skipna=True))
                target_vmin = tmin if target_vmin is None else min(target_vmin, tmin)
                target_vmax = tmax if target_vmax is None else max(target_vmax, tmax)
            for v in self.input_variables:
                tmin = float(ds[v].min(skipna=True))
                tmax = float(ds[v].max(skipna=True))
                input_vmins[v] = min(input_vmins.get(v, tmin), tmin)
                input_vmaxes[v] = max(input_vmaxes.get(v, tmax), tmax)

        config = {
            "dimensions": {"case": case_dimension},
            "coordinates": {
                "x": self.x_coordinate,
                "y": self.y_coordinate,
                "time": self.time_coordinate,
            },
            "image": {"grid-width": 250, "max-zoom": 10},
            "layers": {},
        }
        for v in self.input_variables + [
            self.output_variable,
            self.model_output_variable,
        ]:
            if v in self.input_variables:
                vmin, vmax = input_vmins[v], input_vmaxes[v]
            else:
                vmin, vmax = target_vmin, target_vmax
            config["layers"][v] = {
                "label": v,
                "type": "single",
                "min_value": vmin,
                "max_value": vmax,
                "cmap": "coolwarm",
            }
        return config
