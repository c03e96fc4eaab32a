"""``evaluate_cae`` console entry point (reference ``cli/evaluate_cae.py:22-56``)."""

from __future__ import annotations

import argparse

from ..models.evaluator import ModelEvaluator


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train-inputs", nargs="+", help="path to netcdf4 file(s) containing training data")
    parser.add_argument("--test-inputs", nargs="+", help="path to netcdf4 file(s) containing test data")
    parser.add_argument("--output-html-folder", help="folder to write output html to", default="")
    parser.add_argument("--input-variables", nargs="*", help="input variables to plot")
    parser.add_argument("--sample-count", type=int, help="fraction of cases to plot for each partition", default=None)
    parser.add_argument("--model-folder", help="folder to save the trained model to", required=True)
    parser.add_argument("--prediction-variable", help="name of the prediction variable to create in output data", default=None)
    parser.add_argument("--x-coordinate", help="name of the x-coordinate", default=None)
    parser.add_argument("--y-coordinate", help="name of the y-coordinate", default=None)
    parser.add_argument("--time-coordinate", help="name of the time-coordinate", default=None)
    parser.add_argument("--database-path", type=str, help="path to a database to store evaluation results", default=None)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    from .common import enable_cli_compile_cache

    enable_cli_compile_cache()  # evaluation may apply the model (compiles)
    mt = ModelEvaluator(
        training_paths=args.train_inputs,
        testing_paths=args.test_inputs,
        output_html_folder=args.output_html_folder,
        model_path=args.model_folder,
        model_output_variable=args.prediction_variable,
        input_variables=args.input_variables,
        sample_count=args.sample_count,
        database_path=args.database_path,
        x_coordinate=args.x_coordinate,
        y_coordinate=args.y_coordinate,
        time_coordinate=args.time_coordinate,
    )
    mt.run()


if __name__ == "__main__":
    main()
