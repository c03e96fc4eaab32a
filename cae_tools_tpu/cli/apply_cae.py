"""``apply_cae`` console entry point: batch inference dataset -> dataset +
prediction variable -> netCDF (reference ``cli/apply_cae.py:28-92``)."""

from __future__ import annotations

import argparse

from ..models import load_model
from .common import (add_devices_flag, broadcast_scalar_vars, mesh_from_flag,
                     open_inputs)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("data_paths", nargs="+", help="path to netcdf4 file(s) containing data to which model is applied")
    parser.add_argument("output_path", help="path to write the netcdf4 file containing input data plus model outputs")
    parser.add_argument("--model-folder", help="folder to save the trained model to", required=True)
    parser.add_argument("--input-variables", nargs="+", help="name of the input variable(s) in training/test data", required=False)
    parser.add_argument("--prediction-variable", help="name of the prediction variable to create in output data", default="model_output")
    parser.add_argument("--mask-variable", type=str, help="name of the mask variable", default=None)
    parser.add_argument("--precision", choices=["highest", "high", "default"], default="high",
                        help="conv/matmul precision: high (default) keeps <=1e-5 reference parity at 1.66x the speed of highest; default=1-pass bf16 fast path")
    parser.add_argument("--apply-dtype", choices=["float32", "bfloat16"], default="float32",
                        help="parameter storage dtype for inference; bfloat16 halves weight HBM traffic (pair with --precision default; output error stays at the 1-pass-bf16 level)")
    parser.add_argument("--output-dtype", choices=["float32", "bfloat16"], default="float32",
                        help="prediction output dtype on device; bfloat16 breaks the fused apply's f32 output-write floor and halves the device->host transfer (~2e-3 relative error — outside the <=1e-5 parity contract; the netCDF variable is widened back to float32)")
    parser.add_argument("--apply-chunk-size", type=int, default=None,
                        help="per-dispatch batch of the device apply loop (default: auto — large on TPU for occupancy, the model's batch size elsewhere)")
    add_devices_flag(parser)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    from ..ops import convops
    from .common import enable_cli_compile_cache

    enable_cli_compile_cache()
    convops.set_precision(args.precision)

    mt = load_model(args.model_folder)
    mesh = mesh_from_flag(args.devices)
    if mesh is not None:
        mt.set_mesh(mesh)  # sharded DP apply over the mesh's "data" axis
    if args.apply_dtype != "float32":
        mt.set_apply_dtype(args.apply_dtype)
    if args.output_dtype != "float32":
        mt.set_output_dtype(args.output_dtype)
    if args.apply_chunk_size is not None:
        mt.apply_chunk_size = args.apply_chunk_size

    # input-variable consistency vs the saved input spec (apply_cae.py:55-68)
    input_variable_names = args.input_variables
    model_input_variable_names = mt.get_input_variable_names()
    if not input_variable_names:
        if model_input_variable_names is None:
            raise SystemExit(
                "Please specify the input variable names using --input-variables"
            )
        input_variable_names = model_input_variable_names
    elif model_input_variable_names is not None and (
        input_variable_names != model_input_variable_names
    ):
        raise SystemExit(
            f"input_variables [{','.join(input_variable_names)}] inconsistent with "
            f"those used to train the model [{','.join(model_input_variable_names)}]"
        )

    score_ds = open_inputs(args.data_paths)
    case_dimension = score_ds[input_variable_names[0]].dims[0]
    broadcast_scalar_vars(score_ds, input_variable_names, case_dimension)

    print("Applying model for %d cases" % score_ds[input_variable_names[0]].shape[0])
    mt.apply(
        score_ds,
        input_variable_names,
        args.prediction_variable,
        mask_variable_name=args.mask_variable,
    )
    score_ds.to_netcdf(args.output_path)


if __name__ == "__main__":
    main()
