"""``export_cae`` console entry point: trained model folder -> standalone
serving bundle (serialized jax.export graph + weights + manifest).

No reference counterpart (the reference deploys by re-running the training
package per dataset); see cae_tools_tpu/serve/.
"""

from __future__ import annotations

import argparse


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("output_folder", help="folder to write the serving bundle to")
    parser.add_argument("--model-folder", help="trained model folder to export", required=True)
    parser.add_argument("--batch-size", type=int, default=None,
                        help="per-dispatch batch of the exported graph (default: the model's training batch size; the bundle loader pads/chunks arbitrary case counts onto it)")
    parser.add_argument("--platforms", nargs="+", default=None,
                        help="target platform(s) for the exported graph, e.g. 'tpu' or 'cpu' (default: the current JAX backend)")
    parser.add_argument("--precision", choices=["highest", "high", "default"], default="high",
                        help="conv/matmul precision baked into the exported graph")
    parser.add_argument("--devices", type=int, default=None,
                        help="export a data-parallel graph: each dispatch batch is sharded over this many devices (batch size must divide evenly; the serving host must present at least this many devices)")
    parser.add_argument("--apply-dtype", choices=["float32", "bfloat16"], default="float32",
                        help="compute dtype baked into the exported forward (normalisation and outputs stay float32), mirroring apply_cae --apply-dtype")
    parser.add_argument("--output-dtype", choices=["float32", "bfloat16"], default="float32",
                        help="prediction output dtype baked into the exported graph; bfloat16 breaks the fused apply's f32 output-write floor for consumers that accept ~2e-3 relative error (outside the <=1e-5 parity contract)")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    from ..models import load_model
    from ..ops import convops
    from ..serve import export_model
    from .common import enable_cli_compile_cache

    enable_cli_compile_cache()
    convops.set_precision(args.precision)

    mt = load_model(args.model_folder)
    if args.apply_dtype != "float32":
        mt.set_apply_dtype(args.apply_dtype)
    if args.output_dtype != "float32":
        mt.set_output_dtype(args.output_dtype)
    manifest = export_model(
        mt,
        args.output_folder,
        batch_size=args.batch_size,
        platforms=args.platforms,
        devices=args.devices,
    )
    print(
        "Exported %s (batch %d, platforms %s, devices %d) to %s"
        % (
            manifest["model_type"],
            manifest["batch_size"],
            ",".join(manifest["platforms"]),
            manifest["devices"],
            args.output_folder,
        )
    )


if __name__ == "__main__":
    main()
