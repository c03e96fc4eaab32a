"""``train_cae`` console entry point.

Flag surface matches the reference (``cli/train_cae.py:19-53``) so existing
invocations keep working; behavioral fixes over the reference snapshot
(SURVEY.md §4 quirks table):

 * ``--method var``/``vae`` construct :class:`VarAEModel` (the reference
   defaults to ``var`` yet never constructs it -> NameError)
 * ``--mask-variable`` is accepted by every model's ``train``
 * ``unet_res``/``srcnn_res``/``resunet_gan`` are real model variants here
   (accepted-but-unhandled upstream; ``resunet_gan`` trains the residual
   UNet adversarially with a WGAN-GP conditional critic)
"""

from __future__ import annotations

import argparse
import json
import os
import time

from ..models import (MODEL_TYPES, ConvAEModel, LinearModel, ResUNetGAN,
                      SRCNNRes, UNET, UNETRes, VarAEModel)
from ..models.sizer import ModelSpec
from .common import (add_devices_flag, broadcast_scalar_vars, mesh_from_flag,
                     open_inputs)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train-inputs", nargs="+", help="path(s) to netcdf4 file containing training data", required=True)
    parser.add_argument("--test-inputs", nargs="+", help="path(s) to netcdf4 file containing test data", required=True)
    parser.add_argument("--model-folder", help="folder to save the trained model to", required=True)
    parser.add_argument("--continue-training", action="store_true", help="continue training model")
    parser.add_argument("--input-variables", nargs="+", help="name of the input variable(s) in training/test data", required=True)
    parser.add_argument("--output-variable", help="name of the output variable in training/test data", required=True)
    parser.add_argument("--nr-epochs", type=int, help="number of training epochs", default=500)
    parser.add_argument("--latent-size", type=int, help="size of the latent space", default=4)
    parser.add_argument("--fc-size", type=int, help="size of the fully-connected layers", default=16)
    parser.add_argument("--batch-size", type=int, help="number of images to process in one batch", default=10)
    parser.add_argument("--learning-rate", type=float, help="the learning rate", default=0.001)
    parser.add_argument("--lr-step-size", type=int, help="the schedular steps for the learning rate", default=500)
    parser.add_argument("--lr-gamma", type=float, help="decay factor of the scheduled learning rate", default=0.5)
    parser.add_argument("--lambda-mse", type=float, help="controls the strength of the mse loss in vae", default=1)
    parser.add_argument("--lambda-kl", type=float, help="controls the strength of the kl loss in vae", default=1)
    parser.add_argument("--lambda-l1", type=float, help="controls the strength of l1 regularization", default=0.001)
    parser.add_argument("--lambda-pearson", type=float, help="controls the strength of the pearson loss", default=1)
    parser.add_argument("--lambda-ssim", type=float, help="controls the strength of the ssim loss", default=1)
    parser.add_argument("--lambda-additional", type=float, help="controls the strength of additional regularization", default=1)
    parser.add_argument("--lambda-adv", type=float, help="strength of the adversarial loss term (resunet_gan)", default=1e-3)
    parser.add_argument("--lambda-gp", type=float, help="strength of the WGAN-GP gradient penalty (resunet_gan)", default=10.0)
    parser.add_argument("--n-critic", type=int, help="critic updates per generator update (resunet_gan)", default=1)
    parser.add_argument("--weight-decay", type=float, help="weight decay coefficient", default=1e-5)
    parser.add_argument("--dropout-rate", type=float, help="dropout rate", default=1e-1)
    parser.add_argument("--additional-loss", type=str, help="additional loss types ('contrastive', 'histogram', 'perceptual')", default=None)
    parser.add_argument("--perceptual-weights", type=str, default=None,
                        help="path to an .npz HWIO filter bank for the perceptual/contrastive feature extractor (default: torchvision VGG19 if importable, else a fixed random pyramid)")
    parser.add_argument("--scheduler-type", type=str, help="scheduler type ('StepLR', 'ReduceLROnPlateau', 'ExponentialLR','CosineAnnealingLR')", default=None)
    parser.add_argument("--checkpoint-interval", type=int, default=0,
                        help="save an orbax snapshot (params + BN state + optimizer moments) under <model-folder>/orbax every N epochs; 0 disables. --continue-training resumes from the latest snapshot when one exists (exact resume incl. optimizer moments)")
    parser.add_argument("--method", choices=["conv", "unet", "unet_res", "srcnn_res", "resunet_gan", "var", "vae", "linear"], default="var", help="methods")
    parser.add_argument("--layer-definitions-path", help="specify path of a JSON file with layer definitions", default=None)
    parser.add_argument("--stride", type=int, help="stride to use in convolutional layers", default=2)
    parser.add_argument("--kernel-size", type=int, help="kernel size to use in convolutional layers", default=3)
    parser.add_argument("--input-layer-count", type=int, help="number of input convolutional layers", default=None)
    parser.add_argument("--output-layer-count", type=int, help="number of output convolutional layers", default=None)
    parser.add_argument("--model-id", type=str, help="specify the model id when creating a model", default=None)
    parser.add_argument("--database-path", type=str, help="path to a database to store evaluation results", default=None)
    parser.add_argument("--chunk-size", type=int, help="chunk size for xarray (accepted for reference flag parity; inert — data is materialised host-side)", default=1000)
    parser.add_argument("--include-coasts", help="include coastal areas (accepted for reference flag parity; inert upstream too)", default=False)
    parser.add_argument("--mask-variable", type=str, help="name of the mask variable", default=None)
    parser.add_argument("--augment", nargs="+", choices=["flip", "hflip", "vflip", "rotate", "crop"], default=None,
                        help="paired train-batch augmentation (the reference defines these transforms but never applies them; here they run inside the compiled train step)")
    parser.add_argument("--rotate-degrees", type=float, default=30.0, help="max rotation angle for --augment rotate")
    parser.add_argument("--crop-scale-min", type=float, default=0.6, help="minimum crop fraction for --augment crop")
    parser.add_argument("--precision", choices=["highest", "high", "default"], default="high",
                        help="conv/matmul precision: high (default) keeps <=1e-5 reference parity at 1.66x the speed of highest; default=1-pass bf16 fast path")
    parser.add_argument("--host-memory-budget", type=str,
                        default=os.environ.get("CAE_HOST_MEMORY_BUDGET"),
                        help="host-RAM budget for training data (e.g. 8G). "
                        "When the input netCDF3 files exceed it, batches are "
                        "streamed from disk per epoch instead of "
                        "materialized — removes the host-RAM cap on dataset "
                        "size (additive; the reference materializes "
                        "everything, ds_dataset.py:22-75)")
    add_devices_flag(parser)
    return parser


def build_model(args):
    """Construct a fresh model from CLI flags (method dispatch)."""
    common = dict(
        nr_epochs=args.nr_epochs,
        batch_size=args.batch_size,
        lr=args.learning_rate,
    )
    if args.method == "conv":
        return ConvAEModel(
            fc_size=args.fc_size,
            encoded_dim_size=args.latent_size,
            conv_kernel_size=args.kernel_size,
            conv_stride=args.stride,
            conv_input_layer_count=args.input_layer_count,
            conv_output_layer_count=args.output_layer_count,
            database_path=args.database_path,
            weight_decay=args.weight_decay,
            **common,
        )
    if args.method in ("var", "vae"):
        return VarAEModel(
            fc_size=args.fc_size,
            encoded_dim_size=args.latent_size,
            conv_kernel_size=args.kernel_size,
            conv_stride=args.stride,
            conv_input_layer_count=args.input_layer_count,
            conv_output_layer_count=args.output_layer_count,
            database_path=args.database_path,
            weight_decay=args.weight_decay,
            lambda_mse=args.lambda_mse,
            lambda_kl=args.lambda_kl,
            lambda_ssim=args.lambda_ssim,
            **common,
        )
    if args.method == "unet":
        return UNET(
            fc_size=args.fc_size,
            encoded_dim_size=args.latent_size,
            lambda_l1=args.lambda_l1,
            lambda_pearson=args.lambda_pearson,
            database_path=args.database_path,
            weight_decay=args.weight_decay,
            dropout_rate=args.dropout_rate,
            conv_kernel_size=args.kernel_size,
            conv_stride=args.stride,
            conv_input_layer_count=args.input_layer_count,
            conv_output_layer_count=args.output_layer_count,
            **common,
        )
    if args.method == "unet_res":
        return UNETRes(
            fc_size=args.fc_size,
            encoded_dim_size=args.latent_size,
            lambda_l1=args.lambda_l1,
            lambda_pearson=args.lambda_pearson,
            database_path=args.database_path,
            weight_decay=args.weight_decay,
            dropout_rate=args.dropout_rate,
            conv_kernel_size=args.kernel_size,
            conv_stride=args.stride,
            conv_input_layer_count=args.input_layer_count,
            conv_output_layer_count=args.output_layer_count,
            **common,
        )
    if args.method == "srcnn_res":
        return SRCNNRes(
            database_path=args.database_path,
            weight_decay=args.weight_decay,
            **common,
        )
    if args.method == "resunet_gan":
        return ResUNetGAN(
            fc_size=args.fc_size,
            encoded_dim_size=args.latent_size,
            lambda_l1=args.lambda_l1,
            lambda_pearson=args.lambda_pearson,
            lambda_adv=args.lambda_adv,
            lambda_gp=args.lambda_gp,
            n_critic=args.n_critic,
            database_path=args.database_path,
            weight_decay=args.weight_decay,
            dropout_rate=args.dropout_rate,
            conv_kernel_size=args.kernel_size,
            conv_stride=args.stride,
            conv_input_layer_count=args.input_layer_count,
            conv_output_layer_count=args.output_layer_count,
            **common,
        )
    if args.method == "linear":
        return LinearModel(database_path=args.database_path, weight_decay=args.weight_decay, **common)
    raise SystemExit(f"method {args.method!r} is not implemented")


def exceeds_memory_budget(budget_text, paths) -> bool:
    """True when the input files' total size exceeds the host-RAM budget."""
    if not budget_text:
        return False
    from ..data.diskstream import parse_size

    budget = parse_size(budget_text)
    total = sum(os.path.getsize(p) for p in paths)
    return budget > 0 and total > budget


def open_training_datasets(args, quiet=False):
    """(train_ds, test_ds) honoring ``--host-memory-budget``.

    Within budget (or no budget): in-RAM datasets via ``open_inputs`` with
    the reference's 1-D auxiliary-variable broadcast.  Over budget:
    :class:`~..data.diskstream.DiskStreamDataset` handles (the aux
    broadcast happens at batch-assembly time), and batches stream from
    disk per epoch — the out-of-core path shared by ``main()`` and the
    in-process HPO driver (``hpo/optim.py``)."""
    paths = list(args.train_inputs) + list(args.test_inputs)
    if exceeds_memory_budget(args.host_memory_budget, paths):
        from ..data.diskstream import DiskStreamDataset

        if args.method == "resunet_gan":
            raise SystemExit(
                "--method resunet_gan has no streaming trainer; raise "
                "--host-memory-budget or pick another method"
            )
        train_ds = DiskStreamDataset(args.train_inputs)
        test_ds = DiskStreamDataset(args.test_inputs)
        # the case-count print below reads n_rows(output_variable) before
        # configure() gets a chance to validate variable names — check
        # here so a mistyped --output-variable dies with the same
        # actionable message the non-streaming path produces
        for ds in (train_ds, test_ds):
            for f, p in zip(ds.files, ds.paths):
                if args.output_variable not in f.variables:
                    raise SystemExit(
                        f"variable {args.output_variable!r} not found "
                        f"in {p}"
                    )
        if not quiet:
            total = sum(os.path.getsize(p) for p in paths)
            print(
                "Host-memory budget %s < %.1f MB of input files: "
                "streaming batches from disk"
                % (args.host_memory_budget, total / 2**20)
            )
            print(
                "Training cases: %d, Test cases: %d"
                % (
                    sum(
                        f.n_rows(args.output_variable)
                        for f in train_ds.files
                    ),
                    sum(
                        f.n_rows(args.output_variable)
                        for f in test_ds.files
                    ),
                )
            )
        return train_ds, test_ds

    train_ds = open_inputs(args.train_inputs)
    test_ds = open_inputs(args.test_inputs)
    case_dimension = train_ds[args.output_variable].dims[0]
    if not quiet:
        print(
            "Training cases: %d, Test cases: %d"
            % (
                train_ds[args.output_variable].shape[0],
                test_ds[args.output_variable].shape[0],
            )
        )
    broadcast_scalar_vars(train_ds, args.input_variables, case_dimension)
    broadcast_scalar_vars(test_ds, args.input_variables, case_dimension)
    return train_ds, test_ds


def main(argv=None):
    args = build_parser().parse_args(argv)

    from ..ops import convops
    from .common import enable_cli_compile_cache

    enable_cli_compile_cache()
    convops.set_precision(args.precision)

    train_ds, test_ds = open_training_datasets(args)

    training_paths = ";".join(args.train_inputs)
    test_paths = ";".join(args.test_inputs)

    if args.continue_training:
        with open(os.path.join(args.model_folder, "parameters.json")) as f:
            parameters = json.loads(f.read())
        cls = MODEL_TYPES.get(parameters["type"])
        if cls is None:
            raise SystemExit(f"unknown model type {parameters['type']!r}")
        mt = cls()
        mt.load(args.model_folder)
        mt.nr_epochs = args.nr_epochs
        mt.lr = args.learning_rate
        mt.batch_size = args.batch_size
        # exact resume when an orbax snapshot exists (restores optimizer
        # moments; the reference restarts them, cli/train_cae.py:111-125)
        mt.resume_from_checkpoint = True
        if args.database_path:
            # fix-forward: the reference loses the tracker on retrain
            # (cli/train_cae.py:116-125 constructs without database_path)
            from ..utils.model_database import ModelDatabase

            mt.db = ModelDatabase(args.database_path)
    else:
        mt = build_model(args)
        if args.model_id:
            mt.set_model_id(args.model_id)
        if args.layer_definitions_path:
            with open(args.layer_definitions_path) as f:
                spec = ModelSpec()
                spec.load(json.loads(f.read()))
                mt.spec = spec

    mesh = mesh_from_flag(args.devices)
    if mesh is not None:
        mt.set_mesh(mesh)  # DP training over the mesh's "data" axis

    if args.checkpoint_interval:
        mt.checkpoint_interval = args.checkpoint_interval

    if args.additional_loss:
        # fail fast instead of the reference's silent no-op: only the
        # UNET-family training loss consumes the additional term
        if args.additional_loss not in ("perceptual", "contrastive", "histogram"):
            raise SystemExit(
                f"unknown --additional-loss {args.additional_loss!r}; "
                "expected 'perceptual', 'contrastive' or 'histogram'"
            )
        if not isinstance(mt, UNET):
            raise SystemExit(
                "--additional-loss is only wired into the unet/unet_res "
                f"training loss, not method {args.method!r}"
            )
        mt.additional_loss = args.additional_loss
        mt.lambda_additional = args.lambda_additional
        if args.perceptual_weights:
            mt.perceptual_weights = args.perceptual_weights

    if args.scheduler_type:
        # fix-forward: the reference accepts --scheduler-type but never
        # wires it (cli/train_cae.py:41); here it selects the LR schedule
        # check the constructed/loaded model type, not args.method: the
        # --continue-training path derives the class from parameters.json
        # and leaves args.method at its default
        if isinstance(mt, ResUNetGAN) and args.scheduler_type == "ReduceLROnPlateau":
            raise SystemExit(
                "--scheduler-type ReduceLROnPlateau is not supported with "
                "--method resunet_gan (critic/generator losses do not "
                "plateau jointly); pick StepLR, ExponentialLR or "
                "CosineAnnealingLR"
            )
        mt.scheduler_type = args.scheduler_type
        mt.lr_step_size = args.lr_step_size
        mt.lr_gamma = args.lr_gamma

    if args.augment:
        mt.augment = args.augment
        mt.rotate_degrees = args.rotate_degrees
        mt.crop_scale = (args.crop_scale_min, 1.0)

    start_time = time.time()
    print("Ready for training process")
    mt.train(
        args.input_variables,
        args.output_variable,
        training_ds=train_ds,
        testing_ds=test_ds,
        model_path=args.model_folder,
        training_paths=training_paths,
        testing_paths=test_paths,
        mask_variable_name=args.mask_variable,
    )
    end_time = time.time()
    print(f"Time taken to train: {end_time - start_time:.2f} seconds")


if __name__ == "__main__":
    main()
