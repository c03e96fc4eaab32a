"""CLI driver for hyperparameter studies.

Command-line equivalent of the reference's root-level ``hypar_optim.py``
script (Optuna TPE over train_cae with a 13-knob space).  Example::

    python -m cae_tools_tpu.hpo \
        --train-inputs train.nc --test-inputs test.nc \
        --input-variables lowres --output-variable hires \
        --work-folder trials --n-trials 50 --method unet --nr-epochs 100
"""

from __future__ import annotations

import argparse
import json

from .optim import HyperOptimizer, default_search_space


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--train-inputs", nargs="+", required=True)
    parser.add_argument("--test-inputs", nargs="+", required=True)
    parser.add_argument("--input-variables", nargs="+", required=True)
    parser.add_argument("--output-variable", required=True)
    parser.add_argument("--work-folder", required=True)
    parser.add_argument("--n-trials", type=int, default=50)
    parser.add_argument("--nr-epochs", type=int, default=100)
    parser.add_argument("--method", default="unet")
    parser.add_argument(
        "--mode", choices=["inproc", "subprocess", "vmap"], default="inproc",
        help="inproc: one JAX process, compile caches shared across trials; "
        "subprocess: reference behavior (CLI + stdout scrape); vmap: train "
        "ALL trials simultaneously, vmapped over a trials axis sharded "
        "across the --devices mesh (lr/wd axes only; structural knobs are "
        "pinned to one configuration)",
    )
    parser.add_argument(
        "--sample-files", type=int, default=None,
        help="per-trial randomized data subsample: train each trial on N "
        "files drawn from --train-inputs/--test-inputs (reference "
        "hypar_optim.py:40-41 draws 100 via `ls | shuf`)",
    )
    parser.add_argument(
        "--devices", type=str, default=None,
        help="mesh layout for --mode vmap, e.g. '8' or '8x1' "
        "(data x model axes)",
    )
    parser.add_argument(
        "--host-memory-budget", type=str, default=None,
        help="host-RAM budget per trial (e.g. 8G): trials whose sampled "
        "files exceed it stream batches from disk instead of "
        "materializing (train_cae --host-memory-budget)",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log-path", default=None)
    parser.add_argument(
        "--storage", default=None,
        help="sqlite URL or path persisting the study (resumable; "
        "reference hypar_optim.py:107-113)",
    )
    parser.add_argument(
        "--seed-trial", action="append", default=[],
        help="JSON object (inline or @file.json) of params to enqueue "
        "before sampled trials (reference hypar_optim.py:116-131); "
        "repeatable",
    )
    args = parser.parse_args(argv)

    seed_trials = []
    for item in args.seed_trial:
        if item.startswith("@"):
            with open(item[1:]) as f:
                seed_trials.append(json.load(f))
        else:
            seed_trials.append(json.loads(item))

    if args.method == "resunet_gan":
        from .optim import gan_search_space

        space = gan_search_space()  # adds lambda_adv/lambda_gp/n_critic
    else:
        space = default_search_space()
        space["method"] = ("fixed", args.method)
    space["nr_epochs"] = ("fixed", args.nr_epochs)

    mesh = None
    if args.devices:
        from ..cli.common import mesh_from_flag

        mesh = mesh_from_flag(args.devices)

    opt = HyperOptimizer(
        train_inputs=args.train_inputs,
        test_inputs=args.test_inputs,
        input_variables=args.input_variables,
        output_variable=args.output_variable,
        work_folder=args.work_folder,
        search_space=space,
        mode=args.mode,
        seed=args.seed,
        log_path=args.log_path or f"{args.work_folder}/study.jsonl",
        seed_trials=seed_trials,
        sample_files=args.sample_files,
        host_memory_budget=args.host_memory_budget,
        mesh=mesh,
    )
    best_params, best_value, results = opt.run(
        n_trials=args.n_trials, storage=args.storage
    )
    print(json.dumps({"best_value": best_value, "best_params": best_params}))


if __name__ == "__main__":
    main()
