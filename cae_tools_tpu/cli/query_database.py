"""``query_database`` console entry point: dump the sqlite model tracker
(reference ``cli/query_database.py:19-28``)."""

from __future__ import annotations

import argparse

from ..utils.model_database import ModelDatabase


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("database_path")
    parser.add_argument(
        "--model-id",
        type=str,
        help="Dump details for this specific model",
        default=None,
    )
    args = parser.parse_args(argv)
    md = ModelDatabase(args.database_path)
    if args.model_id:
        md.dump_model(model_id=args.model_id)
    else:
        md.dump()


if __name__ == "__main__":
    main()
