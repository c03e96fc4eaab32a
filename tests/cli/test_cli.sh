#!/bin/bash
# End-to-end shell-level CLI cycle (parity with reference test/cli/test_cli.sh):
# per method: train -> apply(train+test) -> evaluate -> retrain with
# --continue-training -> re-apply -> re-evaluate, exercising --database-path.
#
# Run from the repo root:  bash tests/cli/test_cli.sh [workdir]

set -euo pipefail

REPO="$(cd "$(dirname "$0")/../.." && pwd)"
WORK="${1:-$(mktemp -d)}"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

DATA="$WORK/data"
python -c "
from cae_tools_tpu.data.datagen import generate_spec_files
print(generate_spec_files('circle', '$DATA', n=12, seed=9))
"
FOLDER="$DATA/circle/16x16_256x256"
DB="$WORK/models.db"

for method in linear conv var; do
    echo "=== method: $method"
    MODEL="$WORK/model_$method"
    python -m cae_tools_tpu.cli.train_cae \
        --train-inputs "$FOLDER/train.nc" --test-inputs "$FOLDER/test.nc" \
        --model-folder "$MODEL" --method "$method" \
        --input-variables lowres --output-variable hires \
        --nr-epochs 3 --batch-size 6 --latent-size 4 --fc-size 16 \
        --database-path "$DB"

    python -m cae_tools_tpu.cli.apply_cae "$FOLDER/train.nc" \
        "$WORK/scored_train_$method.nc" --model-folder "$MODEL"
    python -m cae_tools_tpu.cli.apply_cae "$FOLDER/test.nc" \
        "$WORK/scored_test_$method.nc" --model-folder "$MODEL"

    python -m cae_tools_tpu.cli.evaluate_cae \
        --train-inputs "$WORK/scored_train_$method.nc" \
        --test-inputs "$WORK/scored_test_$method.nc" \
        --model-folder "$MODEL" --output-html-folder "$WORK/html_$method" \
        --prediction-variable model_output --database-path "$DB"
    test -f "$WORK/html_$method/index.html"

    python -m cae_tools_tpu.cli.train_cae \
        --train-inputs "$FOLDER/train.nc" --test-inputs "$FOLDER/test.nc" \
        --model-folder "$MODEL" --continue-training \
        --input-variables lowres --output-variable hires \
        --nr-epochs 3 --batch-size 6 --database-path "$DB"

    python -m cae_tools_tpu.cli.apply_cae "$FOLDER/test.nc" \
        "$WORK/scored_test_$method.nc" --model-folder "$MODEL"
done

python -m cae_tools_tpu.cli.query_database "$DB"
echo "CLI cycle OK: $WORK"
