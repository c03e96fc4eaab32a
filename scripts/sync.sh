#!/bin/bash
# rsync deploy of the package + config to a remote host (HPC workflow aid,
# capability parity with the reference's scripts/sync.sh).
#
# usage: scripts/sync.sh user@host:/remote/path

set -euo pipefail

if [ $# -ne 1 ]; then
    echo "usage: $0 user@host:/remote/path" >&2
    exit 1
fi

DEST="$1"
HERE="$(cd "$(dirname "$0")/.." && pwd)"

rsync -av --delete \
    --exclude '__pycache__' --exclude '*.pyc' --exclude '.pytest_cache' \
    --exclude '*.so' \
    "$HERE/cae_tools_tpu" "$HERE/csrc" "$HERE/pyproject.toml" "$HERE/README.md" \
    "$DEST"
