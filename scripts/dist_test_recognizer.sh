#!/usr/bin/env bash
# Dense testing (reference scripts/dist_test_recognizer.sh).
# Usage: ./scripts/dist_test_recognizer.sh CONFIG CHECKPOINT [extra args...]
set -e
CONFIG=$1
CKPT=$2
shift 2
python test_recognizer.py "$CONFIG" "$CKPT" --fcn_testing --average-clips prob "$@"
