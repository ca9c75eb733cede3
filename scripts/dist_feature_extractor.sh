#!/usr/bin/env bash
# Feature extraction launch wrapper
# (reference scripts/dist_feature_extractor.sh:1).
# Usage: ./scripts/dist_feature_extractor.sh CONFIG CHECKPOINT [extra args...]
set -e
CONFIG=$1
CKPT=$2
shift 2
python feature_extractor.py "$CONFIG" "$CKPT" "$@"
