#!/usr/bin/env bash
# Single-host training over all local chips (reference scripts/dist_train_recognizer.sh).
# Usage: ./scripts/dist_train_recognizer.sh CONFIG [extra args...]
set -e
CONFIG=$1
shift
python train_recognizer.py "$CONFIG" --validate "$@"
