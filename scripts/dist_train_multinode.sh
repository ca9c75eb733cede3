#!/usr/bin/env bash
# Multi-host training (reference scripts/dist_train_multinode_{1,2}.sh).
# Run once per host:
#   COORDINATOR_ADDRESS=host0:1234 NUM_PROCESSES=2 PROCESS_ID=<i> \
#     ./scripts/dist_train_multinode.sh CONFIG
set -e
CONFIG=$1
shift
python train_recognizer.py "$CONFIG" --launcher env --validate "$@"
