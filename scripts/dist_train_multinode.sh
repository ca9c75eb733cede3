#!/usr/bin/env bash
# Multi-host training (reference scripts/dist_train_multinode_{1,2}.sh).
# Run once per host. The reference ships an explicit two-node pair
# (dist_train_multinode_1.sh on the master, _2.sh on the worker, both
# torch.distributed.launch with node_rank 0/1); here the same 2-node
# launch is one script parameterized by PROCESS_ID:
#   node 0:  COORDINATOR_ADDRESS=host0:1234 NUM_PROCESSES=2 PROCESS_ID=0 \
#              ./scripts/dist_train_multinode.sh CONFIG
#   node 1:  COORDINATOR_ADDRESS=host0:1234 NUM_PROCESSES=2 PROCESS_ID=1 \
#              ./scripts/dist_train_multinode.sh CONFIG
# (each process drives all local TPU chips; on Cloud TPU pods the three
# variables come from the TPU metadata and can be omitted — SLURM's
# SLURM_PROCID etc. are also auto-detected.)
set -e
CONFIG=$1
shift
python train_recognizer.py "$CONFIG" --launcher env --validate "$@"
