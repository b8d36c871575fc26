#!/usr/bin/env bash
# Multi-host training launcher (reference tools/dist_train.sh).  Under JAX
# one process drives all local chips, so "distributed" means one process per
# HOST via jax.distributed: run this script on every host.  On TPU pods the
# coordinator is auto-detected; elsewhere set COORDINATOR (host:port),
# NUM_PROCESSES and PROCESS_ID.  Single-host multi-chip needs no launcher at
# all: plain tools/train.py drives every local chip.
CONFIG=${1:?usage: dist_train.sh CONFIG WORK_DIR [extra args]}
WORK_DIR=${2:?usage: dist_train.sh CONFIG WORK_DIR [extra args]}

python tools/train.py "$CONFIG" --work-dir "$WORK_DIR" --multihost \
    ${COORDINATOR:+--coordinator "$COORDINATOR"} \
    ${NUM_PROCESSES:+--num-processes "$NUM_PROCESSES"} \
    ${PROCESS_ID:+--process-id "$PROCESS_ID"} \
    "${@:3}"
