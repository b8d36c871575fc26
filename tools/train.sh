#!/usr/bin/env bash
# Training launcher (reference tools/dist_train.sh; under JAX one process
# drives all local chips — multi-host uses jax.distributed via env)
CONFIG=${1:-configs/stmogen/t2m_motionx_0_125b.py}
python tools/train.py "$CONFIG" "${@:2}"
