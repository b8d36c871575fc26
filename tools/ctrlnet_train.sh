#!/usr/bin/env bash
# ControlNet training launcher (reference tools/ctrlnet_train.sh)
CONFIG=${1:-configs/stmogen/s2g_beats2_0125b.py}
BASE=${2:-outputs/t2m_0_125b/params.npz}
python tools/train.py "$CONFIG" --base-checkpoint "$BASE" "${@:3}"
