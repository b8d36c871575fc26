#!/usr/bin/env bash
python tools/visualize.py configs/stmogen/t2m_motionx_0_125b.py \
    --checkpoint "${1:-outputs/t2m_0_125b/params.npz}" \
    --text "a person walks forward and waves" "${@:2}"
