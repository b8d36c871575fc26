#!/usr/bin/env bash
# T2M evaluation on the flagship config (reference tools/single_test.sh)
python tools/test.py configs/stmogen/t2m_motionx_0_125b.py outputs/t2m_eval \
    --checkpoint "${1:-outputs/t2m_0_125b/params.npz}" "${@:2}"
