#!/usr/bin/env bash
python tools/s2g_test.py configs/stmogen/s2g_beats2_0125b.py \
    --checkpoint "${1:-outputs/s2g_0125b/params.npz}" "${@:2}"
