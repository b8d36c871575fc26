#!/usr/bin/env bash
python tools/m2d_test.py configs/stmogen/m2d_finedance_0125b.py \
    --checkpoint "${1:-outputs/m2d_0125b/params.npz}" "${@:2}"
