#!/usr/bin/env bash
# M2D visualization launcher (reference tools/m2d_visualize.sh)
python tools/m2d_visualize.py configs/stmogen/m2d_finedance_0125b.py \
    --checkpoint "${1:-outputs/m2d_0125b/params.npz}" \
    --track "${2:?usage: m2d_visualize.sh CHECKPOINT TRACK [extra args]}" \
    "${@:3}"
