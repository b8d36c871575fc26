#!/usr/bin/env bash
# S2G visualization launcher (reference tools/s2g_visualize.sh)
python tools/s2g_visualize.py configs/stmogen/s2g_beats2_0125b.py \
    --checkpoint "${1:-outputs/s2g_0125b/params.npz}" \
    --out "${2:-outputs/s2g_vis}" "${@:3}"
