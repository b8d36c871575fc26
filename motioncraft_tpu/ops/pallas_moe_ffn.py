"""Fused grouped expert-FFN over rank-compact MoE rows (Pallas, TPU).

The XLA ragged path materializes the [M, hidden] activation between the two
``lax.ragged_dot`` calls (plus a gelu pass), ~3x the bandwidth floor of the
op.  This kernel processes expert-aligned row blocks — group offsets are
pre-padded to BLOCK rows so every block belongs to exactly one expert, whose
id arrives via scalar prefetch — and keeps the hidden activation in VMEM:

    o_block = gelu(x_block @ w1[e] + b1[e]) @ w2[e]

Per-row gate weighting and b2 are intentionally excluded: the gate is a
per-row scalar so the caller applies it at combine time (g*(h@w2) ==
(g*h)@w2), and the gate-weighted expert bias comes from the tiny [E, D]
table directly (see models/moe.py).

Inference-only (no VJP): training uses the dense/slot paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_ffn import _erf_f32  # Mosaic has no erf/erfc primitive

BLOCK = 512  # rows per grid step; group offsets must be BLOCK-aligned (1024 measured ~1.5% faster standalone; kept at 512 for cache stability)


def _kernel(be_ref, x_ref, w1_ref, b1_ref, w2_ref, o_ref):
    x = x_ref[...]                                  # [BLOCK, D]
    w1 = w1_ref[0]                                  # [D, H]
    h = jax.lax.dot(x, w1, preferred_element_type=jnp.float32)
    h = h + b1_ref[0, 0].astype(jnp.float32)
    # exact (erf) gelu via the A&S polynomial (|err| <= 1.5e-7)
    h = h * 0.5 * (1.0 + _erf_f32(h * np.float32(2 ** -0.5)))
    o = jax.lax.dot(h.astype(x.dtype), w2_ref[0],
                    preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def grouped_ffn(block_expert: jnp.ndarray, xs: jnp.ndarray,
                w1: jnp.ndarray, b1: jnp.ndarray, w2: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """xs [M_pad, D] expert-sorted rows (BLOCK-aligned groups),
    block_expert [M_pad/BLOCK] int32 -> FFN rows [M_pad, D]."""
    m_pad, d = xs.shape
    assert m_pad % BLOCK == 0, m_pad
    nb = m_pad // BLOCK
    e, _, hid = w1.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((BLOCK, d), lambda i, be: (i, 0)),
            pl.BlockSpec((1, d, hid), lambda i, be: (be[i], 0, 0)),
            # [E, 1, hid]: a (1, hid) 2-D block would violate the TPU
            # sublane-divisibility rule (second-to-last dim 1 vs E=16)
            pl.BlockSpec((1, 1, hid), lambda i, be: (be[i], 0, 0)),
            pl.BlockSpec((1, hid, d), lambda i, be: (be[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK, d), lambda i, be: (i, 0)),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, d), xs.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * d * hid * 2,
            bytes_accessed=m_pad * d * 2 * xs.dtype.itemsize
            + nb * (2 * d * hid) * w1.dtype.itemsize,
            transcendentals=m_pad * hid,
        ),
    )(block_expert, xs, w1, b1.reshape(e, 1, hid), w2)


def grouped_ffn_reference(block_expert, xs, w1, b1, w2):
    """Plain-jnp reference for parity tests."""
    m_pad, d = xs.shape
    nb = m_pad // BLOCK
    out = []
    for i in range(nb):
        e = block_expert[i]
        x = xs[i * BLOCK:(i + 1) * BLOCK].astype(jnp.float32)
        h = jax.nn.gelu(x @ w1[e].astype(jnp.float32) + b1[e], approximate=False)
        out.append(h @ w2[e].astype(jnp.float32))
    return jnp.concatenate(out, 0).astype(xs.dtype)
