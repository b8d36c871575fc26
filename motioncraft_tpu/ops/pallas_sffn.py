"""Fused per-head (body-part) FFN over the interleaved head layout (Pallas).

SFFN (models/blocks.py, reference stmogen.py:581-607) is a pair of
block-diagonal matmuls: per head h, y_h = gelu(x_h @ w1[h] + b1[h]) @ w2[h]
+ b2[h] over rows [B*T].  The XLA einsum pair materializes the [B, T, H, f]
hidden activation in HBM (~308 MB at flagship shapes) and transposes the
interleaved [.., H, d] layout; this kernel keeps the hidden in VMEM and
reads/writes each row of the [N, H*d] matrix exactly once.  Weights use
constant index maps so Mosaic keeps them VMEM-resident across grid steps.

Inference-only (no custom VJP): training keeps the einsum pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .pallas_ffn import _erf_f32  # Mosaic has no erf/erfc primitive

BLOCK_N = 512  # rows per grid step


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    # one (head, row-block) cell: a single FFN dot pair on lane-sliced input
    xh = x_ref[...]                                  # [BLOCK_N, d]
    hh = jax.lax.dot(xh, w1_ref[0], preferred_element_type=jnp.float32)
    hh = hh + b1_ref[0, 0].astype(jnp.float32)
    # exact (erf) gelu via the A&S polynomial (|err| <= 1.5e-7)
    hh = hh * 0.5 * (1.0 + _erf_f32(hh * np.float32(2 ** -0.5)))
    yh = jax.lax.dot(hh.astype(xh.dtype), w2_ref[0],
                     preferred_element_type=jnp.float32)
    yh = yh + b2_ref[0, 0].astype(jnp.float32)
    o_ref[...] = yh.astype(o_ref.dtype)


def head_ffn(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
             w2: jnp.ndarray, b2: jnp.ndarray,
             interpret: bool = False) -> jnp.ndarray:
    """x [N, H*d] -> [N, H*d]; w1 [H, d, f], b1 [H, f], w2 [H, f, d],
    b2 [H, d].  N is padded to BLOCK_N internally."""
    n, hd = x.shape
    heads, d, f = w1.shape
    assert hd == heads * d, (hd, heads, d)
    n_pad = ((n + BLOCK_N - 1) // BLOCK_N) * BLOCK_N
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0))) if n_pad != n else x
    # grid (H major, row-blocks minor): per-head weights are DMA'd once per
    # head; each cell runs one [BLOCK_N, d] x [d, f] x [f, d] FFN pair on a
    # 128-lane-aligned column slice of the interleaved [N, H*d] layout
    out = pl.pallas_call(
        _kernel,
        grid=(heads, n_pad // BLOCK_N),
        in_specs=[
            pl.BlockSpec((BLOCK_N, d), lambda h, i: (i, h)),
            pl.BlockSpec((1, d, f), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((1, 1, f), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((1, f, d), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda h, i: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_N, d), lambda h, i: (i, h)),
        out_shape=jax.ShapeDtypeStruct((n_pad, hd), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * hd * f * 2,
            bytes_accessed=2 * n_pad * hd * x.dtype.itemsize
            + heads * 2 * d * f * w1.dtype.itemsize,
            transcendentals=n_pad * heads * f,
        ),
    )(x if n_pad == n else xp, w1, b1.reshape(heads, 1, f), w2,
      b2.reshape(heads, 1, d))
    return out[:n] if n_pad != n else out


def head_ffn_reference(x, w1, b1, w2, b2):
    """Plain-jnp reference for parity tests."""
    n, hd = x.shape
    heads, d, f = w1.shape
    xh = x.reshape(n, heads, d).astype(jnp.float32)
    h = jax.nn.gelu(jnp.einsum("nhd,hdf->nhf", xh, w1.astype(jnp.float32))
                    + b1.astype(jnp.float32), approximate=False)
    y = jnp.einsum("nhf,hfd->nhd", h, w2.astype(jnp.float32)) + b2.astype(jnp.float32)
    return y.reshape(n, hd).astype(x.dtype)
