"""Fused STMA global linear attention over the interleaved layout (Pallas).

The STMA hot chain (models/attentions.py STMA.__call__; reference
st_attention.py:148-170) is: slice key/value/query lanes out of the MoE
projection [B, T, H, 4d], concatenate text+motion keys/values along the
sequence, additively mask keys with -1e6, key-softmax over the joint
sequence, A = K^T V, query channel-softmax, Y = Q A.  The XLA path
materializes the concats, the masked keys and the softmax intermediates in
HBM (~6 full-tensor passes).

This kernel runs one (batch, head) cell per grid step and reads the
projection directly with lane-sliced BlockSpecs — no transposes, no
concatenation: the joint-sequence softmax is computed as a two-part
(text, motion) normalization, exactly equal to softmax over the
concatenated axis.  Everything stays in VMEM in f32.

An earlier kernel (ops/pallas_attention.py) pre-transposed to [B*H, N, d]
and measured slower than XLA; this one exists because the transposes were
the cost.  Inference-only (no VJP): training uses the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1000000.0


def _kernel(tcond_ref, mot_ref, txt_ref, mask_ref, o_ref, *, d: int):
    mot = mot_ref[0]                       # [T, 4d] one head's projection
    txt = txt_ref[0]                       # [TXT, 2d] shared text projection
    mask = mask_ref[0].astype(jnp.float32)     # [T, 1] 1=valid
    # per-batch text-cond arrives via scalar prefetch: a (1, 1) vector block
    # broadcast to [TXT, d] needs both sublane+lane broadcast, which Mosaic
    # does not implement — a scalar splat does
    tc = tcond_ref[pl.program_id(0)].astype(jnp.float32)

    k_mot = mot[:, d:2 * d].astype(jnp.float32) + (1.0 - mask) * NEG_INF
    v_mot = mot[:, 2 * d:3 * d].astype(jnp.float32) * mask
    q = mot[:, 3 * d:4 * d].astype(jnp.float32)
    k_txt = txt[:, :d].astype(jnp.float32) + (1.0 - tc) * NEG_INF
    v_txt = txt[:, d:].astype(jnp.float32) * tc

    # key softmax over the joint (text ++ motion) sequence, two-part
    kmax = jnp.maximum(jnp.max(k_mot, axis=0, keepdims=True),
                       jnp.max(k_txt, axis=0, keepdims=True))
    em = jnp.exp(k_mot - kmax)
    et = jnp.exp(k_txt - kmax)
    den = jnp.sum(em, axis=0, keepdims=True) + jnp.sum(et, axis=0, keepdims=True)
    em = em / den
    et = et / den

    # A = K^T V  [d, d] from both parts
    a = jax.lax.dot_general(et, v_txt, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    a = a + jax.lax.dot_general(em, v_mot, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

    # query channel softmax
    qmax = jnp.max(q, axis=1, keepdims=True)
    qe = jnp.exp(q - qmax)
    qs = qe / jnp.sum(qe, axis=1, keepdims=True)

    o_ref[0] = jnp.dot(qs, a, preferred_element_type=jnp.float32).astype(
        o_ref.dtype)


def stma_linear_attention(motion_feat: jnp.ndarray, text_feat: jnp.ndarray,
                          src_mask: jnp.ndarray, text_cond: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """motion_feat [B, T, H, 4d] (body-value | key | value | query lanes),
    text_feat [B, TXT, 2d] (key | value, single text head), src_mask
    [B, T, 1] (1=valid), text_cond [B, 1, 1] (1=text on) -> [B, T, H, d]."""
    B, T, H, d4 = motion_feat.shape
    d = d4 // 4
    TXT = text_feat.shape[1]
    mot = motion_feat.reshape(B, T, H * d4)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, T, d4), lambda b, h, tc: (b, 0, h)),
            pl.BlockSpec((1, TXT, 2 * d), lambda b, h, tc: (b, 0, 0)),
            pl.BlockSpec((1, T, 1), lambda b, h, tc: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, d), lambda b, h, tc: (b, 0, h)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, d=d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, H * d), motion_feat.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (T + TXT) * d * d * 2,
            bytes_accessed=B * (T * H * d4 + TXT * 2 * d + T * H * d)
            * motion_feat.dtype.itemsize,
            transcendentals=B * H * (2 * T + TXT) * d,
        ),
    )(text_cond.reshape(B).astype(jnp.float32), mot, text_feat,
      src_mask.astype(motion_feat.dtype))
    return out.reshape(B, T, H, d)


def stma_linear_attention_reference(motion_feat, text_feat, src_mask, text_cond):
    """Plain-jnp reference (mirrors the STMA XLA path) for parity tests."""
    B, T, H, d4 = motion_feat.shape
    d = d4 // 4
    mask = src_mask.reshape(B, T, 1, 1).astype(jnp.float32)
    tcond = text_cond.reshape(B, 1, 1, 1).astype(jnp.float32)
    key_text = jnp.broadcast_to(
        text_feat[:, :, None, :d].astype(jnp.float32) + (1 - tcond) * NEG_INF,
        (B, text_feat.shape[1], H, d))
    value_text = jnp.broadcast_to(
        text_feat[:, :, None, d:].astype(jnp.float32) * tcond,
        (B, text_feat.shape[1], H, d))
    key_mot = motion_feat[..., d:2 * d].astype(jnp.float32) + (1 - mask) * NEG_INF
    value_mot = motion_feat[..., 2 * d:3 * d].astype(jnp.float32) * mask
    query = motion_feat[..., 3 * d:].astype(jnp.float32)
    key = jnp.concatenate([key_text, key_mot], axis=1)
    value = jnp.concatenate([value_text, value_mot], axis=1)
    key = jax.nn.softmax(key, axis=1)
    query = jax.nn.softmax(query, axis=-1)
    att = jnp.einsum("bnhd,bnhl->bhdl", key, value)
    return jnp.einsum("bthd,bhdl->bthl", query, att).astype(motion_feat.dtype)
