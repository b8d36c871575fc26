"""Fused Pallas TPU kernel for the masked linear attention.

This is the hot op of the STMA / Efficient attention family (SURVEY.md §7.2):
per (batch, head) it fuses
    key column-softmax over the sequence axis (with additive -1e6 masking
    already applied by the caller)
    -> A = K^T V  (d x d outer-product matmul on the MXU)
    -> query row-softmax over the channel axis
    -> Y = Q A
into a single VMEM-resident kernel, avoiding three HBM materializations of
[B, N, H, d]-shaped intermediates that the unfused XLA path writes.

Shapes are padded to (8, 128) tiles in the wrapper; key padding uses -1e6 so
the softmax ignores it exactly like real masked positions, and query padding
rows produce garbage that is sliced away.

Backward: jax.custom_vjp recomputes via the reference einsum path (cheap —
inference is the hot use; training uses the XLA path's fused gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .linear_attention import linear_attention_core

# read ONCE at import: trace-time os.environ reads are a cache-key hazard
import os as _os

_ENV_PALLAS_ATTN = _os.environ.get("MOTIONCRAFT_PALLAS", "0")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, o_ref):
    # refs: q [1, T, d], k [1, N, d], v [1, N, d] for one (b, h) grid cell
    q = q_ref[0]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    # column softmax over the sequence axis (keys)
    k_max = jnp.max(k, axis=0, keepdims=True)
    k_exp = jnp.exp(k - k_max)
    k_soft = k_exp / (jnp.sum(k_exp, axis=0, keepdims=True) + 1e-30)
    # A = K^T V  [d, d]
    A = jax.lax.dot_general(k_soft.astype(v.dtype), v,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # row softmax over the channel axis (queries)
    qf = q.astype(jnp.float32)
    q_max = jnp.max(qf, axis=1, keepdims=True)
    q_exp = jnp.exp(qf - q_max)
    q_soft = q_exp / (jnp.sum(q_exp, axis=1, keepdims=True) + 1e-30)
    o_ref[0] = jnp.dot(q_soft.astype(v.dtype), A.astype(v.dtype),
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _pallas_forward(q_logits, k_logits, value, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, H, d = q_logits.shape
    N = k_logits.shape[1]
    Tp, Np = _round_up(T, 8), _round_up(N, 8)

    # layout: [B, H, T/N, d] so each grid cell reads one contiguous block
    q = jnp.transpose(q_logits, (0, 2, 1, 3))
    k = jnp.transpose(k_logits, (0, 2, 1, 3))
    v = jnp.transpose(value, (0, 2, 1, 3))
    if Tp != T:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    if Np != N:
        # pad keys at -1e6 (masked), values at 0
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Np - N), (0, 0)),
                    constant_values=-1e6)
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Np - N), (0, 0)))

    q = q.reshape(B * H, Tp, d)
    k = k.reshape(B * H, Np, d)
    v = v.reshape(B * H, Np, d)

    out = pl.pallas_call(
        _kernel,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, d), value.dtype),
        interpret=interpret,
    )(q, k, v)
    out = out.reshape(B, H, Tp, d)[:, :, :T]
    return jnp.transpose(out, (0, 2, 1, 3))


def _reference(q_logits, k_logits, value):
    query = jax.nn.softmax(q_logits, axis=-1)
    key = jax.nn.softmax(k_logits, axis=1)
    return linear_attention_core(query, key, value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_linear_attention(q_logits, k_logits, value, interpret=False):
    """q_logits [B,T,H,d], k_logits [B,N,H,d] (additively masked),
    value [B,N,H,d] (multiplicatively masked) -> [B,T,H,d]."""
    return _pallas_forward(q_logits, k_logits, value, interpret)


def _fwd(q_logits, k_logits, value, interpret):
    return _pallas_forward(q_logits, k_logits, value, interpret), \
        (q_logits, k_logits, value)


def _bwd(interpret, residuals, g):
    q_logits, k_logits, value = residuals
    _, vjp = jax.vjp(_reference, q_logits, k_logits, value)
    return vjp(g)


fused_linear_attention.defvjp(_fwd, _bwd)


def linear_attention(q_logits, k_logits, value, use_pallas: str = "auto"):
    """Dispatch: fused Pallas kernel or the XLA einsum path.

    Default "auto" uses Pallas only when MOTIONCRAFT_PALLAS=1 (read once at
    import) AND the backend is TPU: some AOT/remote-compile TPU environments
    compile Mosaic kernels very slowly, and XLA's fusion of this op is
    already decent — opt in after validating on the target runtime."""
    from .kernel_gate import pallas_disabled
    if use_pallas == "never" or pallas_disabled():
        return _reference(q_logits, k_logits, value)
    on_tpu = jax.default_backend() == "tpu"
    enabled = _ENV_PALLAS_ATTN == "1"
    if use_pallas == "always" or (use_pallas == "auto" and on_tpu and enabled):
        return fused_linear_attention(q_logits, k_logits, value)
    return _reference(q_logits, k_logits, value)
