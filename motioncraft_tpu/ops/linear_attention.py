"""Core linear-attention contraction shared by all efficient attentions.

The MotionDiffuse-family linear attention computes, per head,
``A = K^T V`` (softmax over the sequence axis on K) followed by ``Y = Q A``
(softmax over the channel axis on Q) — two [d, d] outer-product matmuls
instead of an [N, N] attention matrix, O(N·d²) and perfectly MXU-shaped
(reference: mogen/models/attentions/efficient_attention.py:34-41,
st_attention.py:148-170).

`linear_attention_core` is the XLA path (fuses fine); a fused Pallas kernel
for the full masked-softmax→KV→QA chain lives in ops/pallas_attention.py and
is selected by `use_pallas` when running on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_attention_core(query: jnp.ndarray, key: jnp.ndarray, value: jnp.ndarray) -> jnp.ndarray:
    """query [B,T,H,d] (softmaxed over d), key [B,N,H,d] (softmaxed over N),
    value [B,N,H,l] (masked) -> [B,T,H,l]."""
    attention = jnp.einsum("bnhd,bnhl->bhdl", key, value)
    return jnp.einsum("bthd,bhdl->bthl", query, attention)


def masked_linear_attention(q_logits, k_logits, value, *, key_mask=None) -> jnp.ndarray:
    """Apply the reference's softmax/mask conventions then contract.

    q_logits [B,T,H,d]: softmax over channel (last) axis.
    k_logits [B,N,H,d]: additive -1e6 mask already applied by callers or via
      key_mask [B,N,1,1]; softmax over the sequence axis.
    value    [B,N,H,l]: multiplicatively masked by callers.
    """
    if key_mask is not None:
        k_logits = k_logits + (1 - key_mask) * -1000000.0
    query = jax.nn.softmax(q_logits, axis=-1)
    key = jax.nn.softmax(k_logits, axis=1)
    return linear_attention_core(query, key, value)
