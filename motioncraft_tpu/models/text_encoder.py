"""Frozen CLIP ViT-B/32 text tower + finetune transformer, in flax.

The reference loads OpenAI CLIP and runs its text transformer frozen, then a
small trainable 2-layer post-LN transformer + LayerNorm
(/root/reference/mogen/models/transformers/diffusion_transformer.py:109-172).
Here the CLIP text tower is re-implemented natively (token/pos embeddings,
12 pre-LN blocks with QuickGELU and a causal mask, ln_final); weights are
converted from the released checkpoint by utils/torch_convert.py.  Freezing is
expressed functionally: CLIP outputs are wrapped in ``stop_gradient`` and the
optimizer masks the ``clip/`` subtree (parallel/train_state.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import LayerNorm


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ClipAttention(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask=None, key_mask=None):
        B, T, C = x.shape
        qkv = nn.Dense(3 * C, name="in_proj")(x).reshape(B, T, 3, self.heads, C // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = (C // self.heads) ** -0.5
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        if mask is not None:
            attn = attn + mask
        if key_mask is not None:  # [B, T] bool, True = attendable
            attn = jnp.where(key_mask[:, None, None, :], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, C)
        return nn.Dense(C, name="out_proj")(y)


class ClipBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        x = x + ClipAttention(self.width, self.heads, name="attn")(
            LayerNorm(name="ln_1")(x), mask)
        h = nn.Dense(self.width * 4, name="mlp_fc")(LayerNorm(name="ln_2")(x))
        x = x + nn.Dense(self.width, name="mlp_proj")(quick_gelu(h))
        return x


class ClipTextModel(nn.Module):
    """OpenAI CLIP text transformer (ViT-B/32 spec: 512 wide, 12 layers,
    8 heads, context 77, causal mask)."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512  # text_projection output (pooled encode_text)

    @nn.compact
    def __call__(self, text_ids, return_pooled: bool = False):
        tok = nn.Embed(self.vocab_size, self.width, name="token_embedding")(text_ids)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = tok + pos[None, :text_ids.shape[1], :]
        T = text_ids.shape[1]
        causal = jnp.triu(jnp.full((T, T), -jnp.inf), k=1)[None, None]
        for i in range(self.layers):
            x = ClipBlock(self.width, self.heads, name=f"resblock_{i}")(x, causal)
        x = LayerNorm(name="ln_final")(x)  # [B, 77, width]
        if return_pooled:
            # CLIP encode_text: features at the EOT token (= argmax token id)
            # projected by text_projection
            proj = self.param("text_projection", nn.initializers.normal(0.02),
                              (self.width, self.embed_dim))
            eot = jnp.argmax(text_ids, axis=-1)
            return x[jnp.arange(x.shape[0]), eot] @ proj
        return x


class PostLNEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer semantics (post-LN, full attention)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.0
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, train: bool = False, key_mask=None):
        y = ClipAttention(self.d_model, self.nhead, name="self_attn")(x, key_mask=key_mask)
        y = nn.Dropout(self.dropout)(y, deterministic=not train)
        x = LayerNorm(name="norm1")(x + y)
        act = ((lambda v: nn.gelu(v, approximate=False))
               if self.activation == "gelu" else nn.relu)
        h = nn.Dense(self.dim_feedforward, name="linear1")(x)
        h = nn.Dropout(self.dropout)(act(h), deterministic=not train)
        h = nn.Dense(self.d_model, name="linear2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return LayerNorm(name="norm2")(x + h)


class TextEncoder(nn.Module):
    """CLIP (frozen) -> pre-proj -> finetune transformer -> LayerNorm.

    Returns xf_out [B, 77, text_latent_dim]; with use_text_proj also returns
    the EOT-pooled projection into the time-embedding space.
    """

    latent_dim: int = 256
    num_layers: int = 2
    ff_size: int = 2048
    num_heads: int = 4
    dropout: float = 0.0
    activation: str = "gelu"
    use_text_proj: bool = False
    time_embed_dim: int = 2048
    clip_width: int = 512
    clip_layers: int = 12

    @nn.compact
    def __call__(self, text_ids, clip_feat: Optional[jnp.ndarray] = None,
                 train: bool = False):
        if clip_feat is None:
            x = ClipTextModel(width=self.clip_width, layers=self.clip_layers,
                              heads=max(1, self.clip_width // 64), name="clip")(text_ids)
        else:
            x = clip_feat
        x = jax.lax.stop_gradient(x)  # frozen CLIP (set_requires_grad False)
        if self.latent_dim != self.clip_width:
            x = nn.Dense(self.latent_dim, name="text_pre_proj")(x)
        for i in range(self.num_layers):
            x = PostLNEncoderLayer(self.latent_dim, self.num_heads, self.ff_size,
                                   self.dropout, self.activation,
                                   name=f"textTransEncoder_{i}")(x, train=train)
        xf_out = LayerNorm(name="text_ln")(x)
        if self.use_text_proj:
            eot_idx = jnp.argmax(text_ids, axis=-1)
            pooled = xf_out[jnp.arange(xf_out.shape[0]), eot_idx]
            xf_proj = nn.Dense(self.time_embed_dim, name="text_proj")(pooled)
            return xf_proj, xf_out
        return xf_out
