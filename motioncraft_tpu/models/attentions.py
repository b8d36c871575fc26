"""Attention families (flax.linen), registered under the ATTENTIONS registry.

Re-implements the reference attention zoo TPU-first:
  - Efficient (linear) self/cross/mixed attention
    (/root/reference/mogen/models/attentions/efficient_attention.py)
  - Base (quadratic) self/cross/mixed attention (base_attention.py)
  - STMA — MotionCraft's MC-Attn: MoE-projected static/dynamic body-graph +
    global linear attention (st_attention.py:64-179)
  - SAMI — FineMoGen's Taylor-template attention (fine_attention.py:62-202)

All modules share the calling convention
``__call__(x, xf=..., emb=..., src_mask=..., cond_type=..., motion_length=...,
num_intervals=1, train=False)``; unused conditions are accepted and ignored so
DecoderLayer can fan kwargs uniformly.  Auxiliary losses are exposed through
flax's ``losses`` collection (``sow``), summed by the architecture.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import LayerNorm, QDense

from ..ops.linear_attention import linear_attention_core
from ..ops.pallas_attention import linear_attention
from ..registry import ATTENTIONS
from .blocks import StylizationBlock
from .moe import MOE

NEG_INF = -1000000.0

# read ONCE at import (trace-time env reads are a cache-key hazard)
import os as _os

_ENV_STMA_KERNEL = _os.environ.get("MOTIONCRAFT_PALLAS_STMA")


def _use_stma_kernel(train: bool, num_text_heads: int, d: int,
                     n_tokens: int) -> bool:
    """Fused STMA linear-attention kernel — OPT-IN (MOTIONCRAFT_PALLAS_STMA=1):
    measured 30.5 vs 29.7 ms/layer against XLA's own fusion of the chain at
    flagship shapes on v5e (the (B, H) grid of ~200 KB cells is overhead-
    bound).  Kept parity-tested for runtimes/shapes where it may win.
    Requires eval mode, single text head, lane-aligned head dim."""
    from ..ops.kernel_gate import pallas_disabled
    if train or num_text_heads != 1 or d % 128 or pallas_disabled():
        return False
    return _ENV_STMA_KERNEL == "1"


def _text_cond_mask(cond_type, B):
    """cond_type [B,1,1] ints; text active when cond_type % 10 > 0."""
    return ((cond_type % 10) > 0).astype(jnp.float32).reshape(B, 1, 1)


def _group_softmax(x, num_groups):
    """Softmax within contiguous lane groups of x's last axis ([..., D] with
    D = num_groups * d): equals softmax over the head dim of the split
    [..., H, d] layout without keeping tensors in that 16-lane layout."""
    shape = x.shape
    xh = x.reshape(shape[:-1] + (num_groups, shape[-1] // num_groups))
    gmax = jax.lax.stop_gradient(xh.max(axis=-1, keepdims=True))
    e = jnp.exp(xh - gmax)
    out = e / e.sum(axis=-1, keepdims=True)
    return out.reshape(shape)


@ATTENTIONS.register_module()
class EfficientSelfAttention(nn.Module):
    """MotionDiffuse linear self-attention (efficient_attention.py:9-46).

    ``merged_lanes`` computes the identical math without the [.., H, d]
    head split: with d=16 the split layout uses 1/8 of the TPU's 128 lanes
    and the per-head einsums become ~2e5 tiny [T,16]x[T,16] matmuls.  The
    merged path softmaxes in the [.., D] layout and contracts one
    [D, D] matrix masked to the block-diagonal (kron(I_H, 1_dxd)) — same
    result, MXU-shaped.  Measured 18.6 ms -> ~4 ms for STMA's 12-part
    dynamic body graph at the flagship shape on v5e.
    """

    latent_dim: int
    num_heads: int
    dropout: float = 0.0
    time_embed_dim: Optional[int] = None
    merged_lanes: bool = False

    @nn.compact
    def __call__(self, x, src_mask=None, emb=None, train: bool = False, **kwargs):
        B, T, D = x.shape
        H = self.num_heads
        xn = LayerNorm(name="norm")(x).astype(x.dtype)
        q_logits = QDense(D, name="query")(xn)
        k_logits = QDense(D, name="key")(xn) + (1 - src_mask) * NEG_INF
        v = QDense(D, name="value")(xn) * src_mask
        if self.merged_lanes:
            qs = _group_softmax(q_logits, H)
            ks = jax.nn.softmax(k_logits, axis=1)  # per lane == per (h, d)
            d = D // H
            block = jnp.asarray(np.kron(np.eye(H, dtype=np.float32),
                                        np.ones((d, d), np.float32)), v.dtype)
            A = jnp.einsum("bnd,bnl->bdl", ks.astype(v.dtype), v) * block
            y = jnp.einsum("btd,bdl->btl", qs.astype(v.dtype), A)
        else:
            y = linear_attention(q_logits.reshape(B, T, H, -1),
                                 k_logits.reshape(B, T, H, -1),
                                 v.reshape(B, T, H, -1)).reshape(B, T, D)
        if self.time_embed_dim is None:
            return x + y
        return x + StylizationBlock(D, self.time_embed_dim, self.dropout,
                                    name="proj_out")(y, emb, train=train)


@ATTENTIONS.register_module()
class EfficientCrossAttention(nn.Module):
    latent_dim: int
    text_latent_dim: int
    num_heads: int
    dropout: float = 0.0
    time_embed_dim: int = 2048

    @nn.compact
    def __call__(self, x, xf=None, emb=None, cond_type=None, train: bool = False, **kwargs):
        B, T, D = x.shape
        N = xf.shape[1]
        H = self.num_heads
        xn = LayerNorm(name="norm")(x).astype(x.dtype)
        tn = LayerNorm(name="text_norm")(xf).astype(xf.dtype)
        query = QDense(D, name="query")(xn).reshape(B, T, H, -1)
        key = QDense(D, name="key")(tn)
        if cond_type is None:
            key = key.reshape(B, N, H, -1)
            value = QDense(D, name="value")(tn).reshape(B, N, H, -1)
        else:
            tc = _text_cond_mask(cond_type, B)
            key = (key + (1 - tc) * NEG_INF).reshape(B, N, H, -1)
            value = QDense(D, name="value")(tn * tc).reshape(B, N, H, -1)
        y = linear_attention(query, key, value).reshape(B, T, D)
        return x + StylizationBlock(D, self.time_embed_dim, self.dropout,
                                    name="proj_out")(y, emb, train=train)


@ATTENTIONS.register_module()
class EfficientMixedAttention(nn.Module):
    latent_dim: int
    text_latent_dim: int
    num_heads: int
    dropout: float = 0.0
    time_embed_dim: int = 2048

    @nn.compact
    def __call__(self, x, xf=None, emb=None, src_mask=None, cond_type=None,
                 train: bool = False, **kwargs):
        B, T, D = x.shape
        N = xf.shape[1] + T
        H = self.num_heads
        xn = LayerNorm(name="norm")(x).astype(x.dtype)
        tn = LayerNorm(name="text_norm")(xf).astype(xf.dtype)
        tc = _text_cond_mask(cond_type, B)
        sm = src_mask.reshape(B, T, 1)
        key = jnp.concatenate([
            QDense(D, name="key_text")(tn) + (1 - tc) * NEG_INF,
            QDense(D, name="key_motion")(xn) + (1 - sm) * NEG_INF,
        ], axis=1)
        query = QDense(D, name="query")(xn).reshape(B, T, H, -1)
        value = jnp.concatenate([
            QDense(D, name="value_text")(tn) * tc,
            QDense(D, name="value_motion")(xn) * sm,
        ], axis=1).reshape(B, N, H, -1)
        if train and self.dropout > 0:
            q_soft = jax.nn.softmax(query, axis=-1)
            k_soft = jax.nn.softmax(key.reshape(B, N, H, -1), axis=1)
            k_soft = nn.Dropout(self.dropout)(k_soft, deterministic=False)
            y = linear_attention_core(q_soft, k_soft, value).reshape(B, T, D)
        else:
            y = linear_attention(query, key.reshape(B, N, H, -1), value).reshape(B, T, D)
        return x + StylizationBlock(D, self.time_embed_dim, self.dropout,
                                    name="proj_out")(y, emb, train=train)


@ATTENTIONS.register_module()
class BaseSelfAttention(nn.Module):
    latent_dim: int
    num_heads: int
    dropout: float = 0.0
    time_embed_dim: int = 2048

    @nn.compact
    def __call__(self, x, emb=None, src_mask=None, train: bool = False, **kwargs):
        B, T, D = x.shape
        H = self.num_heads
        xn = LayerNorm(name="norm")(x).astype(x.dtype)
        query = QDense(D, name="query")(xn).reshape(B, T, H, -1)
        key = QDense(D, name="key")(xn).reshape(B, T, H, -1)
        attn = jnp.einsum("bnhl,bmhl->bnmh", query, key)
        attn = attn + (1 - src_mask.reshape(B, 1, T, 1)) * NEG_INF
        attn = jax.nn.softmax(attn, axis=2)
        value = (QDense(D, name="value")(xn) * src_mask).reshape(B, T, H, -1)
        y = jnp.einsum("bnmh,bmhl->bnhl", attn, value).reshape(B, T, D)
        return x + StylizationBlock(D, self.time_embed_dim, self.dropout,
                                    name="proj_out")(y, emb, train=train)


@ATTENTIONS.register_module()
class BaseCrossAttention(nn.Module):
    latent_dim: int
    text_latent_dim: int
    num_heads: int
    dropout: float = 0.0
    time_embed_dim: int = 2048

    @nn.compact
    def __call__(self, x, xf=None, emb=None, src_mask=None, cond_type=None,
                 train: bool = False, **kwargs):
        B, T, D = x.shape
        N = xf.shape[1]
        H = self.num_heads
        xn = LayerNorm(name="norm")(x).astype(x.dtype)
        tn = LayerNorm(name="text_norm")(xf).astype(xf.dtype)
        query = QDense(D, name="query")(xn).reshape(B, T, H, -1)
        key = QDense(D, name="key")(tn).reshape(B, N, H, -1)
        attn = jnp.einsum("bnhl,bmhl->bnmh", query, key)
        if cond_type is None:
            tc = jnp.ones((B, 1, 1), jnp.float32)
        else:
            tc = _text_cond_mask(cond_type, B)
        attn = attn + (1 - tc.reshape(B, 1, 1, 1)) * NEG_INF
        attn = jax.nn.softmax(attn, axis=2)
        value = (QDense(D, name="value")(tn) * tc).reshape(B, N, H, -1)
        y = jnp.einsum("bnmh,bmhl->bnhl", attn, value).reshape(B, T, D)
        return x + StylizationBlock(D, self.time_embed_dim, self.dropout,
                                    name="proj_out")(y, emb, train=train)


@ATTENTIONS.register_module()
class BaseMixedAttention(nn.Module):
    latent_dim: int
    text_latent_dim: int
    num_heads: int
    dropout: float = 0.0
    time_embed_dim: int = 2048

    @nn.compact
    def __call__(self, x, xf=None, emb=None, src_mask=None, cond_type=None,
                 train: bool = False, **kwargs):
        B, T, D = x.shape
        Nt = xf.shape[1]
        H = self.num_heads
        xn = LayerNorm(name="norm")(x).astype(x.dtype)
        tn = LayerNorm(name="text_norm")(xf).astype(xf.dtype)
        tc = _text_cond_mask(cond_type, B)
        query = QDense(D, name="query")(xn).reshape(B, T, H, -1)
        key = jnp.concatenate([
            QDense(D, name="key_text")(tn),
            QDense(D, name="key_motion")(xn),
        ], axis=1).reshape(B, Nt + T, H, -1)
        attn = jnp.einsum("bnhl,bmhl->bnmh", query, key)
        mask = jnp.concatenate([
            jnp.broadcast_to(tc.reshape(B, 1, 1, 1), (B, 1, Nt, 1)),
            src_mask.reshape(B, 1, T, 1),
        ], axis=2)
        attn = jax.nn.softmax(attn + (1 - mask) * NEG_INF, axis=2)
        value = jnp.concatenate([
            QDense(D, name="value_text")(tn) * tc,
            QDense(D, name="value_motion")(xn) * src_mask.reshape(B, T, 1),
        ], axis=1).reshape(B, Nt + T, H, -1)
        y = jnp.einsum("bnmh,bmhl->bnhl", attn, value).reshape(B, T, D)
        return x + StylizationBlock(D, self.time_embed_dim, self.dropout,
                                    name="proj_out")(y, emb, train=train)


def fold_patch_mask(src_mask: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Fold a frame mask [B, T*p, 1] into a patch mask [B, T, 1]: a patch is
    valid only if all its frames are (st_attention.py:138-145)."""
    B = src_mask.shape[0]
    m = src_mask.reshape(B, -1)
    m = m.reshape(B, m.shape[1] // patch_size, patch_size)
    return m.min(axis=-1, keepdims=True)


@ATTENTIONS.register_module()
class STMA(nn.Module):
    """MotionCraft MC-Attn (st_attention.py:64-179).

    Per-head body-part features -> Tutel-style MoE projections of text (2L)
    and motion (4L: body-value, key, value, query); static body graph =
    learned softmax(H x H) mix of per-part values; dynamic graph = linear
    self-attention across the H part tokens per frame; global linear
    attention over the joint text+motion sequence.
    """

    latent_dim: int
    text_latent_dim: int
    num_heads: int
    num_text_heads: int
    num_experts: int
    topk: int
    gate_type: str = "cosine_top"
    gate_noise: float = 1.0
    ffn_dim: int = 512
    time_embed_dim: int = 2048
    max_seq_len: int = 196
    max_text_seq_len: int = 77
    temporal_comb: bool = False
    dropout: float = 0.0
    static_body: bool = True
    dynamic_body: bool = False
    patch_size: int = 1
    expert_axis: Optional[str] = None

    def _text_branch(self, xf, train: bool):
        """LayerNorm + text MoE over the text lane — depends ONLY on ``xf``
        (no x/emb/timestep), so it is both CFG-half-identical and
        DDIM-step-invariant; the caller may hoist it out of the sampling
        scan entirely (stmogen.py precompute_text_feats)."""
        L = self.latent_dim
        text_in = xf.reshape(xf.shape[0], xf.shape[1], self.num_text_heads, -1)
        return MOE(self.num_experts, self.topk, self.text_latent_dim,
                   self.text_latent_dim * 4, 2 * L, self.num_text_heads,
                   self.max_text_seq_len, self.gate_type, self.gate_noise,
                   expert_axis=self.expert_axis, name="text_moe")(
            LayerNorm(name="text_norm")(text_in).astype(text_in.dtype),
            train=train)

    @nn.compact
    def __call__(self, x, xf=None, emb=None, src_mask=None, cond_type=None,
                 motion_length=None, num_intervals=1, train: bool = False,
                 cfg_dedup: bool = False, text_feat=None,
                 text_only: bool = False, **kwargs):
        if text_only:
            # precompute mode: return the step-invariant text features and
            # touch nothing else (apply-time only; init runs the full path)
            return self._text_branch(xf, train=False)[0]
        B, T, D = x.shape
        H, L = self.num_heads, self.latent_dim
        N = xf.shape[1] + T

        # CFG layer-0 dedup (caller guarantees the two batch halves are the
        # identical cond/uncond copies of the SAME x/xf/emb — true only for
        # the first decoder layer of the CFG-doubled test forward,
        # stmogen.py forward_test): the MOTION MoE projections, the body
        # graph and their LayerNorms are text_cond_type-independent, so
        # compute them once on the first half and tile (the text branch is
        # NOT deduped — MoE capacity is token-count-sized, so halving its
        # batch would change drop behavior; it is hoisted per-call instead).
        # Bit-exact unless MoE capacity dropping triggers (token positions
        # shift with N; verified drop-free at flagship shapes in
        # tests/test_cfg_dedup.py).
        dedup = cfg_dedup and not train and B % 2 == 0 and B > 1
        Bc = B // 2 if dedup else B

        xh = x.reshape(B, T, H, L)
        xh_c = xh[:Bc]
        if text_feat is None:
            # always on the FULL batch: MoE capacity is sized by the token
            # count, so computing text on the half batch would change drop
            # behavior vs the reference's 2B-everywhere semantics — the
            # dedup therefore covers only the motion/body branch
            text_feat, text_aux = self._text_branch(xf, train=train)
        else:
            # hoisted: computed once per sampling call on the same doubled
            # batch (stmogen.py precompute_text_feats) — identical routing,
            # capacity and drops as the in-layer compute it replaces
            text_aux = 0.0
        motion_feat, motion_aux = MOE(self.num_experts, self.topk, L, L * 4, 4 * L, H,
                                      self.max_seq_len, self.gate_type, self.gate_noise,
                                      expert_axis=self.expert_axis, name="motion_moe")(
            LayerNorm(name="norm")(xh_c).astype(xh_c.dtype), train=train)

        body_weight = self.param("body_weight", nn.initializers.normal(1.0), (H, H))
        body_value = motion_feat[:, :, :, :L]
        body_feat = body_value
        if self.static_body:
            body_feat = jnp.einsum("hl,bnld->bnhd", jax.nn.softmax(body_weight, axis=1), body_value)
        body_feat = body_feat.reshape(Bc, T, D)
        if self.dynamic_body:
            # attention over the H part tokens within each frame
            d_in = body_value.reshape(Bc * T, H, L)
            d_mask = jnp.ones((Bc * T, H, 1), x.dtype)
            d_body = EfficientSelfAttention(L, 8, self.dropout, time_embed_dim=None,
                                            merged_lanes=True,
                                            name="body_d_attn")(d_in, src_mask=d_mask,
                                                                train=train)
            body_feat = body_feat + d_body.reshape(Bc, T, D)
        if dedup:
            motion_feat = jnp.concatenate([motion_feat, motion_feat], axis=0)
            body_feat = jnp.concatenate([body_feat, body_feat], axis=0)

        text_cond_type = ((cond_type % 10) > 0).astype(x.dtype)[..., None]  # [B,1,1,1]
        if self.patch_size > 1:
            src_mask = fold_patch_mask(src_mask, self.patch_size)
        src_mask = src_mask.reshape(B, T, 1, 1)

        if _use_stma_kernel(train, self.num_text_heads, L, B * T * H):
            # fused per-(batch, head) kernel over the interleaved layout:
            # no key/value concats, no masked-key / softmax HBM
            # materializations (ops/pallas_stma_attention.py)
            from ..ops.pallas_stma_attention import stma_linear_attention
            y_t = stma_linear_attention(
                motion_feat, text_feat.reshape(B, -1, 2 * L),
                src_mask.reshape(B, T, 1),
                text_cond_type.reshape(B, 1, 1)).reshape(B, T, D)
        else:
            key_text = text_feat[:, :, :, :L] + (1 - text_cond_type) * NEG_INF
            if self.num_text_heads == 1:
                key_text = jnp.broadcast_to(key_text, (B, key_text.shape[1], H, L))
            key_motion = motion_feat[:, :, :, L:2 * L] + (1 - src_mask) * NEG_INF
            key = jnp.concatenate([key_text, key_motion], axis=1)

            value_text = text_feat[:, :, :, L:] * text_cond_type
            if self.num_text_heads == 1:
                value_text = jnp.broadcast_to(value_text, (B, value_text.shape[1], H, L))
            value_motion = motion_feat[:, :, :, 2 * L:3 * L] * src_mask
            value = jnp.concatenate([value_text, value_motion], axis=1)

            query = motion_feat[:, :, :, 3 * L:]
            y_t = linear_attention(query, key, value).reshape(B, T, D)
        y = xh.reshape(B, T, D) + StylizationBlock(D, self.time_embed_dim, self.dropout,
                                                   name="proj_out")(body_feat + y_t, emb,
                                                                    train=train)
        if train:
            self.sow("losses", "aux_loss", text_aux + motion_aux)
        return y


class _IntervalFFN(nn.Module):
    """fine_attention get_ffn (Linear -> GELU -> Linear).  A named nn.Module
    (NOT nn.Sequential: submodules constructed as Sequential ctor args get
    auto-named Dense_N in the PARENT scope, which scrambles checkpoint
    conversion); exact erf GELU as torch nn.GELU()."""

    ffn_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        h = QDense(self.ffn_dim, name="layers_0")(x)
        return QDense(self.out_dim, name="layers_2")(
            nn.gelu(h, approximate=False))


def _interval_ffn(name, latent_dim, ffn_dim, out_dim=None):
    return _IntervalFFN(ffn_dim, out_dim or latent_dim, name=name)


@ATTENTIONS.register_module()
class SAMI(nn.Module):
    """FineMoGen attention (fine_attention.py:62-202): linear-attention
    template + Gaussian time kernel + Taylor expansion (state/vel/acc/jerk)
    with per-interval time offsets."""

    latent_dim: int
    text_latent_dim: int
    num_heads: int
    num_text_heads: int
    num_experts: int
    topk: int
    gate_type: str = "cosine_top"
    gate_noise: float = 1.0
    ffn_dim: int = 512
    time_embed_dim: int = 2048
    max_seq_len: int = 196
    max_text_seq_len: int = 77
    temporal_comb: bool = False
    dropout: float = 0.0
    expert_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, xf=None, emb=None, src_mask=None, cond_type=None,
                 motion_length=None, num_intervals=1, train: bool = False, **kwargs):
        B, T, D = x.shape
        H, L = self.num_heads, self.latent_dim
        NI = num_intervals

        xh = x.reshape(B, T, H, L)
        text_feat = xf.reshape(B, xf.shape[1], self.num_text_heads, -1)
        text_feat, text_aux = MOE(self.num_experts, self.topk, self.text_latent_dim,
                                  self.text_latent_dim * 4, 2 * L, self.num_text_heads,
                                  self.max_text_seq_len, self.gate_type, self.gate_noise,
                                  expert_axis=self.expert_axis, name="text_moe")(
            LayerNorm(name="text_norm")(text_feat).astype(text_feat.dtype), train=train)
        motion_feat, motion_aux = MOE(self.num_experts, self.topk, L, L * 4, 3 * L, H,
                                      self.max_seq_len, self.gate_type, self.gate_noise,
                                      expert_axis=self.expert_axis, name="motion_moe")(
            LayerNorm(name="norm")(xh).astype(xh.dtype), train=train)

        body_weight = self.param("body_weight", nn.initializers.normal(1.0), (H, H))
        body_feat = jnp.einsum("hl,bnld->bnhd", jax.nn.softmax(body_weight, axis=1),
                               motion_feat[:, :, :, :L]).reshape(B, T, D)

        text_cond_type = ((cond_type % 10) > 0).astype(x.dtype)[..., None]
        src_mask4 = src_mask.reshape(B, T, 1, 1)

        key_text = text_feat[:, :, :, :L] + (1 - text_cond_type) * NEG_INF
        if self.num_text_heads == 1:
            key_text = jnp.broadcast_to(key_text, (B, key_text.shape[1], H, L))
        key_motion = motion_feat[:, :, :, L:2 * L] + (1 - src_mask4) * NEG_INF
        key = jax.nn.softmax(jnp.concatenate([key_text, key_motion], axis=1), axis=1)

        value_text = text_feat[:, :, :, L:] * text_cond_type
        if self.num_text_heads == 1:
            value_text = jnp.broadcast_to(value_text, (B, value_text.shape[1], H, L))
        value_motion = motion_feat[:, :, :, 2 * L:] * src_mask4
        value = jnp.concatenate([value_text, value_motion], axis=1)

        # temporal template [B, H, L(d), L(l)]
        template = jnp.einsum("bnhd,bnhl->bhdl", key, value)

        sigma = self.param("sigma", lambda k: jnp.full((1,), 100.0))
        t_sigma = self.param("t_sigma", lambda k: jnp.full((1,), 1.0))
        template_t_feat = _interval_ffn("template_t", L, self.ffn_dim, 1)(template)  # [B,H,L,1]
        template_t = jax.nn.sigmoid(template_t_feat / t_sigma)
        template_t = template_t * motion_length.reshape(B, 1, 1, 1).astype(x.dtype) / self.max_seq_len

        org_t = (jnp.arange(T, dtype=x.dtype) / self.max_seq_len)
        # per-interval cumulative frame offsets (vectorized form of :153-158)
        ml = motion_length.reshape(B // NI, NI).astype(x.dtype)
        offsets = jnp.cumsum(ml, axis=1) - ml  # exclusive cumsum [B//NI, NI]
        t = org_t[None, None, :] + offsets[:, :, None] / self.max_seq_len  # [B//NI, NI, T]
        tt = template_t.reshape(B // NI, NI, H, L) + offsets[:, :, None, None] / self.max_seq_len
        tt = jnp.transpose(tt, (0, 2, 1, 3))  # [B//NI, H, NI, L]
        tt = jnp.broadcast_to(tt[:, None], (B // NI, NI, H, NI, L)).reshape(B, 1, H, NI * L)
        time_delta = (t.reshape(B, T, 1, 1) - tt) * self.max_seq_len  # [B,T,H,NI*L]
        time_coef = jax.nn.softmax(-(time_delta * time_delta) / sigma, axis=-1)

        tmpl = template.reshape(B // NI, NI, H, L, L)
        tmpl = jnp.transpose(tmpl, (0, 2, 1, 3, 4))  # [B//NI, H, NI, L, L]
        tmpl = jnp.broadcast_to(tmpl[:, None], (B // NI, NI, H, NI, L, L)).reshape(B, H, NI * L, L)

        ts_ = _interval_ffn("template_s", L, self.ffn_dim)(tmpl)
        tv_ = _interval_ffn("template_v", L, self.ffn_dim)(tmpl)
        ta_ = _interval_ffn("template_a", L, self.ffn_dim)(tmpl)
        tj_ = _interval_ffn("template_j", L, self.ffn_dim)(tmpl)
        tt1 = tt.reshape(B, H, NI * L, 1)
        a0 = ts_ - tv_ * tt1 + ta_ * tt1 ** 2 - tj_ * tt1 ** 3
        a1 = tv_ - 2 * ta_ * tt1 + 3 * tj_ * tt1 ** 2
        a2 = ta_ - 3 * tj_ * tt1
        a3 = tj_

        mix = lambda templ: jnp.einsum("bnhd,bhdl->bnhl", time_coef, templ).reshape(B, T, D)
        tb = t.reshape(B, T, 1)
        y_t = mix(a0) + mix(a1) * tb + mix(a2) * tb ** 2 + mix(a3) * tb ** 3

        y = xh.reshape(B, T, D) + StylizationBlock(D, self.time_embed_dim, self.dropout,
                                                   name="proj_out")(body_feat + y_t, emb,
                                                                    train=train)
        if train:
            self.sow("losses", "aux_loss", text_aux + motion_aux)
            mu = template_t_feat.squeeze(-1).mean(axis=-1)
            logvar = jnp.log(template_t_feat.squeeze(-1).std(axis=-1) + 1e-12)
            kl = -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar))
            self.sow("losses", "kl_loss", kl)
        return y


@ATTENTIONS.register_module()
class SemanticsModulatedAttention(nn.Module):
    """ReMoDiffuse retrieval-conditioned linear attention
    (semantics_modulated.py:18-85): keys/values from text, retrieved
    (motion, text) pairs, and self-motion; retrieval value path is zero-init."""

    latent_dim: int
    text_latent_dim: int
    num_heads: int
    dropout: float = 0.0
    time_embed_dim: int = 2048

    @nn.compact
    def __call__(self, x, xf=None, emb=None, src_mask=None, cond_type=None,
                 re_dict=None, train: bool = False, **kwargs):
        B, T, D = x.shape
        H = self.num_heads
        re_motion = re_dict["re_motion"]  # [B, R, Tr, D]
        re_text = re_dict["re_text"]      # [B, R, 1, D]
        re_mask = re_dict["re_mask"].reshape(B, -1, 1)
        R, Tr = re_motion.shape[1], re_motion.shape[2]
        N = xf.shape[1] + T + R * Tr

        xn = LayerNorm(name="norm")(x).astype(x.dtype)
        tn = LayerNorm(name="text_norm")(xf).astype(xf.dtype)
        text_cond = ((cond_type % 10) > 0).astype(x.dtype)
        retr_cond = ((cond_type // 10) > 0).astype(x.dtype)

        re_feat_key = jnp.concatenate(
            [re_motion, jnp.broadcast_to(re_text, (B, R, Tr, D))], axis=-1
        ).reshape(B, R * Tr, 2 * D)
        key = jnp.concatenate([
            QDense(D, name="key_text")(tn) + (1 - text_cond) * NEG_INF,
            QDense(D, name="key_retr")(LayerNorm(name="retr_norm1")(re_feat_key).astype(re_feat_key.dtype))
            + (1 - retr_cond) * NEG_INF + (1 - re_mask) * NEG_INF,
            QDense(D, name="key_motion")(xn) + (1 - src_mask) * NEG_INF,
        ], axis=1)
        query = jax.nn.softmax(QDense(D, name="query")(xn).reshape(B, T, H, -1), axis=-1)
        key = jax.nn.softmax(key.reshape(B, N, H, -1), axis=1)

        re_feat_value = re_motion.reshape(B, R * Tr, D)
        from .blocks import ZeroDense
        value = jnp.concatenate([
            QDense(D, name="value_text")(tn) * text_cond,
            ZeroDense(D, name="value_retr")(LayerNorm(name="retr_norm2")(re_feat_value).astype(re_feat_value.dtype))
            * retr_cond * re_mask,
            QDense(D, name="value_motion")(xn) * src_mask,
        ], axis=1).reshape(B, N, H, -1)
        y = linear_attention_core(query, key, value).reshape(B, T, D)
        return x + StylizationBlock(D, self.time_embed_dim, self.dropout,
                                    name="proj_out")(y, emb, train=train)


@ATTENTIONS.register_module()
class DualSemanticsModulatedAttention(nn.Module):
    """Two-person variant (semantics_modulated.py:88-189): each person attends
    to text, retrieval, itself, and the other person, with shared weights."""

    latent_dim: int
    text_latent_dim: int
    num_heads: int
    dropout: float = 0.0
    time_embed_dim: int = 2048

    @nn.compact
    def __call__(self, x, xf=None, emb=None, src_mask=None, cond_type=None,
                 re_dict=None, train: bool = False, **kwargs):
        L = self.latent_dim
        x1, x2 = x[:, :, :L], x[:, :, L:]
        B, T, D = x1.shape
        H = self.num_heads
        re_motion = re_dict["re_motion"]
        re_text = re_dict["re_text"]
        re_mask = re_dict["re_mask"].reshape(B, -1, 1)
        R, Tr = re_motion.shape[1], re_motion.shape[2]
        N = xf.shape[1] + 2 * T + R * Tr

        norm = LayerNorm(name="norm")
        tn = LayerNorm(name="text_norm")(xf).astype(xf.dtype)
        text_cond = ((cond_type % 10) > 0).astype(x.dtype)
        retr_cond = ((cond_type // 10) > 0).astype(x.dtype)

        q_proj = QDense(D, name="query")
        k_text = QDense(D, name="key_text")
        v_text = QDense(D, name="value_text")
        k_motion = QDense(D, name="key_motion")
        v_motion = QDense(D, name="value_motion")
        k_inter = QDense(D, name="key_inter")
        v_inter = QDense(D, name="value_inter")
        k_retr = QDense(D, name="key_retr")
        from .blocks import ZeroDense
        v_retr = ZeroDense(D, name="value_retr")
        retr_n1 = LayerNorm(name="retr_norm1")
        retr_n2 = LayerNorm(name="retr_norm2")
        proj_out = StylizationBlock(D, self.time_embed_dim, self.dropout, name="proj_out")

        n1, n2 = norm(x1), norm(x2)
        re_feat_key = jnp.concatenate(
            [re_motion, jnp.broadcast_to(re_text, (B, R, Tr, D))], axis=-1
        ).reshape(B, R * Tr, 2 * D)
        kt = k_text(tn) + (1 - text_cond) * NEG_INF
        kr = k_retr(retr_n1(re_feat_key)) + (1 - retr_cond) * NEG_INF + (1 - re_mask) * NEG_INF
        vt = v_text(tn) * text_cond
        vr = v_retr(retr_n2(re_motion.reshape(B, R * Tr, D))) * retr_cond * re_mask

        def person(nx, nother):
            key = jnp.concatenate([kt, kr,
                                   k_motion(nx) + (1 - src_mask) * NEG_INF,
                                   k_inter(nother) + (1 - src_mask) * NEG_INF], axis=1)
            value = jnp.concatenate([vt, vr, v_motion(nx) * src_mask,
                                     v_inter(nother) * src_mask], axis=1)
            query = jax.nn.softmax(q_proj(nx).reshape(B, T, H, -1), axis=-1)
            key = jax.nn.softmax(key.reshape(B, N, H, -1), axis=1)
            return linear_attention_core(query, key, value.reshape(B, N, H, -1)
                                         ).reshape(B, T, D)

        y1 = x1 + proj_out(person(n1, n2), emb, train=train)
        y2 = x2 + proj_out(person(n2, n1), emb, train=train)
        return jnp.concatenate([y1, y2], axis=-1)
