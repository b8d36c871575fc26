"""VAE architectures, ACTOR encoder/decoder, and the InterCLIP two-person
evaluator.

Re-implements:
  - PoseVAE / MotionVAE (mogen/models/architectures/vae_architecture.py:7-113)
  - ACTOREncoder/ACTORDecoder (transformers/actor.py) — transformer VAE with
    learned mu/sigma query tokens or per-class/conditional queries
  - InterCLIP (transformers/intergen.py:95-) — InterHuman CLIP-style
    two-person motion/text evaluator
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import LayerNorm

from ..registry import ARCHITECTURES, SUBMODULES, build_loss, build_submodule
from .text_encoder import ClipAttention, PostLNEncoderLayer


def _sin_table(max_len, d):
    pe = np.zeros((max_len, d), np.float32)
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32) * (-np.log(10000.0) / d))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class MLP(nn.Module):
    """build_MLP (mogen/models/utils/mlp.py): Linear/GELU chain + final proj."""

    dim_list: Sequence[int]
    latent_dim: int

    @nn.compact
    def __call__(self, x):
        for i, cur in enumerate(list(self.dim_list)[1:]):
            x = nn.gelu(nn.Dense(cur, name=f"layer_{i}")(x), approximate=False)
        return nn.Dense(self.latent_dim, name="out")(x)


@SUBMODULES.register_module()
class ACTOREncoder(nn.Module):
    """Transformer VAE encoder with learned distribution query tokens
    (actor.py:12-125)."""

    max_seq_len: int = 16
    input_feats: Optional[int] = None
    latent_dim: int = 256
    condition_dim: Optional[int] = None
    num_heads: int = 4
    ff_size: int = 1024
    num_layers: int = 8
    activation: str = "gelu"
    dropout: float = 0.1
    use_condition: bool = False
    num_class: Optional[int] = None
    use_final_proj: bool = False
    output_var: bool = False
    pos_embedding: str = "sinusoidal"
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, motion, motion_mask=None, condition=None, train=False):
        B, T = motion.shape[:2]
        x = nn.Dense(self.latent_dim, name="skelEmbedding")(motion.reshape(B, T, -1))
        n_tok = 2 if self.output_var else 1
        if self.use_condition:
            if self.num_class is None:
                mu_q = MLP((self.condition_dim,), self.latent_dim,
                           name="mu_layer")(condition).reshape(B, 1, -1)
                toks = [mu_q]
                if self.output_var:
                    sig_q = MLP((self.condition_dim,), self.latent_dim,
                                name="sigma_layer")(condition).reshape(B, 1, -1)
                    toks = [mu_q, sig_q]
            else:
                mu_table = self.param("mu_layer", nn.initializers.normal(1.0),
                                      (self.num_class, self.latent_dim))
                toks = [mu_table[condition.astype(jnp.int32).reshape(-1)][:, None]]
                if self.output_var:
                    sig_table = self.param("sigma_layer", nn.initializers.normal(1.0),
                                           (self.num_class, self.latent_dim))
                    toks.append(sig_table[condition.astype(jnp.int32).reshape(-1)][:, None])
            feature = jnp.concatenate(toks + [x], axis=1)
        else:
            query = self.param("query", nn.initializers.normal(1.0),
                               (n_tok, self.latent_dim))
            feature = jnp.concatenate(
                [jnp.broadcast_to(query[None], (B, n_tok, self.latent_dim)), x], axis=1)

        key_mask = jnp.concatenate(
            [jnp.ones((B, n_tok), bool), motion_mask.astype(bool)], axis=1)
        if self.pos_embedding == "sinusoidal":
            feature = feature + jnp.asarray(_sin_table(feature.shape[1],
                                                       self.latent_dim))[None]
        else:
            pe = self.param("pos_embedding", nn.initializers.normal(1.0),
                            (self.max_seq_len + 2, self.latent_dim))
            feature = feature + pe[None, :feature.shape[1]]
        for i in range(self.num_layers):
            feature = PostLNEncoderLayer(self.latent_dim, self.num_heads,
                                         self.ff_size, self.dropout, self.activation,
                                         name=f"layer_{i}")(feature, train=train,
                                                            key_mask=key_mask)
        if self.output_var:
            return feature[:, 0], feature[:, 1]  # mu, logvar tokens
        return feature[:, 0]


@SUBMODULES.register_module()
class ACTORDecoder(nn.Module):
    """Latent -> motion sequence via a transformer decoder over positional
    queries (actor.py:128-209)."""

    max_seq_len: int = 16
    input_feats: Optional[int] = None
    input_dim: int = 256
    latent_dim: int = 256
    condition_dim: Optional[int] = None
    num_heads: int = 4
    ff_size: int = 1024
    num_layers: int = 8
    activation: str = "gelu"
    dropout: float = 0.1
    use_condition: bool = False
    num_class: Optional[int] = None
    pos_embedding: str = "sinusoidal"
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, z, motion_mask=None, condition=None, train=False):
        B = z.shape[0]
        T = self.max_seq_len
        if self.input_dim != self.latent_dim:
            z = nn.Dense(self.latent_dim, name="linear")(z)
        if self.use_condition:
            if self.num_class is None:
                bias = MLP((self.condition_dim,), self.latent_dim,
                           name="condition_bias")(condition)
            else:
                table = self.param("condition_bias", nn.initializers.normal(1.0),
                                   (self.num_class, self.latent_dim))
                bias = table[condition.astype(jnp.int32).reshape(-1)]
            z = z + bias
        query = jnp.broadcast_to(jnp.asarray(_sin_table(T, self.latent_dim))[None],
                                 (B, T, self.latent_dim))
        memory = z.reshape(B, 1, -1)
        x = query
        for i in range(self.num_layers):
            # decoder layer: self-attn over queries + cross-attn to the latent
            sa = ClipAttention(self.latent_dim, self.num_heads,
                               name=f"sa_{i}")(x, key_mask=motion_mask.astype(bool))
            x = LayerNorm(name=f"norm1_{i}")(x + sa)
            q = nn.Dense(self.latent_dim, name=f"ca_q_{i}")(x)
            kv = nn.Dense(2 * self.latent_dim, name=f"ca_kv_{i}")(memory)
            k, v = jnp.split(kv, 2, axis=-1)
            attn = jax.nn.softmax(
                jnp.einsum("bqd,bkd->bqk", q, k) / jnp.sqrt(self.latent_dim), axis=-1)
            ca = jnp.einsum("bqk,bkd->bqd", attn, v)
            x = LayerNorm(name=f"norm2_{i}")(x + ca)
            h = nn.Dense(self.ff_size, name=f"ffn1_{i}")(x)
            h = nn.Dense(self.latent_dim, name=f"ffn2_{i}")(
                nn.gelu(h, approximate=False))
            x = LayerNorm(name=f"norm3_{i}")(x + h)
        return nn.Dense(self.input_feats, name="final")(x)


@ARCHITECTURES.register_module()
class PoseVAE:
    """Per-frame pose VAE (vae_architecture.py:7-51)."""

    def __init__(self, encoder=None, decoder=None, loss_recon=None,
                 kl_div_loss_weight=None, init_cfg=None, **kwargs):
        self.encoder = build_submodule(encoder)
        self.decoder = build_submodule(decoder)
        self.loss_recon = build_loss(loss_recon)
        self.kl_div_loss_weight = kl_div_loss_weight

    def init(self, rng, batch):
        pose = batch["motion"].reshape(-1, batch["motion"].shape[-1])[:, :-4]
        r1, r2 = jax.random.split(rng)
        enc_vars = self.encoder.init(r1, pose, jnp.ones((pose.shape[0], 0)))
        mu, _ = self.encoder.apply(enc_vars, pose, jnp.ones((pose.shape[0], 0)))
        dec_vars = self.decoder.init(r2, mu, jnp.ones((pose.shape[0], 0)))
        return {"encoder": enc_vars, "decoder": dec_vars}

    def loss(self, variables, batch, rng):
        motion = batch["motion"].astype(jnp.float32)
        B, T = motion.shape[:2]
        pose = motion.reshape(B * T, -1)[:, :-4]
        mu, logvar = self.encoder.apply(variables["encoder"], pose,
                                        jnp.ones((B * T, 0)))
        z = mu + jnp.exp(logvar / 2) * jax.random.normal(rng, mu.shape)
        pred = self.decoder.apply(variables["decoder"], z, jnp.ones((B * T, 0)))
        logs = {"recon_loss": self.loss_recon(pred, pose,
                                              reduction_override="mean")}
        if self.kl_div_loss_weight is not None:
            logs["kl_div_loss"] = (-0.5 * jnp.sum(1 + logvar - mu ** 2
                                                  - jnp.exp(logvar))
                                   * self.kl_div_loss_weight)
        total = sum(v for k, v in logs.items() if "loss" in k)
        logs["loss"] = total
        return total, logs


@ARCHITECTURES.register_module()
class MotionVAE(PoseVAE):
    """Sequence-level motion VAE (vae_architecture.py:54-113)."""

    def init(self, rng, batch):
        motion, mask = batch["motion"], batch["motion_mask"]
        r1, r2 = jax.random.split(rng)
        enc_vars = self.encoder.init(r1, motion, mask)
        out = self.encoder.apply(enc_vars, motion, mask)
        mu = out[0] if isinstance(out, tuple) else out
        dec_vars = self.decoder.init(r2, mu, mask)
        return {"encoder": enc_vars, "decoder": dec_vars}

    def loss(self, variables, batch, rng):
        motion = batch["motion"].astype(jnp.float32)
        mask = batch["motion_mask"].astype(jnp.float32)
        mu, logvar = self.encoder.apply(variables["encoder"], motion, mask)
        z = mu + jnp.exp(logvar / 2) * jax.random.normal(rng, mu.shape)
        pred = self.decoder.apply(variables["decoder"], z, mask)
        recon = self.loss_recon(pred, motion, reduction_override="none")
        recon = (recon.mean(-1) * mask).sum() / jnp.maximum(mask.sum(), 1e-8)
        logs = {"recon_loss": recon}
        if self.kl_div_loss_weight is not None:
            logs["kl_div_loss"] = (-0.5 * jnp.sum(1 + logvar - mu ** 2
                                                  - jnp.exp(logvar))
                                   * self.kl_div_loss_weight)
        total = sum(v for k, v in logs.items() if "loss" in k)
        logs["loss"] = total
        return total, logs


class InterMotionEncoderModule(nn.Module):
    """InterGen two-person motion encoder (intergen.py:37-92)."""

    input_dim: int = 258
    latent_dim: int = 1024
    ff_size: int = 2048
    num_layers: int = 8
    num_heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, motion, motion_mask, train=False):
        B, T = motion.shape[:2]
        x = motion.reshape(B, T, 2, -1)[..., :-4].reshape(B, T, -1)
        x = nn.Dense(self.latent_dim, name="embed_motion")(x)
        query = self.param("query_token", nn.initializers.normal(1.0),
                           (1, self.latent_dim))
        emb = jnp.concatenate([jnp.broadcast_to(query[None], (B, 1, self.latent_dim)),
                               x], axis=1)
        emb = emb + jnp.asarray(_sin_table(T + 1, self.latent_dim))[None]
        mask = jnp.concatenate([jnp.ones((B, 1), bool),
                                motion_mask.astype(bool)], axis=1)
        for i in range(self.num_layers):
            emb = PostLNEncoderLayer(self.latent_dim, self.num_heads, self.ff_size,
                                     self.dropout, "gelu", name=f"layer_{i}")(
                emb, train=train, key_mask=mask)
        h = LayerNorm(name="out_ln")(emb)
        return nn.Dense(512, name="out")(h[:, 0])


class InterTextEncoderModule(nn.Module):
    """CLIP ViT-L token embeddings -> trainable text transformer (intergen.py:119-196)."""

    clip_width: int = 768
    ff_size: int = 2048
    num_layers: int = 8
    vocab_size: int = 49408
    context_length: int = 77

    @nn.compact
    def __call__(self, text_ids, train=False):
        tok = nn.Embed(self.vocab_size, self.clip_width, name="token_embedding")(text_ids)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.context_length, self.clip_width))
        x = jax.lax.stop_gradient(tok) + pos[None, :text_ids.shape[1]]
        for i in range(self.num_layers):
            x = PostLNEncoderLayer(self.clip_width, 8, self.ff_size, 0.1,
                                   "gelu", name=f"layer_{i}")(x, train=train)
        x = LayerNorm(name="text_ln")(x)
        eot = jnp.argmax(text_ids, axis=-1)
        return nn.Dense(512, name="out")(x[jnp.arange(x.shape[0]), eot])


@SUBMODULES.register_module()
class InterCLIP:
    """Two-person contrastive evaluator: normalized motion/text embeddings
    scaled by a learned latent_scale (intergen.py:95-214)."""

    def __init__(self, input_dim=258, latent_dim=1024, ff_size=2048,
                 num_layers=8, num_heads=8, dropout=0.1, activation="gelu",
                 init_cfg=None, seed=0):
        self.motion_module = InterMotionEncoderModule(
            input_dim=input_dim, latent_dim=latent_dim, ff_size=ff_size,
            num_layers=num_layers, num_heads=num_heads, dropout=dropout)
        self.text_module = InterTextEncoderModule(ff_size=ff_size)
        key = jax.random.PRNGKey(seed)
        self.motion_params = self.motion_module.init(
            key, jnp.zeros((1, 4, input_dim * 2)), jnp.ones((1, 4)))
        self.text_params = self.text_module.init(key, jnp.zeros((1, 77), jnp.int32))
        self.latent_scale = 1.0
        self._enc_m = jax.jit(lambda p, m, msk: self.motion_module.apply(p, m, msk))
        self._enc_t = jax.jit(lambda p, i: self.text_module.apply(p, i))

    def encode_motion(self, motion, motion_length=None, motion_mask=None, **kw):
        emb = self._enc_m(self.motion_params, jnp.asarray(motion, jnp.float32),
                          jnp.asarray(motion_mask, jnp.float32))
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
        return emb * self.latent_scale

    def encode_text(self, text, token=None, **kw):
        from .tokenizer import tokenize
        ids = jnp.asarray(tokenize(list(text)))
        emb = self._enc_t(self.text_params, ids)
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
        return emb * self.latent_scale
