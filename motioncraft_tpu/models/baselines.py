"""Baseline denoiser families: MotionDiffuse, MCM, MDM, FineMoGen,
ReMoDiffuse, MoMatMoGen.

Each is a thin layer configuration over the shared DiffusionTransformerBase
skeleton, mirroring the reference model zoo
(/root/reference/mogen/models/transformers/{motiondiffuse,mcm,mdm,finemogen,
remodiffuse,momatmogen}.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..registry import ATTENTIONS, SUBMODULES
from .blocks import FFN, QDense, ZeroDense, timestep_embedding
from .diffusion_transformer import DiffusionTransformerBase, GenericDecoderLayer
from .stmogen import STMoGenTransformer
from .text_encoder import ClipTextModel, PostLNEncoderLayer


@SUBMODULES.register_module()
class MotionDiffuseTransformer(DiffusionTransformerBase):
    """Plain sa/ca/FFN decoder stack (motiondiffuse.py:8-60); configs use the
    Efficient* linear attentions and use_text_proj=True."""
    # base defaults are exactly right; forward_train == forward_test
    pass


class MCMDecoderLayer(nn.Module):
    """Channel-attention layer (mcm.py:12-41): self-attention transposed over
    the channel axis, dual FFNs, text cross-attention."""

    sa_block_cfg: Optional[dict] = None
    ca_block_cfg: Optional[dict] = None
    ffn_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, xf=None, emb=None, src_mask=None, cond_type=None,
                 train: bool = False, **kwargs):
        B, T, D = x.shape
        if self.sa_block_cfg is not None:
            # attend across channels: tokens = feature dims, mask = all-ones
            xt = jnp.swapaxes(x, -1, -2)  # [B, D, T]
            chan_mask = jnp.ones((B, D, 1), x.dtype)
            xt = ATTENTIONS.build(self.sa_block_cfg, name="sa_block")(
                xt, src_mask=chan_mask, emb=emb, train=train)
            x = jnp.swapaxes(xt, -1, -2)
        ffn_cfg = {k: v for k, v in dict(self.ffn_cfg or {}).items() if k != "num_heads"}
        if self.ffn_cfg is not None:
            x = FFN(**ffn_cfg, name="ffn_channel")(x, emb, train=train)
        if self.ca_block_cfg is not None:
            x = ATTENTIONS.build(self.ca_block_cfg, name="ca_block")(
                x, xf=xf, emb=emb, src_mask=src_mask, cond_type=cond_type, train=train)
        if self.ffn_cfg is not None:
            x = FFN(**ffn_cfg, name="ffn_temporal")(x, emb, train=train)
        return x


@SUBMODULES.register_module()
class MCMTransformer(DiffusionTransformerBase):
    """MCM baseline (mcm.py:44-): channel-attention decoder layers."""

    def build_temporal_blocks(self):
        return [MCMDecoderLayer(sa_block_cfg=self.sa_block_cfg,
                                ca_block_cfg=self.ca_block_cfg,
                                ffn_cfg=self.ffn_cfg, name=f"block_{i}")
                for i in range(self.num_layers)]


@SUBMODULES.register_module()
class FineMoGenTransformer(STMoGenTransformer):
    """FineMoGen (finemogen.py:342-473): SAMI attention + SFFN over body-part
    tokens — structurally identical to STMoGen with ca_block_cfg type SAMI and
    patch_size=1, so it shares the implementation."""
    pass


@SUBMODULES.register_module()
class MDMTransformer(nn.Module):
    """MDM port (mdm.py:35-227): pooled-CLIP conditioning token prepended to a
    vanilla post-LN transformer encoder; CFG with fixed guide_scale by running
    the conditional and unconditional passes as one doubled batch."""

    input_feats: int = 263
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    clip_dim: int = 512
    clip_version: Optional[str] = None
    guide_scale: float = 1.0
    cond_mask_prob: float = 0.1
    use_official_ckpt: bool = False
    clip_layers: int = 12
    post_process_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None

    def setup(self):
        self.poseEmbedding = QDense(self.latent_dim)
        self.layers = [PostLNEncoderLayer(self.latent_dim, self.num_heads,
                                          self.ff_size, self.dropout, self.activation,
                                          name=f"layer_{i}")
                       for i in range(self.num_layers)]
        self.time_embed = nn.Sequential([
            QDense(self.latent_dim), nn.silu, QDense(self.latent_dim)])
        self.embed_text = QDense(self.latent_dim)
        self.poseFinal = QDense(self.input_feats)
        self.clip = ClipTextModel(width=self.clip_dim, layers=self.clip_layers,
                                  heads=max(1, self.clip_dim // 64),
                                  embed_dim=self.clip_dim)

    def encode_text(self, text_ids, clip_feat=None, train: bool = False):
        """Pooled CLIP text feature (mdm.py:111-126), frozen."""
        if clip_feat is not None:
            return jax.lax.stop_gradient(clip_feat)
        return jax.lax.stop_gradient(self.clip(text_ids, return_pooled=True))

    def init_all(self, motion, timesteps, motion_mask, motion_length, text_ids,
                 **kwargs):
        xf_out = self.encode_text(text_ids)
        return self(motion, timesteps, motion_mask=motion_mask,
                    motion_length=motion_length, xf_out=xf_out, mode="test")

    def _positional(self, T):
        pe = np.zeros((T, self.latent_dim), np.float32)
        pos = np.arange(T, dtype=np.float32)[:, None]
        div = np.exp(np.arange(0, self.latent_dim, 2, dtype=np.float32)
                     * (-np.log(10000.0) / self.latent_dim))
        pe[:, 0::2] = np.sin(pos * div)
        pe[:, 1::2] = np.cos(pos * div)
        return jnp.asarray(pe)

    def _trunk(self, motion, timesteps, text_emb, train):
        B, T, _ = motion.shape
        h = self.poseEmbedding(motion)
        pe = self._positional(T + 1)
        # timestep embedding indexes the sinusoidal PE table (TimestepEmbedder)
        t_emb = self.time_embed(jnp.take(self._positional(1000), timesteps, axis=0))
        cond = (t_emb + self.embed_text(text_emb))[:, None, :]  # [B, 1, D]
        xseq = jnp.concatenate([cond, h], axis=1) + pe[None]
        for layer in self.layers:
            xseq = layer(xseq, train=train)
        return self.poseFinal(xseq[:, 1:])

    def __call__(self, motion, timesteps, motion_mask=None, motion_length=None,
                 xf_out=None, cond_type=None, mode: str = "test",
                 train: bool = False, **kwargs):
        text_emb = xf_out  # pooled [B, clip_dim]
        if mode == "train":
            if cond_type is not None:
                # cond_type%10==0 -> unconditional (drop text)
                keep = ((cond_type.reshape(-1, 1) % 10) > 0).astype(text_emb.dtype)
                text_emb = text_emb * keep
            return self._trunk(motion, timesteps, text_emb, train)
        out_uncond = self._trunk(motion, timesteps, jnp.zeros_like(text_emb), False)
        out_text = self._trunk(motion, timesteps, text_emb, False)
        return out_uncond + self.guide_scale * (out_text - out_uncond)

    def post_process(self, motion):
        if self.use_official_ckpt:
            motion = motion.at[:, :, :4].multiply(25.0)
        return motion

    def aux_loss_weights(self):
        return {}


class RetrievalDatabase:
    """Host-side retrieval bank (remodiffuse.py:46-201): CLIP text feature +
    kinematic-length rerank over a precomputed .npz of (text_features,
    captions, motions, m_lengths, clip_seq_features); results cached by
    caption hash.  The motion/text re-encoders are flax modules applied by
    the transformer on device."""

    def __init__(self, num_retrieval=None, topk=None, retrieval_file=None,
                 latent_dim=512, output_dim=512, num_layers=2, num_motion_layers=4,
                 kinematic_coef=0.1, max_seq_len=196, num_heads=8, ff_size=1024,
                 stride=4, sa_block_cfg=None, ffn_cfg=None, dropout=0):
        data = np.load(retrieval_file)
        self.text_features = np.asarray(data["text_features"])
        self.captions = data["captions"]
        self.motions = np.asarray(data["motions"])
        self.m_lengths = np.asarray(data["m_lengths"])
        self.clip_seq_features = np.asarray(data["clip_seq_features"])
        self.num_retrieval = num_retrieval
        self.kinematic_coef = kinematic_coef
        self.stride = stride
        self.results: Dict[int, List[int]] = {}

    def retrieve(self, caption_feature: np.ndarray, length: int, caption: str,
                 training: bool = False) -> List[int]:
        key = hash(caption)
        if key in self.results:
            return self.results[key]
        rel = np.abs(self.m_lengths - length)
        rel = rel / np.maximum(rel, length)
        tf = self.text_features / (np.linalg.norm(self.text_features, axis=-1,
                                                  keepdims=True) + 1e-12)
        cf = caption_feature / (np.linalg.norm(caption_feature) + 1e-12)
        score = (tf @ cf) * np.exp(-rel * self.kinematic_coef)
        order = np.argsort(-score)
        picked = []
        for idx in order:
            if not training or self.m_lengths[idx] != length:
                picked.append(int(idx))
                if len(picked) == self.num_retrieval:
                    break
        self.results[key] = picked
        return picked

    def gather(self, indexes: List[int], B: int):
        """Raw retrieved motions/text features for the on-device re-encoders."""
        idx = np.asarray(indexes)
        motions = self.motions[idx]
        lengths = self.m_lengths[idx]
        T = motions.shape[1]
        mask = (np.arange(T)[None] < lengths[:, None]).astype(np.float32)
        return (motions.astype(np.float32), mask,
                self.clip_seq_features[idx].astype(np.float32))


class RetrievalEncoder(nn.Module):
    """On-device re-encoders for retrieved motion/text (remodiffuse.py:84-201)."""

    latent_dim: int = 512
    num_motion_layers: int = 4
    num_text_layers: int = 2
    num_heads: int = 8
    ff_size: int = 1024
    max_seq_len: int = 196
    stride: int = 4
    motion_feats: int = 263
    sa_block_cfg: Optional[dict] = None
    ffn_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, motions, mask, clip_seq_features, num_retrieval: int):
        BR, T, _ = motions.shape
        B = BR // num_retrieval
        pos = self.param("motion_pos_embedding", nn.initializers.normal(1.0),
                         (self.max_seq_len, self.latent_dim))
        re_motion = QDense(self.latent_dim, name="motion_proj")(motions) + pos[None, :T]
        for i in range(self.num_motion_layers):
            re_motion = ATTENTIONS.build(self.sa_block_cfg, name=f"motion_sa_{i}")(
                re_motion, src_mask=mask[..., None])
            ffn_cfg = {k: v for k, v in dict(self.ffn_cfg or {}).items()
                       if k not in ("num_heads", "time_embed_dim")}
            h = QDense(ffn_cfg.get("ffn_dim", 1024), name=f"motion_ffn1_{i}")(re_motion)
            re_motion = re_motion + ZeroDense(self.latent_dim, name=f"motion_ffn2_{i}")(
                nn.gelu(h, approximate=False))
        re_motion = re_motion.reshape(B, num_retrieval, T, -1)[:, :, ::self.stride]
        re_mask = mask[:, ::self.stride].reshape(B, num_retrieval, -1)

        txt = clip_seq_features
        for i in range(self.num_text_layers):
            txt = PostLNEncoderLayer(self.latent_dim, self.num_heads, self.ff_size,
                                     0.0, "gelu", name=f"text_layer_{i}")(txt)
        re_text = txt.reshape(B, num_retrieval, txt.shape[1], -1)[:, :, -1:, :]
        return dict(re_motion=re_motion, re_text=re_text, re_mask=re_mask)


@SUBMODULES.register_module()
class ReMoDiffuseTransformer(DiffusionTransformerBase):
    """Retrieval-augmented denoiser (remodiffuse.py:202-341) with 4-way CFG
    over (both, text-only, retrieval-only, none)."""

    retrieval_cfg: Optional[dict] = None
    scale_func_cfg: Optional[dict] = None

    def setup(self):
        super().setup()
        rc = dict(self.retrieval_cfg or {})
        self.retrieval_encoder = RetrievalEncoder(
            latent_dim=rc.get("latent_dim", 512),
            num_motion_layers=rc.get("num_motion_layers", 4),
            num_text_layers=rc.get("num_layers", 2),
            num_heads=rc.get("num_heads", 8), ff_size=rc.get("ff_size", 1024),
            max_seq_len=rc.get("max_seq_len", 196), stride=rc.get("stride", 4),
            sa_block_cfg=rc.get("sa_block_cfg"), ffn_cfg=rc.get("ffn_cfg"))

    def encode_retrieval(self, motions, mask, clip_seq_features, num_retrieval):
        return self.retrieval_encoder(motions, mask, clip_seq_features, num_retrieval)

    def scale_func(self, timestep, rng_seed: int = 0):
        """4-way CFG coefficients (remodiffuse.py:208-238).  The reference
        flips a python coin per step for t > 100; here the coin is a
        deterministic hash of the timestep (traced-safe, same marginals)."""
        cfg = self.scale_func_cfg or {}
        coarse = cfg.get("coarse_scale", 4.0)
        w = (1 - (1000 - timestep.astype(jnp.float32)) / 1000) * coarse + 1
        coin = jax.random.bernoulli(jax.random.fold_in(jax.random.PRNGKey(rng_seed),
                                                       timestep.astype(jnp.int32)))
        late = timestep > 100
        both = jnp.where(late, jnp.where(coin, w, 0.0), cfg.get("both_coef", 0.5))
        text = jnp.where(late, jnp.where(coin, 0.0, w), cfg.get("text_coef", 0.25))
        retr = jnp.where(late, jnp.where(coin, 1 - w, 0.0), cfg.get("retr_coef", 0.15))
        none = jnp.where(late, jnp.where(coin, 0.0, 1 - w),
                         1 - cfg.get("both_coef", 0.5) - cfg.get("text_coef", 0.25)
                         - cfg.get("retr_coef", 0.15))
        return both, text, retr, none

    def forward_train(self, h=None, src_mask=None, emb=None, xf_out=None,
                      cond_type=None, re_dict=None, train=False, **kwargs):
        B, T = h.shape[:2]
        for block in self.temporal_decoder_blocks:
            h = block(h, xf=xf_out, emb=emb, src_mask=src_mask, cond_type=cond_type,
                      re_dict=re_dict, train=train)
        return self.out(h).reshape(B, T, -1)

    def forward_test(self, h=None, src_mask=None, emb=None, xf_out=None,
                     re_dict=None, timesteps=None, **kwargs):
        B, T = h.shape[:2]
        cond = jnp.concatenate([jnp.full((B, 1, 1), 99), jnp.full((B, 1, 1), 1),
                                jnp.full((B, 1, 1), 10), jnp.zeros((B, 1, 1))], axis=0)
        rep = lambda a, n=4: jnp.concatenate([a] * n, axis=0)
        h4, xf4, emb4, mask4 = rep(h), rep(xf_out), rep(emb), rep(src_mask)
        re4 = {k: rep(v) for k, v in re_dict.items()}
        for block in self.temporal_decoder_blocks:
            h4 = block(h4, xf=xf4, emb=emb4, src_mask=mask4, cond_type=cond,
                       re_dict=re4, train=False)
        out = self.out(h4).reshape(4 * B, T, -1)
        both_c, text_c, retr_c, none_c = self.scale_func(timesteps[0])
        return (out[:B] * both_c + out[B:2 * B] * text_c
                + out[2 * B:3 * B] * retr_c + out[3 * B:] * none_c)


class DualFFN(nn.Module):
    """Shared-weight FFN applied to each person's half (momatmogen.py:13-31)."""

    latent_dim: int
    ffn_dim: int
    dropout: float = 0.0
    time_embed_dim: int = 2048

    @nn.compact
    def __call__(self, x, emb, train: bool = False, **kwargs):
        L = self.latent_dim
        ffn = FFN(L, self.ffn_dim, self.dropout, self.time_embed_dim, name="ffn")
        return jnp.concatenate([ffn(x[:, :, :L], emb, train=train),
                                ffn(x[:, :, L:], emb, train=train)], axis=-1)


class MoMatDecoderLayer(nn.Module):
    ca_block_cfg: Optional[dict] = None
    ffn_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, **kwargs):
        if self.ca_block_cfg is not None:
            x = ATTENTIONS.build(self.ca_block_cfg, name="ca_block")(x, **kwargs)
        if self.ffn_cfg is not None:
            cfg = {k: v for k, v in dict(self.ffn_cfg).items() if k != "num_heads"}
            x = DualFFN(**cfg, name="ffn")(x, kwargs["emb"],
                                           train=kwargs.get("train", False))
        return x


@SUBMODULES.register_module()
class MoMatMoGenTransformer(ReMoDiffuseTransformer):
    """Two-person retrieval-augmented variant (momatmogen.py:50-):
    shared joint embed / output head applied per person, dual attention."""

    def build_temporal_blocks(self):
        return [MoMatDecoderLayer(ca_block_cfg=self.ca_block_cfg,
                                  ffn_cfg=self.ffn_cfg, name=f"block_{i}")
                for i in range(self.num_layers)]

    def _embed(self, motion, timesteps):
        T = motion.shape[1]
        emb = self.time_embed(timestep_embedding(timesteps, self.latent_dim))
        m1, m2 = motion[:, :, :self.input_feats], motion[:, :, self.input_feats:]
        h1, h2 = self.joint_embed(m1), self.joint_embed(m2)
        if self.use_pos_embedding:
            h1 = h1 + self.sequence_embedding[None, :T, :]
            h2 = h2 + self.sequence_embedding[None, :T, :]
        return jnp.concatenate([h1, h2], axis=-1), emb

    def _out_dual(self, h, B, T):
        L = self.latent_dim
        return jnp.concatenate([self.out(h[:, :, :L]).reshape(B, T, -1),
                                self.out(h[:, :, L:]).reshape(B, T, -1)], axis=-1)

    def forward_train(self, h=None, src_mask=None, emb=None, xf_out=None,
                      cond_type=None, re_dict=None, train=False, **kwargs):
        B, T = h.shape[:2]
        for block in self.temporal_decoder_blocks:
            h = block(h, xf=xf_out, emb=emb, src_mask=src_mask, cond_type=cond_type,
                      re_dict=re_dict, train=train)
        return self._out_dual(h, B, T)

    def forward_test(self, h=None, src_mask=None, emb=None, xf_out=None,
                     re_dict=None, timesteps=None, **kwargs):
        B, T = h.shape[:2]
        cond = jnp.concatenate([jnp.full((B, 1, 1), 99), jnp.full((B, 1, 1), 1),
                                jnp.full((B, 1, 1), 10), jnp.zeros((B, 1, 1))], axis=0)
        rep = lambda a: jnp.concatenate([a] * 4, axis=0)
        h4, xf4, emb4, mask4 = rep(h), rep(xf_out), rep(emb), rep(src_mask)
        re4 = {k: rep(v) for k, v in re_dict.items()}
        for block in self.temporal_decoder_blocks:
            h4 = block(h4, xf=xf4, emb=emb4, src_mask=mask4, cond_type=cond,
                       re_dict=re4, train=False)
        out = self._out_dual(h4, 4 * B, T)
        both_c, text_c, retr_c, none_c = self.scale_func(timesteps[0])
        return (out[:B] * both_c + out[B:2 * B] * text_c
                + out[2 * B:3 * B] * retr_c + out[3 * B:] * none_c)
