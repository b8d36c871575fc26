"""Shared denoiser skeleton (reference diffusion_transformer.py:54-238).

All denoiser families share: joint embedding, learned sequence position
embedding, sinusoidal/learned timestep embedding -> SiLU MLP, frozen-CLIP text
conditioning (+optional pooled projection into the time embedding), a stack of
decoder blocks, zero-init output.  Subclasses override ``build_temporal_blocks``
/ ``setup_io`` / ``forward_train`` / ``forward_test``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import ATTENTIONS
from .blocks import FFN, QDense, ZeroDense, timestep_embedding
from .text_encoder import TextEncoder


class GenericDecoderLayer(nn.Module):
    """sa_block -> ca_block -> FFN (reference DecoderLayer :31-51)."""

    sa_block_cfg: Optional[dict] = None
    ca_block_cfg: Optional[dict] = None
    ffn_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, **kwargs):
        if self.sa_block_cfg is not None:
            x = ATTENTIONS.build(self.sa_block_cfg, name="sa_block")(x, **kwargs)
        if self.ca_block_cfg is not None:
            x = ATTENTIONS.build(self.ca_block_cfg, name="ca_block")(x, **kwargs)
        if self.ffn_cfg is not None:
            cfg = {k: v for k, v in dict(self.ffn_cfg).items() if k != "num_heads"}
            x = FFN(**cfg, name="ffn")(x, kwargs["emb"], train=kwargs.get("train", False))
        return x


class DiffusionTransformerBase(nn.Module):
    input_feats: int = 263
    max_seq_len: int = 240
    latent_dim: int = 512
    time_embed_dim: int = 2048
    num_layers: int = 8
    sa_block_cfg: Optional[dict] = None
    ca_block_cfg: Optional[dict] = None
    ffn_cfg: Optional[Any] = None
    text_encoder: Optional[dict] = None
    use_pos_embedding: bool = True
    use_residual_connection: bool = False
    time_embedding_type: str = "sinusoidal"
    post_process_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    # rematerialize decoder blocks in the backward pass (jax.checkpoint):
    # trades ~1 extra forward of FLOPs for O(num_layers) less activation
    # memory — enables reference-recipe batch sizes (64-128) on a 16 GB v5e
    remat: bool = False

    # --------------------------------------------------------------- setup
    def setup(self):
        te = dict(self.text_encoder or {})
        te.pop("pretrained_model", None)
        self.use_text_proj = te.get("use_text_proj", False)
        self.text_enc = TextEncoder(
            latent_dim=te.get("latent_dim", 256), num_layers=te.get("num_layers", 2),
            ff_size=te.get("ff_size", 2048), num_heads=te.get("num_heads", 4),
            dropout=te.get("dropout", 0.0), activation=te.get("activation", "gelu"),
            use_text_proj=self.use_text_proj, time_embed_dim=self.time_embed_dim,
            clip_width=te.get("clip_width", 512), clip_layers=te.get("clip_layers", 12))
        if self.use_pos_embedding:
            self.sequence_embedding = self.param(
                "sequence_embedding", nn.initializers.normal(1.0),
                (self.max_seq_len, self.latent_dim))
        if self.time_embedding_type == "learnable":
            self.time_tokens = nn.Embed(1000, self.latent_dim)
        self.time_embed = nn.Sequential([
            QDense(self.time_embed_dim), nn.silu, QDense(self.time_embed_dim)])
        self.setup_io()
        self.temporal_decoder_blocks = self.build_temporal_blocks()

    def setup_io(self):
        """Default joint embed / zero-init output (overridable)."""
        self.joint_embed = QDense(self.latent_dim)
        self.out = ZeroDense(self.input_feats)

    def build_temporal_blocks(self) -> List[nn.Module]:
        return [GenericDecoderLayer(sa_block_cfg=self.sa_block_cfg,
                                    ca_block_cfg=self.ca_block_cfg,
                                    ffn_cfg=self.ffn_cfg, name=f"block_{i}")
                for i in range(self.num_layers)]

    # ---------------------------------------------------------------- text
    def encode_text(self, text_ids, clip_feat=None, train: bool = False):
        return self.text_enc(text_ids, clip_feat=clip_feat, train=train)

    @property
    def patch(self) -> int:
        return getattr(self, "patch_size", 1)

    def _embed(self, motion, timesteps):
        T = motion.shape[1] // self.patch
        if self.time_embedding_type == "sinusoidal":
            emb = self.time_embed(timestep_embedding(timesteps, self.latent_dim))
        else:
            emb = self.time_embed(self.time_tokens(timesteps))
        h = self.joint_embed(motion)
        if self.use_pos_embedding:
            h = h + self.sequence_embedding[None, :T, :]
        return h, emb

    # ------------------------------------------------------------- forward
    def __call__(self, motion, timesteps, motion_mask=None, motion_length=None,
                 xf_out=None, xf_proj=None, num_intervals: int = 1, cond_type=None,
                 mode: str = "test", train: bool = False, **kwargs):
        src_mask = motion_mask[..., None] if motion_mask.ndim == 2 else motion_mask
        h, emb = self._embed(motion, timesteps)
        # keep the whole stack in the compute dtype: the f32 timestep
        # embedding / f32 motion_mask otherwise promote every residual and
        # masked-key tensor to f32, doubling HBM traffic at bf16 inference
        emb = emb.astype(h.dtype)
        src_mask = src_mask.astype(h.dtype)
        if self.use_text_proj and xf_proj is not None:
            emb = emb + xf_proj
        common = dict(src_mask=src_mask, emb=emb, xf_out=xf_out,
                      motion_length=motion_length, num_intervals=num_intervals,
                      timesteps=timesteps, train=train, **kwargs)
        if mode == "train":
            output = self.forward_train(h=h, cond_type=cond_type, **common)
        else:
            output = self.forward_test(h=h, **common)
        if isinstance(output, tuple):  # step-cached test path: (out, new_cache)
            out, new_cache = output
            if self.use_residual_connection:
                out = motion + out
            return out, new_cache
        if self.use_residual_connection:
            output = motion + output
        return output

    def init_all(self, motion, timesteps, motion_mask, motion_length, text_ids,
                 num_intervals: int = 1, **kwargs):
        enc = self.encode_text(text_ids)
        if self.use_text_proj:
            xf_proj, xf_out = enc
        else:
            xf_proj, xf_out = None, enc
        return self(motion, timesteps, motion_mask=motion_mask,
                    motion_length=motion_length, xf_out=xf_out, xf_proj=xf_proj,
                    num_intervals=num_intervals, mode="test", **kwargs)

    def aux_loss_weights(self) -> Dict[str, float]:
        return {}

    # Subclass hooks ------------------------------------------------------
    def forward_train(self, h=None, src_mask=None, emb=None, xf_out=None, **kwargs):
        B, T = h.shape[:2]
        for block in self.temporal_decoder_blocks:
            h = block(h, xf=xf_out, emb=emb, src_mask=src_mask,
                      cond_type=kwargs.get("cond_type"),
                      motion_length=kwargs.get("motion_length"),
                      num_intervals=kwargs.get("num_intervals", 1),
                      train=kwargs.get("train", False))
        return self.out(h).reshape(B, T, -1)

    def forward_test(self, h=None, src_mask=None, emb=None, xf_out=None, **kwargs):
        B, T = h.shape[:2]
        for block in self.temporal_decoder_blocks:
            h = block(h, xf=xf_out, emb=emb, src_mask=src_mask,
                      cond_type=None, motion_length=kwargs.get("motion_length"),
                      num_intervals=kwargs.get("num_intervals", 1), train=False)
        return self.out(h).reshape(B, T, -1)
