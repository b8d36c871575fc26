"""End-to-end MCM checkpoint-conversion parity.

Independent torch re-statement of the reference MCMTransformer eval forward
(/root/reference/mogen/models/transformers/mcm.py:12-110 +
attentions/efficient_attention.py:9-92 + diffusion_transformer.py:15-238):
channel-transposed Efficient self-attention, dual FFNs, text cross-attention,
use_text_proj pooled conditioning added to the timestep embedding.  A
fabricated checkpoint loads strict into the re-statement AND through
``convert_mcm``; outputs must agree <= 1e-4.
"""

import math
import os
import sys

import jax
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import motioncraft_tpu.models  # noqa: F401
from motioncraft_tpu.models.tokenizer import tokenize
from motioncraft_tpu.registry import build_architecture
from motioncraft_tpu.utils.torch_convert import _tree_update, convert_mcm

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import fabricate_torch as fab  # noqa: E402
from test_stmogen_forward_parity import (TClip, TStylization,  # noqa: E402
                                         t_timestep_embedding)

pytestmark = pytest.mark.parity

torch.set_grad_enabled(False)


class TEffSelf(nn.Module):
    """efficient_attention.py:9-46 WITH the StylizationBlock output."""

    def __init__(self, latent_dim, num_heads, time_embed_dim):
        super().__init__()
        self.num_heads = num_heads
        self.norm = nn.LayerNorm(latent_dim)
        self.query = nn.Linear(latent_dim, latent_dim)
        self.key = nn.Linear(latent_dim, latent_dim)
        self.value = nn.Linear(latent_dim, latent_dim)
        self.proj_out = TStylization(latent_dim, time_embed_dim)

    def forward(self, x, src_mask, emb):
        B, T, D = x.shape
        H = self.num_heads
        query = F.softmax(self.query(self.norm(x)).view(B, T, H, -1), dim=-1)
        key = F.softmax((self.key(self.norm(x))
                         + (1 - src_mask) * -1000000).view(B, T, H, -1), dim=1)
        value = (self.value(self.norm(x)) * src_mask).view(B, T, H, -1)
        attention = torch.einsum("bnhd,bnhl->bhdl", key, value)
        y = torch.einsum("bnhd,bhdl->bnhl", query, attention).reshape(B, T, D)
        return x + self.proj_out(y, emb)


class TEffCross(nn.Module):
    """efficient_attention.py:49-92, cond_type=None branch (MCM eval)."""

    def __init__(self, latent_dim, text_latent_dim, num_heads, time_embed_dim):
        super().__init__()
        self.num_heads = num_heads
        self.norm = nn.LayerNorm(latent_dim)
        self.text_norm = nn.LayerNorm(text_latent_dim)
        self.query = nn.Linear(latent_dim, latent_dim)
        self.key = nn.Linear(text_latent_dim, latent_dim)
        self.value = nn.Linear(text_latent_dim, latent_dim)
        self.proj_out = TStylization(latent_dim, time_embed_dim)

    def forward(self, x, xf, emb):
        B, T, D = x.shape
        N = xf.shape[1]
        H = self.num_heads
        query = F.softmax(self.query(self.norm(x)).view(B, T, H, -1), dim=-1)
        key = F.softmax(self.key(self.text_norm(xf)).view(B, N, H, -1), dim=1)
        value = self.value(self.text_norm(xf)).view(B, N, H, -1)
        attention = torch.einsum("bnhd,bnhl->bhdl", key, value)
        y = torch.einsum("bnhd,bhdl->bnhl", query, attention).reshape(B, T, D)
        return x + self.proj_out(y, emb)


class TFFN(nn.Module):
    """diffusion_transformer.py:15-28."""

    def __init__(self, latent_dim, ffn_dim, time_embed_dim):
        super().__init__()
        self.linear1 = nn.Linear(latent_dim, ffn_dim)
        self.linear2 = nn.Linear(ffn_dim, latent_dim)
        self.proj_out = TStylization(latent_dim, time_embed_dim)

    def forward(self, x, emb):
        y = self.linear2(F.gelu(self.linear1(x)))
        return x + self.proj_out(y, emb)


class TMCMLayer(nn.Module):
    """mcm.py:12-41: channel sa -> ffn_channel -> text ca -> ffn_temporal."""

    def __init__(self, m):
        super().__init__()
        sa, ca, ffn = m["sa_block_cfg"], m["ca_block_cfg"], m["ffn_cfg"]
        self.sa_block = TEffSelf(sa["latent_dim"], sa["num_heads"],
                                 sa["time_embed_dim"])
        self.ca_block = TEffCross(ca["latent_dim"], ca["text_latent_dim"],
                                  ca["num_heads"], ca["time_embed_dim"])
        self.ffn_channel = TFFN(ffn["latent_dim"], ffn["ffn_dim"],
                                ffn["time_embed_dim"])
        self.ffn_temporal = TFFN(ffn["latent_dim"], ffn["ffn_dim"],
                                 ffn["time_embed_dim"])

    def forward(self, x, xf, emb):
        B, T, D = x.shape
        chan_mask = torch.ones(B, D, T)
        x = self.sa_block(x.transpose(-1, -2), chan_mask, emb).transpose(-1, -2)
        x = self.ffn_channel(x, emb)
        x = self.ca_block(x, xf, emb)
        return self.ffn_temporal(x, emb)


class TMCM(nn.Module):
    """MCMTransformer eval forward (mcm.py:44-110 over the
    DiffusionTransformer skeleton, use_text_proj=True)."""

    def __init__(self, m):
        super().__init__()
        te = m["text_encoder"]
        L = m["latent_dim"]
        self.latent_dim = L
        self.sequence_embedding = nn.Parameter(
            torch.zeros(m["max_seq_len"], L))
        self.joint_embed = nn.Linear(m["input_feats"], L)
        self.out = nn.Linear(L, m["input_feats"])
        self.time_embed = nn.Sequential(
            nn.Linear(L, m["time_embed_dim"]), nn.SiLU(),
            nn.Linear(m["time_embed_dim"], m["time_embed_dim"]))
        self.temporal_decoder_blocks = nn.ModuleList(
            TMCMLayer(m) for _ in range(m["num_layers"]))
        self.clip = TClip(te["clip_width"], te["clip_layers"])
        self.text_pre_proj = nn.Linear(te["clip_width"], te["latent_dim"])
        enc_layer = nn.TransformerEncoderLayer(
            d_model=te["latent_dim"], nhead=te.get("num_heads", 4),
            dim_feedforward=te["ff_size"], dropout=0.0, activation="gelu")
        self.textTransEncoder = nn.TransformerEncoder(
            enc_layer, num_layers=te["num_layers"])
        self.text_ln = nn.LayerNorm(te["latent_dim"])
        self.text_proj = nn.Sequential(
            nn.Linear(te["latent_dim"], m["time_embed_dim"]))

    def encode_text(self, text_ids):
        """diffusion_transformer.py:147-172 with use_text_proj."""
        T = text_ids.shape[1]
        x = self.clip.token_embedding(text_ids)
        x = x + self.clip.positional_embedding[:T]
        x = x.permute(1, 0, 2)
        mask = torch.full((T, T), float("-inf")).triu(1)
        x = self.clip.transformer(x, mask)
        x = self.clip.ln_final(x)
        x = self.text_pre_proj(x)
        x = self.textTransEncoder(x)
        x = self.text_ln(x)  # [T, B, P]
        eot = text_ids.argmax(dim=-1)
        xf_proj = self.text_proj(x[eot, torch.arange(x.shape[1])])
        return xf_proj, x.permute(1, 0, 2)

    def forward_test(self, motion, timesteps, motion_mask, xf_proj, xf_out):
        B, T, _ = motion.shape
        src_mask = motion_mask.unsqueeze(-1)
        emb = self.time_embed(t_timestep_embedding(timesteps, self.latent_dim))
        emb = emb + xf_proj
        h = self.joint_embed(motion) + self.sequence_embedding[None, :T]
        for blk in self.temporal_decoder_blocks:
            h = blk(h, xf_out, emb)
        return self.out(h)


def test_mcm_full_forward_parity():
    import flax

    m = dict(type="MCMTransformer", input_feats=32, max_seq_len=16,
             latent_dim=24, time_embed_dim=32, num_layers=2,
             sa_block_cfg=dict(type="EfficientSelfAttention", latent_dim=16,
                               num_heads=4, dropout=0, time_embed_dim=32),
             ca_block_cfg=dict(type="EfficientCrossAttention", latent_dim=24,
                               text_latent_dim=16, num_heads=4, dropout=0,
                               time_embed_dim=32),
             ffn_cfg=dict(latent_dim=24, ffn_dim=48, dropout=0,
                          time_embed_dim=32),
             text_encoder=dict(pretrained_model="clip", latent_dim=16,
                               num_layers=2, num_heads=4, ff_size=32,
                               dropout=0, use_text_proj=True, clip_width=32,
                               clip_layers=1))
    cfg = dict(type="MotionDiffusion", model=m,
               loss_recon=dict(type="MSELoss", loss_weight=1, reduction="none"),
               diffusion_train=dict(beta_scheduler="linear",
                                    diffusion_steps=1000,
                                    model_mean_type="epsilon",
                                    model_var_type="fixed_small"),
               diffusion_test=dict(beta_scheduler="linear",
                                   diffusion_steps=1000,
                                   model_mean_type="epsilon",
                                   model_var_type="fixed_small"),
               inference_type="ddpm")
    # NOTE: the channel sa_block's latent_dim must equal T for the transposed
    # attention; reference configs use latent_dim=196=T — here 16
    m["sa_block_cfg"]["latent_dim"] = 16
    arch = build_architecture(cfg)
    B, T = 2, 16
    rng = np.random.RandomState(9)
    batch = {"motion": rng.randn(B, T, 32).astype(np.float32),
             "motion_mask": np.ones((B, T), np.float32),
             "motion_length": np.full((B, 1), T, np.int32),
             "text_ids": np.asarray(tokenize(["a person dances",
                                              "someone claps softly"]))}
    variables = flax.core.unfreeze(arch.init(jax.random.PRNGKey(0), batch))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    sd = fab.mcm_sd(params, np.random.RandomState(2), m["num_layers"],
                    m["text_encoder"]["num_layers"],
                    m["text_encoder"]["clip_layers"])
    sd = {k: (v * (1.0 / np.sqrt(max(v.shape[-1], 4)))).astype(np.float32)
          for k, v in sd.items()}

    tree = convert_mcm({"model." + k: v for k, v in sd.items()},
                       m["num_layers"], m["text_encoder"]["num_layers"],
                       m["text_encoder"]["clip_layers"])
    _tree_update(params, tree)
    variables["params"] = params
    enc = arch.model.apply(variables, batch["text_ids"], method="encode_text")
    xf_proj_flax, xf_flax = enc
    timesteps = np.full((B,), 321, np.int32)
    # jit (persistent-cached): the eager flax apply dominates test wall-clock
    out_flax = np.asarray(jax.jit(
        lambda v, m_, t_, mask, ml, xf_, xp: arch.model.apply(
            v, m_, t_, motion_mask=mask, motion_length=ml, xf_out=xf_,
            xf_proj=xp, mode="test"))(
        variables, batch["motion"], timesteps, batch["motion_mask"],
        batch["motion_length"], xf_flax, xf_proj_flax))

    model = TMCM(m).eval()
    model.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()}, strict=True)
    ids = torch.from_numpy(np.asarray(batch["text_ids"], np.int64))
    xf_proj_t, xf_t = model.encode_text(ids)
    np.testing.assert_allclose(np.asarray(xf_flax), xf_t.numpy(), atol=1e-5,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(xf_proj_flax), xf_proj_t.numpy(),
                               atol=1e-5, rtol=1e-3)
    out_torch = model.forward_test(
        torch.from_numpy(batch["motion"]),
        torch.from_numpy(timesteps.astype(np.int64)),
        torch.from_numpy(batch["motion_mask"]), xf_proj_t, xf_t).numpy()
    scale = max(1.0, float(np.abs(out_torch).max()))
    assert float(np.abs(out_flax - out_torch).max()) < 1e-4 * scale
