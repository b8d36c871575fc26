"""End-to-end MDM checkpoint-conversion parity.

Independent torch re-statement of the reference MDMTransformer eval forward
(/root/reference/mogen/models/transformers/mdm.py:35-227): pooled frozen-CLIP
text feature, sinusoidal-PE-table timestep embedding through the
TimestepEmbedder MLP, conditioning token prepended to a vanilla
TransformerEncoder, guide-scale CFG from separate uncond/text passes.  A
fabricated checkpoint in the mogen layout (clip under ``clip_model.*``) loads
strict into the re-statement AND through ``convert_mdm``; outputs must agree.
"""

import math
import os
import sys

import jax
import numpy as np
import pytest
import torch
import torch.nn as nn

import motioncraft_tpu.models  # noqa: F401
from motioncraft_tpu.models.tokenizer import tokenize
from motioncraft_tpu.registry import build_architecture
from motioncraft_tpu.utils.torch_convert import _tree_update, convert_mdm

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import fabricate_torch as fab  # noqa: E402
from test_stmogen_forward_parity import TClip  # noqa: E402

pytestmark = pytest.mark.parity

torch.set_grad_enabled(False)


class TPositionalEncoding(nn.Module):
    """mdm.py:188-207: interleaved sin/cos table, [T, 1, D] buffer."""

    def __init__(self, d_model, max_len=5000):
        super().__init__()
        pe = torch.zeros(max_len, d_model)
        position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
        div = torch.exp(torch.arange(0, d_model, 2).float()
                        * (-math.log(10000.0) / d_model))
        pe[:, 0::2] = torch.sin(position * div)
        pe[:, 1::2] = torch.cos(position * div)
        # persistent=False: checkpoints don't carry the PE table
        self.register_buffer("pe", pe.unsqueeze(0).transpose(0, 1),
                             persistent=False)

    def forward(self, x):
        return x + self.pe[: x.shape[0]]


class TTimestepEmbedder(nn.Module):
    """mdm.py:210-227."""

    def __init__(self, latent_dim, pos_encoder):
        super().__init__()
        self.sequence_pos_encoder = pos_encoder
        self.time_embed = nn.Sequential(nn.Linear(latent_dim, latent_dim),
                                        nn.SiLU(),
                                        nn.Linear(latent_dim, latent_dim))

    def forward(self, timesteps):
        return self.time_embed(
            self.sequence_pos_encoder.pe[timesteps]).permute(1, 0, 2)


class TMDM(nn.Module):
    def __init__(self, m):
        super().__init__()
        L = m["latent_dim"]
        self.guide_scale = m["guide_scale"]
        self.poseEmbedding = nn.Linear(m["input_feats"], L)
        self.sequence_pos_encoder = TPositionalEncoding(L)
        enc_layer = nn.TransformerEncoderLayer(
            d_model=L, nhead=m["num_heads"], dim_feedforward=m["ff_size"],
            dropout=0.0, activation="gelu")
        self.seqTransEncoder = nn.TransformerEncoder(enc_layer,
                                                     num_layers=m["num_layers"])
        self.embed_timestep = TTimestepEmbedder(L, self.sequence_pos_encoder)
        self.embed_text = nn.Linear(m["clip_dim"], L)
        self.poseFinal = nn.Linear(L, m["input_feats"])
        self.clip_model = TClip(m["clip_dim"], m.get("clip_layers", 12))
        w = m["clip_dim"]
        self.clip_model.text_projection = nn.Parameter(torch.zeros(w, w))

    def encode_text(self, text_ids):
        """CLIP encode_text: causal transformer, EOT (argmax id) pooling,
        text_projection (mdm.py:111-126 via clip_model.encode_text)."""
        c = self.clip_model
        T = text_ids.shape[1]
        x = c.token_embedding(text_ids) + c.positional_embedding[:T]
        x = x.permute(1, 0, 2)
        mask = torch.full((T, T), float("-inf")).triu(1)
        x = c.transformer(x, mask)
        x = c.ln_final(x).permute(1, 0, 2)
        eot = text_ids.argmax(dim=-1)
        return x[torch.arange(x.shape[0]), eot] @ c.text_projection

    def _trunk(self, motion, timesteps, text_emb):
        h = self.poseEmbedding(motion).permute(1, 0, 2)  # [T, B, D]
        emb = self.embed_timestep(timesteps)  # [1, B, D]
        emb = emb + self.embed_text(text_emb)
        xseq = self.sequence_pos_encoder(torch.cat((emb, h), dim=0))
        out = self.seqTransEncoder(xseq)[1:]
        return self.poseFinal(out).permute(1, 0, 2)

    def forward_test(self, motion, timesteps, enc_text):
        out_uncond = self._trunk(motion, timesteps, torch.zeros_like(enc_text))
        out_text = self._trunk(motion, timesteps, enc_text)
        return out_uncond + self.guide_scale * (out_text - out_uncond)


def test_mdm_full_forward_parity():
    import flax

    m = dict(type="MDMTransformer", input_feats=32, latent_dim=32,
             ff_size=64, num_layers=2, num_heads=4, dropout=0.0,
             clip_dim=32, clip_layers=2, guide_scale=2.5, cond_mask_prob=0.1)
    cfg = dict(type="MotionDiffusion", model=m,
               loss_recon=dict(type="MSELoss", loss_weight=1, reduction="none"),
               diffusion_train=dict(beta_scheduler="cosine", diffusion_steps=1000,
                                    model_mean_type="start_x",
                                    model_var_type="fixed_small"),
               diffusion_test=dict(beta_scheduler="cosine", diffusion_steps=1000,
                                   model_mean_type="start_x",
                                   model_var_type="fixed_small"),
               inference_type="ddpm")
    arch = build_architecture(cfg)
    B, T = 2, 12
    rng = np.random.RandomState(5)
    batch = {"motion": rng.randn(B, T, 32).astype(np.float32),
             "motion_mask": np.ones((B, T), np.float32),
             "motion_length": np.full((B, 1), T, np.int32),
             "text_ids": np.asarray(tokenize(["a person jumps",
                                              "someone runs in a circle"]))}
    variables = flax.core.unfreeze(arch.init(jax.random.PRNGKey(0), batch))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    sd = fab.mdm_sd(params, np.random.RandomState(1), m["num_layers"],
                    m["clip_layers"], official=False)
    sd = {k: (v * (1.0 / np.sqrt(max(v.shape[-1], 4)))).astype(np.float32)
          for k, v in sd.items()}

    tree = convert_mdm(sd, m["num_layers"], m["clip_layers"])
    _tree_update(params, tree)
    variables["params"] = params
    xf = arch.model.apply(variables, batch["text_ids"], method="encode_text")
    timesteps = np.full((B,), 777, np.int32)
    # jit (persistent-cached): the eager flax apply dominates test wall-clock
    out_flax = np.asarray(jax.jit(
        lambda v, m_, t_, mask, ml, xf_: arch.model.apply(
            v, m_, t_, motion_mask=mask, motion_length=ml, xf_out=xf_,
            mode="test"))(
        variables, batch["motion"], timesteps,
        batch["motion_mask"], batch["motion_length"], xf))

    model = TMDM(m).eval()
    model.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()}, strict=True)
    ids = torch.from_numpy(np.asarray(batch["text_ids"], np.int64))
    enc_text = model.encode_text(ids)
    np.testing.assert_allclose(np.asarray(xf), enc_text.numpy(), atol=1e-5,
                               rtol=1e-3)
    out_torch = model.forward_test(
        torch.from_numpy(batch["motion"]),
        torch.from_numpy(timesteps.astype(np.int64)), enc_text).numpy()
    scale = max(1.0, float(np.abs(out_torch).max()))
    assert float(np.abs(out_flax - out_torch).max()) < 1e-4 * scale
