"""End-to-end MotionDiffuse checkpoint-conversion parity.

Independent torch re-statement of the reference MotionDiffuseTransformer eval
forward (/root/reference/mogen/models/transformers/motiondiffuse.py:8-60 over
the DiffusionTransformer skeleton, Efficient self/cross attention + FFN,
use_text_proj pooled conditioning).  Reuses the re-stated blocks from the MCM
parity test; sa operates over TIME here (no channel transpose)."""

import os
import sys

import jax
import numpy as np
import torch
import torch.nn as nn

import motioncraft_tpu.models  # noqa: F401
from motioncraft_tpu.models.tokenizer import tokenize
from motioncraft_tpu.registry import build_architecture
from motioncraft_tpu.utils.torch_convert import (_tree_update,
                                                 convert_motiondiffuse)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import fabricate_torch as fab  # noqa: E402
from test_mcm_forward_parity import TEffCross, TEffSelf, TFFN, TMCM  # noqa: E402

import pytest

pytestmark = pytest.mark.parity

torch.set_grad_enabled(False)


class TMDLayer(nn.Module):
    """diffusion_transformer.py DecoderLayer: sa -> ca -> ffn over time."""

    def __init__(self, m):
        super().__init__()
        sa, ca, ffn = m["sa_block_cfg"], m["ca_block_cfg"], m["ffn_cfg"]
        self.sa_block = TEffSelf(sa["latent_dim"], sa["num_heads"],
                                 sa["time_embed_dim"])
        self.ca_block = TEffCross(ca["latent_dim"], ca["text_latent_dim"],
                                  ca["num_heads"], ca["time_embed_dim"])
        self.ffn = TFFN(ffn["latent_dim"], ffn["ffn_dim"],
                        ffn["time_embed_dim"])

    def forward(self, x, xf, emb, src_mask):
        x = self.sa_block(x, src_mask, emb)
        x = self.ca_block(x, xf, emb)
        return self.ffn(x, emb)


class TMotionDiffuse(TMCM):
    """Same skeleton as the MCM re-statement, plain decoder layers."""

    def __init__(self, m):
        super().__init__(m)
        self.temporal_decoder_blocks = nn.ModuleList(
            TMDLayer(m) for _ in range(m["num_layers"]))

    def forward_test(self, motion, timesteps, motion_mask, xf_proj, xf_out):
        B, T, _ = motion.shape
        src_mask = motion_mask.unsqueeze(-1)
        from test_stmogen_forward_parity import t_timestep_embedding
        emb = self.time_embed(t_timestep_embedding(timesteps, self.latent_dim))
        emb = emb + xf_proj
        h = self.joint_embed(motion) + self.sequence_embedding[None, :T]
        for blk in self.temporal_decoder_blocks:
            h = blk(h, xf_out, emb, src_mask)
        return self.out(h)


def test_motiondiffuse_full_forward_parity():
    import flax

    m = dict(type="MotionDiffuseTransformer", input_feats=32, max_seq_len=16,
             latent_dim=24, time_embed_dim=32, num_layers=2,
             sa_block_cfg=dict(type="EfficientSelfAttention", latent_dim=24,
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
    arch = build_architecture(cfg)
    B, T = 2, 16
    rng = np.random.RandomState(11)
    batch = {"motion": rng.randn(B, T, 32).astype(np.float32),
             "motion_mask": (np.arange(T)[None, :]
                             < np.array([[16], [11]])).astype(np.float32),
             "motion_length": np.array([[16], [11]], np.int32),
             "text_ids": np.asarray(tokenize(["a person spins",
                                              "someone sits down"]))}
    variables = flax.core.unfreeze(arch.init(jax.random.PRNGKey(0), batch))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    sd = fab.motiondiffuse_sd(params, np.random.RandomState(3),
                              m["num_layers"],
                              m["text_encoder"]["num_layers"],
                              m["text_encoder"]["clip_layers"])
    sd = {k: (v * (1.0 / np.sqrt(max(v.shape[-1], 4)))).astype(np.float32)
          for k, v in sd.items()}

    tree = convert_motiondiffuse({"model." + k: v for k, v in sd.items()},
                                 m["num_layers"],
                                 m["text_encoder"]["num_layers"],
                                 m["text_encoder"]["clip_layers"])
    _tree_update(params, tree)
    variables["params"] = params
    xf_proj_flax, xf_flax = arch.model.apply(variables, batch["text_ids"],
                                             method="encode_text")
    timesteps = np.full((B,), 222, np.int32)
    # jit (persistent-cached): the eager flax apply dominates test wall-clock
    out_flax = np.asarray(jax.jit(
        lambda v, m_, t_, mask, ml, xf_, xp: arch.model.apply(
            v, m_, t_, motion_mask=mask, motion_length=ml, xf_out=xf_,
            xf_proj=xp, mode="test"))(
        variables, batch["motion"], timesteps, batch["motion_mask"],
        batch["motion_length"], xf_flax, xf_proj_flax))

    model = TMotionDiffuse(m).eval()
    model.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()}, strict=True)
    ids = torch.from_numpy(np.asarray(batch["text_ids"], np.int64))
    xf_proj_t, xf_t = model.encode_text(ids)
    np.testing.assert_allclose(np.asarray(xf_flax), xf_t.numpy(), atol=1e-5,
                               rtol=1e-3)
    out_torch = model.forward_test(
        torch.from_numpy(batch["motion"]),
        torch.from_numpy(timesteps.astype(np.int64)),
        torch.from_numpy(batch["motion_mask"]), xf_proj_t, xf_t).numpy()
    scale = max(1.0, float(np.abs(out_torch).max()))
    assert float(np.abs(out_flax - out_torch).max()) < 1e-4 * scale
