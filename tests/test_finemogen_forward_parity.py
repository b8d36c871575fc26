"""End-to-end FineMoGen checkpoint-conversion parity.

Independent torch re-statement of the reference SAMI attention
(/root/reference/mogen/models/attentions/fine_attention.py:62-202: linear-
attention template, Gaussian time kernel, Taylor state/vel/acc/jerk basis,
per-interval time offsets) inside the FineMoGenTransformer skeleton
(finemogen.py — shares the STMoGen CFG scheme).  Covers num_intervals=1 AND
2 (the spatio-temporal composition path)."""

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
from motioncraft_tpu.apis.factory import make_text_batch
from motioncraft_tpu.registry import build_architecture
from motioncraft_tpu.utils.torch_convert import _tree_update, convert_finemogen

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import fabricate_torch as fab  # noqa: E402
from test_stmogen_forward_parity import (TMOE, TSFFN, TStylization,  # noqa: E402
                                         TSTMoGen, t_timestep_embedding)

pytestmark = pytest.mark.parity

torch.set_grad_enabled(False)


class TSAMI(nn.Module):
    """fine_attention.py:62-202 (eval)."""

    def __init__(self, latent_dim, text_latent_dim, num_heads, num_text_heads,
                 num_experts, topk, ffn_dim, time_embed_dim, max_seq_len,
                 max_text_seq_len, **unused):
        super().__init__()
        self.latent_dim, self.num_heads = latent_dim, num_heads
        self.num_text_heads = num_text_heads
        self.max_seq_len = max_seq_len
        self.norm = nn.LayerNorm(latent_dim)
        self.text_norm = nn.LayerNorm(text_latent_dim)
        self.sigma = nn.Parameter(torch.tensor([100.0]))
        self.register_buffer("time",
                             torch.arange(max_seq_len).float() / max_seq_len,
                             persistent=False)
        self.text_moe = TMOE(num_experts, topk, text_latent_dim,
                             text_latent_dim * 4, 2 * latent_dim,
                             num_text_heads, max_text_seq_len)
        self.motion_moe = TMOE(num_experts, topk, latent_dim, latent_dim * 4,
                               3 * latent_dim, num_heads, max_seq_len)
        self.key_motion = nn.Parameter(torch.randn(4, 4))  # unused (reference)
        self.body_weight = nn.Parameter(torch.randn(num_heads, num_heads))

        def get_ffn(out=latent_dim):
            return nn.Sequential(nn.Linear(latent_dim, ffn_dim), nn.GELU(),
                                 nn.Linear(ffn_dim, out))

        self.template_s = get_ffn()
        self.template_v = get_ffn()
        self.template_a = get_ffn()
        self.template_j = get_ffn()
        self.template_t = get_ffn(1)
        self.t_sigma = nn.Parameter(torch.tensor([1.0]))
        self.proj_out = TStylization(latent_dim * num_heads, time_embed_dim)

    def forward(self, x, xf, emb, src_mask, cond_type, motion_length,
                num_intervals):
        B, T, D = x.shape
        N = xf.shape[1] + T
        H, L = self.num_heads, self.latent_dim
        x = x.reshape(B, T, H, -1)
        text_feat = self.text_moe(self.text_norm(
            xf.reshape(B, xf.shape[1], self.num_text_heads, -1)))
        motion_feat = self.motion_moe(self.norm(x))

        body_weight = F.softmax(self.body_weight, dim=1)
        body_feat = torch.einsum("hl,bnld->bnhd", body_weight,
                                 motion_feat[:, :, :, :L]).reshape(B, T, D)

        text_cond_type = (cond_type % 10 > 0).float().unsqueeze(-1)
        src_mask = src_mask.view(B, T, 1, 1)
        key_text = text_feat[:, :, :, :L] + (1 - text_cond_type) * -1000000
        if self.num_text_heads == 1:
            key_text = key_text.repeat(1, 1, H, 1)
        key_motion = motion_feat[:, :, :, L:2 * L] + (1 - src_mask) * -1000000
        key = F.softmax(torch.cat((key_text, key_motion), dim=1).view(B, N, H, -1),
                        dim=1)
        value_text = text_feat[:, :, :, L:] * text_cond_type
        if self.num_text_heads == 1:
            value_text = value_text.repeat(1, 1, H, 1)
        value_motion = motion_feat[:, :, :, 2 * L:] * src_mask
        value = torch.cat((value_text, value_motion), dim=1).view(B, N, H, -1)

        template = torch.einsum("bnhd,bnhl->bhdl", key, value)
        template_t_feat = self.template_t(template)
        template_t = torch.sigmoid(template_t_feat / self.t_sigma)
        template_t = template_t * motion_length.view(B, 1, 1, 1)
        template_t = template_t / self.max_seq_len
        org_t = self.time[:T].type_as(x.reshape(B, T, D))

        NI = num_intervals
        t = org_t.clone().view(1, 1, -1, 1, 1).repeat(B // NI, NI, 1, 1, 1)
        template_t = template_t.view(-1, NI, H, L)
        motion_length = motion_length.view(-1, NI)
        for b_ix in range(B // NI):
            sum_frames = 0
            for i in range(NI):
                t[b_ix, i] += sum_frames / self.max_seq_len
                template_t[b_ix, i] = (template_t[b_ix, i]
                                       + sum_frames / self.max_seq_len)
                sum_frames += motion_length[b_ix, i]
        template_t = template_t.permute(0, 2, 1, 3)
        template_t = template_t.unsqueeze(1).repeat(1, NI, 1, 1, 1)
        template_t = template_t.reshape(B, 1, H, -1)
        time_delta = (t.view(B, -1, 1, 1) - template_t) * self.max_seq_len
        time_coef = F.softmax(-(time_delta * time_delta) / self.sigma, dim=-1)

        template = template.view(-1, NI, H, L, L)
        template = template.permute(0, 2, 1, 3, 4).unsqueeze(1)
        template = template.repeat(1, NI, 1, 1, 1, 1).reshape(B, H, -1, L)
        ts_ = self.template_s(template)
        tv_ = self.template_v(template)
        ta_ = self.template_a(template)
        tj_ = self.template_j(template)
        tt = template_t.view(B, H, -1, 1)
        a0t = ts_ - tv_ * tt + ta_ * tt * tt - tj_ * tt * tt * tt
        a1t = tv_ - 2 * ta_ * tt + 3 * tj_ * tt * tt
        a2t = ta_ - 3 * tj_ * tt
        a3t = tj_
        mix = lambda tmpl: torch.einsum("bnhd,bhdl->bnhl", time_coef,
                                        tmpl).reshape(B, T, D)
        tb = t.view(B, -1, 1)
        y_t = mix(a0t) + mix(a1t) * tb + mix(a2t) * tb * tb + mix(a3t) * tb ** 3
        return x.reshape(B, T, D) + self.proj_out(body_feat + y_t, emb)


class TFMGLayer(nn.Module):
    def __init__(self, sami_kwargs, ffn_cfg):
        super().__init__()
        self.ca_block = TSAMI(**sami_kwargs)
        self.ffn = TSFFN(ffn_cfg["latent_dim"], ffn_cfg["ffn_dim"],
                         ffn_cfg["num_heads"], ffn_cfg["time_embed_dim"])

    def forward(self, x, xf, emb, src_mask, cond_type, motion_length, NI):
        x = self.ca_block(x, xf, emb, src_mask, cond_type, motion_length, NI)
        return self.ffn(x, emb)


class TFineMoGen(TSTMoGen):
    def __init__(self, m):
        super().__init__(m)
        ca = m["ca_block_cfg"]
        sami_kwargs = dict(
            latent_dim=ca["latent_dim"], text_latent_dim=ca["text_latent_dim"],
            num_heads=ca["num_heads"], num_text_heads=ca["num_text_heads"],
            num_experts=ca["num_experts"], topk=ca["topk"],
            ffn_dim=ca["ffn_dim"], time_embed_dim=ca["time_embed_dim"],
            max_seq_len=ca["max_seq_len"],
            max_text_seq_len=ca["max_text_seq_len"])
        self.temporal_decoder_blocks = nn.ModuleList(
            TFMGLayer(sami_kwargs, m["ffn_cfg"])
            for _ in range(m["num_layers"]))

    def forward_test(self, motion, timesteps, motion_mask, motion_length,
                     xf_out, num_intervals=1):
        B, T, _ = motion.shape
        src_mask = motion_mask.unsqueeze(-1)
        emb = self.time_embed(t_timestep_embedding(timesteps, self.latent_dim))
        h = self.joint_embed(motion) + self.sequence_embedding[None, :T]
        cond = torch.cat((torch.ones(B, 1, 1), torch.zeros(B, 1, 1)), dim=0)
        h = h.repeat(2, 1, 1)
        xf2 = xf_out.repeat(2, 1, 1)
        emb2 = emb.repeat(2, 1)
        mask2 = src_mask.repeat(2, 1, 1)
        ml2 = motion_length.repeat(2, 1)
        for blk in self.temporal_decoder_blocks:
            h = blk(h, xf2, emb2, mask2, cond, ml2, num_intervals)
        out = self.out(h)
        t = int(timesteps[0])
        w = (1 - (1000 - t) / 1000) * self.scale + 1
        return out[:B] * w + out[B:] * (1 - w)


@pytest.mark.parametrize("num_intervals", [1, 2])
def test_finemogen_full_forward_parity(num_intervals):
    import flax

    lat, H = 8, 12
    m = dict(type="FineMoGenTransformer", input_feats=322, max_seq_len=16,
             latent_dim=lat * H, time_embed_dim=32, num_layers=2,
             ca_block_cfg=dict(type="SAMI", latent_dim=lat, text_latent_dim=16,
                               num_heads=H, num_text_heads=1, num_experts=4,
                               topk=2, gate_type="cosine_top", gate_noise=1.0,
                               ffn_dim=16, time_embed_dim=32, max_seq_len=16,
                               max_text_seq_len=77, temporal_comb=False,
                               dropout=0),
             ffn_cfg=dict(latent_dim=lat, ffn_dim=16, dropout=0,
                          time_embed_dim=32, num_heads=H),
             text_encoder=dict(pretrained_model="clip", latent_dim=16,
                               num_layers=1, ff_size=16, dropout=0,
                               use_text_proj=False, clip_width=32,
                               clip_layers=1),
             pose_encoder_cfg=dict(dataset_name="motionx", latent_dim=lat,
                                   input_dim=322),
             pose_decoder_cfg=dict(dataset_name="motionx", latent_dim=lat,
                                   output_dim=322),
             scale_func_cfg=dict(scale=6.5))
    cfg = dict(type="MotionDiffusion", model=m,
               loss_recon=dict(type="MSELoss", loss_weight=1, reduction="none"),
               diffusion_train=dict(beta_scheduler="linear",
                                    diffusion_steps=1000,
                                    model_mean_type="start_x",
                                    model_var_type="fixed_large"),
               diffusion_test=dict(beta_scheduler="linear",
                                   diffusion_steps=1000,
                                   model_mean_type="start_x",
                                   model_var_type="fixed_large", respace="4"),
               inference_type="ddim")
    arch = build_architecture(cfg)
    B, T = 2, 16
    batch = make_text_batch(["a person walks", "someone waves"], max_seq_len=T)
    batch["motion"] = np.random.RandomState(13).randn(
        *batch["motion"].shape).astype(np.float32)
    batch["motion_length"] = np.array([[16], [12]], np.int32)
    batch["motion_mask"] = (np.arange(T)[None, :]
                            < batch["motion_length"]).astype(np.float32)
    variables = flax.core.unfreeze(arch.init(jax.random.PRNGKey(0), batch))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    sd = fab.finemogen_sd(params, np.random.RandomState(4), m["num_layers"],
                          H, m["text_encoder"]["num_layers"],
                          m["text_encoder"]["clip_layers"])
    sd = {k: (v * (1.0 / np.sqrt(max(v.shape[-1], 4)))).astype(np.float32)
          for k, v in sd.items()}
    for k in list(sd):
        if k.endswith("temperature"):
            sd[k] = np.zeros_like(sd[k])
        elif k.endswith("moe.embedding"):
            sd[k] = (sd[k] * 8.0).astype(np.float32)
        elif k.endswith(".sigma"):
            sd[k] = np.full_like(sd[k], 100.0)
        elif k.endswith("t_sigma"):
            sd[k] = np.ones_like(sd[k])

    tree = convert_finemogen(sd, m["num_layers"], H,
                             m["text_encoder"]["num_layers"],
                             m["text_encoder"]["clip_layers"])
    _tree_update(params, tree)
    variables["params"] = params
    xf = arch.encode_text(variables, batch["text_ids"])
    timesteps = np.full((B,), 499, np.int32)
    # jit (persistent-cached): the eager flax apply dominates test wall-clock
    out_flax = np.asarray(jax.jit(
        lambda v, m_, t_, mask, ml, xf_: arch.model.apply(
            v, m_, t_, motion_mask=mask, motion_length=ml, xf_out=xf_,
            num_intervals=num_intervals, mode="test"))(
        variables, batch["motion"], timesteps,
        batch["motion_mask"], batch["motion_length"], xf))

    model = TFineMoGen(m).eval()
    model.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()}, strict=True)
    xf_t = model.encode_text(torch.from_numpy(
        np.asarray(batch["text_ids"], np.int64)))
    out_torch = model.forward_test(
        torch.from_numpy(batch["motion"]),
        torch.from_numpy(timesteps.astype(np.int64)),
        torch.from_numpy(batch["motion_mask"]),
        torch.from_numpy(batch["motion_length"].astype(np.float32)), xf_t,
        num_intervals=num_intervals).numpy()
    scale = max(1.0, float(np.abs(out_torch).max()))
    assert float(np.abs(out_flax - out_torch).max()) < 2e-4 * scale
