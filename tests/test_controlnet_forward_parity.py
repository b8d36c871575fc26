"""End-to-end ControlT2MHalf merged-checkpoint conversion parity.

Independent torch re-statement of the reference ControlNet forward — frozen
base STMoGen, control blocks (zero-init before/after projections), WavEncoder
condition pre-encoding, condition CFG masking, c_skip injection, CFG mixing —
from /root/reference/mogen/models/transformers/controlnet.py:30-465 and
mogen/models/utils/blocks.py:10-71.  A fabricated merged base+control
checkpoint (the released .pth layout) is loaded into the re-statement AND run
through ``convert_controlnet`` into the flax model; forwards must agree.
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
from motioncraft_tpu.config import Config
from motioncraft_tpu.models.tokenizer import tokenize
from motioncraft_tpu.registry import build_architecture
from motioncraft_tpu.utils.torch_convert import _tree_update, convert_controlnet

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_controlnet_convert import fabricate_merged_sd  # noqa: E402
from test_stmogen_forward_parity import (TDecoderLayer, TSTMoGen,  # noqa: E402
                                         t_timestep_embedding)

pytestmark = pytest.mark.parity

torch.set_grad_enabled(False)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TBasicBlock(nn.Module):
    """EMAGE conv block (reference mogen/models/utils/blocks.py:10-51)."""

    def __init__(self, inplanes, planes, ker_size, stride=1, first_dilation=0,
                 downsample=False):
        super().__init__()
        self.conv1 = nn.Conv1d(inplanes, planes, ker_size, stride=stride,
                               padding=first_dilation, bias=True)
        self.bn1 = nn.BatchNorm1d(planes)
        self.act1 = nn.LeakyReLU(inplace=True)
        self.conv2 = nn.Conv1d(planes, planes, ker_size,
                               padding=ker_size // 2, bias=True)
        self.bn2 = nn.BatchNorm1d(planes)
        self.act2 = nn.LeakyReLU(inplace=True)
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv1d(inplanes, planes, stride=stride, kernel_size=ker_size,
                          padding=first_dilation, bias=True),
                nn.BatchNorm1d(planes))
        else:
            self.downsample = None

    def forward(self, x):
        shortcut = x
        x = self.act1(self.bn1(self.conv1(x)))
        x = self.bn2(self.conv2(x))
        if self.downsample is not None:
            shortcut = self.downsample(shortcut)
        return self.act2(x + shortcut)


class TWavEncoder(nn.Module):
    """Reference WavEncoder (blocks.py:53-71): 16 kHz -> ~30 fps features."""

    def __init__(self, out_dim, audio_in=1):
        super().__init__()
        self.feat_extractor = nn.Sequential(
            TBasicBlock(audio_in, out_dim // 4, 15, 5, first_dilation=1600,
                        downsample=True),
            TBasicBlock(out_dim // 4, out_dim // 4, 15, 6, first_dilation=0,
                        downsample=True),
            TBasicBlock(out_dim // 4, out_dim // 4, 15, 1, first_dilation=7),
            TBasicBlock(out_dim // 4, out_dim // 2, 15, 6, first_dilation=0,
                        downsample=True),
            TBasicBlock(out_dim // 2, out_dim // 2, 15, 1, first_dilation=7),
            TBasicBlock(out_dim // 2, out_dim, 15, 3, first_dilation=0,
                        downsample=True))

    def forward(self, wav):  # [B, L, C] or [B, L]
        wav = wav.unsqueeze(1) if wav.dim() == 2 else wav.transpose(1, 2)
        return self.feat_extractor(wav).transpose(1, 2)


class TConditionEncoder(nn.Module):
    def __init__(self, out_dim, audio_in):
        super().__init__()
        self.pre_encoder = TWavEncoder(out_dim, audio_in)

    def forward(self, c):
        return self.pre_encoder(c)


class TControlBlock(nn.Module):
    """ControlT2MBlock (controlnet.py:30-87): copied decoder layer with
    zero-init before (index 0) / after projections."""

    def __init__(self, stma_kwargs, ffn_cfg, latent_dim, index):
        super().__init__()
        self.copied_block = TDecoderLayer(stma_kwargs, ffn_cfg["latent_dim"],
                                          ffn_cfg["ffn_dim"],
                                          ffn_cfg["num_heads"],
                                          ffn_cfg["time_embed_dim"])
        self.block_index = index
        if index == 0:
            self.before_proj = nn.Linear(latent_dim, latent_dim)
        self.after_proj = nn.Linear(latent_dim, latent_dim)

    def forward(self, x, xf, emb, src_mask, cond_type, c):
        if self.block_index == 0:
            c = self.copied_block(x + self.before_proj(c), xf, emb, src_mask,
                                  cond_type)
        else:
            c = self.copied_block(c, xf, emb, src_mask, cond_type)
        return c, self.after_proj(c)


class TControlT2MHalf(nn.Module):
    """Reference ControlT2MHalf forward_test (controlnet.py:108-425), eval."""

    def __init__(self, m):
        super().__init__()
        bm = m["base_model"]
        cc = m["condition_encode_cfg"]
        ca = bm["ca_block_cfg"]
        self.base_model = TSTMoGen(bm)
        self.copy_blocks_num = m["copy_blocks_num"]
        self.condition_cfg = cc["condition_cfg"]
        stma_kwargs = dict(
            latent_dim=ca["latent_dim"], text_latent_dim=ca["text_latent_dim"],
            num_heads=ca["num_heads"], num_text_heads=ca["num_text_heads"],
            num_experts=ca["num_experts"], topk=ca["topk"],
            ffn_dim=ca["ffn_dim"], time_embed_dim=ca["time_embed_dim"],
            max_seq_len=ca["max_seq_len"],
            max_text_seq_len=ca["max_text_seq_len"],
            static_body=ca.get("static_body", True),
            dynamic_body=ca.get("dynamic_body", False))
        self.controlnet = nn.ModuleList(
            TControlBlock(stma_kwargs, bm["ffn_cfg"], bm["latent_dim"], i)
            for i in range(self.copy_blocks_num))
        self.condition_pre_encoder = TConditionEncoder(
            cc["condition_latent_dim"], cc["control_cond_feats"])
        self.control_cond_input = nn.Linear(cc["condition_latent_dim"],
                                            bm["latent_dim"])

    def forward_c(self, c, h):
        """controlnet.py:186-199: encode, zero-proj, pad to h's length, add
        the base sequence embedding over the condition span."""
        c = self.condition_pre_encoder(c)
        c = self.control_cond_input(c)
        pad = h.shape[1] - c.shape[1]
        assert pad == 0, (
            "pick the audio length so the conv chain lands exactly on T "
            f"(got condition len {c.shape[1]} vs motion len {h.shape[1]})")
        pos_len = c.shape[1]
        return c + self.base_model.sequence_embedding[None, :pos_len]

    def forward_test(self, motion, timesteps, motion_mask, xf_out, c):
        bm = self.base_model
        B, T, _ = motion.shape
        src_mask = motion_mask.unsqueeze(-1)
        emb = bm.time_embed(t_timestep_embedding(timesteps, bm.latent_dim))
        h = bm.joint_embed(motion)
        c = self.forward_c(c, h)
        h = h + bm.sequence_embedding[None, :T]

        cond = torch.cat((torch.ones(B, 1, 1), torch.zeros(B, 1, 1)), dim=0)
        h = h.repeat(2, 1, 1)
        xf2 = xf_out.repeat(2, 1, 1)
        emb2 = emb.repeat(2, 1)
        mask2 = src_mask.repeat(2, 1, 1)
        blocks = bm.temporal_decoder_blocks

        h = blocks[0](h, xf2, emb2, mask2, cond)
        c = c.repeat(2, 1, 1)
        if self.condition_cfg:
            c = c * cond
        for index in range(1, self.copy_blocks_num + 1):
            c, c_skip = self.controlnet[index - 1](h, xf2, emb2, mask2, cond, c)
            h = blocks[index](h + c_skip, xf2, emb2, mask2, cond)
        for index in range(self.copy_blocks_num + 1, len(blocks)):
            h = blocks[index](h, xf2, emb2, mask2, cond)

        out = self.base_model.out(h)
        t = int(timesteps[0])
        w = (1 - (1000 - t) / 1000) * self.base_model.scale + 1
        return out[:B] * w + out[B:] * (1 - w)


# audio length whose conv chain (strides 5,6,1,6,1,3 with the reference
# paddings) lands exactly on T=16 output frames
AUDIO_LEN = 7925


@pytest.mark.slow
def test_controlnet_merged_forward_parity():
    import flax

    cfg = Config.fromfile(os.path.join(REPO, "configs", "tests", "tiny_s2g.py"))
    m = cfg.model["model"]
    bm = m["base_model"]
    arch = build_architecture(cfg.model)

    B, T = 2, 16
    rng = np.random.RandomState(7)
    batch = {
        "motion": rng.randn(B, T, 322).astype(np.float32),
        "motion_mask": (np.arange(T)[None, :]
                        < np.array([[16], [12]])).astype(np.float32),
        "motion_length": np.array([[16], [12]], np.int32),
        "text_ids": np.asarray(tokenize(["a speaker gestures", "hello there"])),
        "c": rng.randn(B, AUDIO_LEN, 2).astype(np.float32),
    }
    variables = flax.core.unfreeze(arch.init(jax.random.PRNGKey(0), batch))
    np_vars = jax.tree_util.tree_map(np.asarray, variables)

    num_layers, num_heads = bm["num_layers"], bm["ffn_cfg"]["num_heads"]
    text_layers = bm["text_encoder"]["num_layers"]
    clip_layers = bm["text_encoder"]["clip_layers"]
    sd = fabricate_merged_sd(np_vars, num_layers, num_heads,
                             m["copy_blocks_num"], text_layers, clip_layers)
    sd = {k: (v * (1.0 / np.sqrt(max(v.shape[-1], 4)))).astype(np.float32)
          for k, v in sd.items()}
    for k in list(sd):
        if k.endswith("temperature"):
            sd[k] = np.zeros_like(sd[k])
        elif k.endswith("moe.embedding"):
            sd[k] = (sd[k] * 8.0).astype(np.float32)
        elif k.endswith("running_var"):
            sd[k] = (np.abs(sd[k]) + 0.5).astype(np.float32)  # sane BN stats

    # ---- flax: convert the merged checkpoint + forward
    params_tree, stats_tree = convert_controlnet(
        {"model." + k: v for k, v in sd.items()}, num_layers, num_heads,
        m["copy_blocks_num"], text_layers, clip_layers)
    _tree_update(np_vars["params"], params_tree)
    if stats_tree:
        _tree_update(np_vars["batch_stats"], stats_tree)
    variables = np_vars
    xf_flax = arch.encode_text(variables, batch["text_ids"])
    timesteps = np.full((B,), 499, np.int32)
    # jit (persistent-cached): the eager flax apply dominates test wall-clock
    out_flax = np.asarray(jax.jit(
        lambda v, m_, t_, mask, ml, xf_, c_: arch.model.apply(
            v, m_, t_, motion_mask=mask, motion_length=ml, xf_out=xf_,
            c=c_, mode="test"))(
        variables, batch["motion"], timesteps, batch["motion_mask"],
        batch["motion_length"], xf_flax, batch["c"]))

    # ---- torch: load the SAME merged checkpoint into the re-statement
    model = TControlT2MHalf(m).eval()
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False)
    assert not unexpected, unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing), missing

    xf_torch = model.base_model.encode_text(
        torch.from_numpy(np.asarray(batch["text_ids"], np.int64)))
    np.testing.assert_allclose(np.asarray(xf_flax), xf_torch.numpy(),
                               atol=1e-5, rtol=1e-3)
    out_torch = model.forward_test(
        torch.from_numpy(batch["motion"]),
        torch.from_numpy(timesteps.astype(np.int64)),
        torch.from_numpy(batch["motion_mask"]), xf_torch,
        torch.from_numpy(batch["c"])).numpy()

    scale = max(1.0, float(np.abs(out_torch).max()))
    diff = float(np.abs(out_flax - out_torch).max())
    assert diff < 1e-4 * scale, (diff, scale)
