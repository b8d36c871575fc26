"""End-to-end STMoGen checkpoint-conversion parity.

Independent torch re-statement of the reference forward — PoseEncoder
body-part slices, tutel cosine-top-gate MoE, STMA static/dynamic-body linear
attention, SFFN, PoseDecoder scatter, frozen-CLIP text tower + finetune
encoder, CFG test mode — built ONLY from the reference sources
(/root/reference/mogen/models/transformers/stmogen.py:140-761,
attentions/st_attention.py:17-179, attentions/efficient_attention.py:9-46,
transformers/diffusion_transformer.py:109-238,
utils/stylization_block.py:14-40, utils/position_encoding.py:42-60; tutel
expert layout per tutel/experts/ffn.py).  A full fabricated torch checkpoint
is loaded strict=True into the re-statement AND run through
``convert_stmogen`` into the flax model; forwards must agree <= 1e-4.

The MoE comparison is exact in the no-drop regime (asserted inside the torch
gate): with no expert over tutel capacity, every implementation computes
y = sum_k gate_k * FFN_{e_k}(x) regardless of slot ordering, which is the
regime real evaluation runs in.
"""

import math

import jax
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import motioncraft_tpu.models  # noqa: F401
from motioncraft_tpu.apis.factory import make_text_batch, tiny_t2m_cfg
from motioncraft_tpu.registry import build_architecture
from motioncraft_tpu.utils.torch_convert import _tree_update, convert_stmogen

from test_stmogen_convert import fabricate_torch_sd

pytestmark = pytest.mark.parity

torch.set_grad_enabled(False)


# --------------------------------------------------------------------------
# body-part slice tables, restated from reference get_smplx_slice
# (stmogen.py:53-71) — the index arithmetic IS the spec
def smplx_slices():
    s = {
        "root": [0, 1, 2] + list(range(312, 322)),
        "trans": [309, 310, 311],
        "head": [36, 37, 38, 45, 46, 47, 156, 157, 158],
        "stem": [9, 10, 11, 18, 19, 20, 27, 28, 29],
        "larm": sum(([j * 3, j * 3 + 1, j * 3 + 2] for j in (14, 17, 19, 21)), []),
        "rarm": sum(([j * 3, j * 3 + 1, j * 3 + 2] for j in (13, 16, 18, 20)), []),
        "lleg": sum(([j * 3, j * 3 + 1, j * 3 + 2] for j in (2, 5, 8, 11)), []),
        "rleg": sum(([j * 3, j * 3 + 1, j * 3 + 2] for j in (1, 4, 7, 10)), []),
        "face": list(range(159, 309)),
        "lhand": list(range(66, 111)),
        "rhand": list(range(111, 156)),
    }
    order = ["head", "stem", "larm", "rarm", "lleg", "rleg", "root",
             "trans", "face", "lhand", "rhand"]
    return {k: s[k] for k in order}


def t_timestep_embedding(timesteps, dim, max_period=10000.0):
    half = dim // 2
    freqs = torch.exp(-math.log(max_period)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = timesteps[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TStylization(nn.Module):
    def __init__(self, latent_dim, time_embed_dim):
        super().__init__()
        self.emb_layers = nn.Sequential(nn.SiLU(),
                                        nn.Linear(time_embed_dim, 2 * latent_dim))
        self.norm = nn.LayerNorm(latent_dim)
        self.out_layers = nn.Sequential(nn.SiLU(), nn.Dropout(0.0),
                                        nn.Linear(latent_dim, latent_dim))

    def forward(self, h, emb):
        emb_out = self.emb_layers(emb).unsqueeze(1)
        scale, shift = torch.chunk(emb_out, 2, dim=2)
        h = self.norm(h) * (1 + scale) + shift
        return self.out_layers(h)


class TCosineGate(nn.Module):
    def __init__(self, model_dim, num_experts, proj_dim=256):
        super().__init__()
        self.cosine_projector = nn.Linear(model_dim, proj_dim)
        self.sim_matrix = nn.Parameter(torch.randn(proj_dim, num_experts))
        self.temperature = nn.Parameter(torch.zeros(1))

    def forward(self, x):
        proj = F.normalize(self.cosine_projector(x.float()), dim=1)
        sim = F.normalize(self.sim_matrix, dim=0)
        scale = torch.clamp(self.temperature, max=math.log(100.0)).exp()
        return (proj @ sim) * scale


class TExperts(nn.Module):
    """tutel FusedExpertsNetwork parameter layout (tutel/experts/ffn.py):
    fc1 [E, F, D] in nn.Linear [out, in] convention (forward multiplies by
    its permute(0, 2, 1)); fc2 [E, F, D_out] used directly."""

    def __init__(self, E, D, F_, Dout):
        super().__init__()
        self.batched_fc1_w = nn.Parameter(torch.randn(E, F_, D))
        self.batched_fc1_bias = nn.Parameter(torch.randn(E, 1, F_))
        self.batched_fc2_w = nn.Parameter(torch.randn(E, F_, Dout))
        self.batched_fc2_bias = nn.Parameter(torch.randn(E, 1, Dout))


class TTutelMoE(nn.Module):
    def __init__(self, model_dim, ffn_dim, num_experts, topk,
                 capacity_factor=1.5):
        super().__init__()
        self.gates = nn.ModuleList([TCosineGate(model_dim, num_experts)])
        self.experts = TExperts(num_experts, model_dim, ffn_dim, model_dim)
        self.E, self.k = num_experts, topk
        self.capacity_factor = capacity_factor

    def forward(self, x):
        N, D = x.shape
        scores = F.softmax(self.gates[0](x), dim=1)
        topv, topi = torch.topk(scores, self.k, dim=1)
        gates = topv / (topv.sum(dim=1, keepdim=True) + 1e-9)
        capacity = self.k * int(self.capacity_factor * math.ceil(N / self.E))
        counts = torch.bincount(topi.reshape(-1), minlength=self.E)
        assert int(counts.max()) <= capacity, \
            f"capacity overflow ({int(counts.max())} > {capacity}): reseed the test"
        w1 = self.experts.batched_fc1_w.permute(0, 2, 1)  # [E, D, F]
        y = torch.zeros(N, self.experts.batched_fc2_w.shape[2])
        for j in range(self.k):
            e = topi[:, j]
            h = F.gelu(torch.einsum("nd,ndf->nf", x, w1[e])
                       + self.experts.batched_fc1_bias[e, 0])
            o = (torch.einsum("nf,nfo->no", h, self.experts.batched_fc2_w[e])
                 + self.experts.batched_fc2_bias[e, 0])
            y = y + gates[:, j, None] * o
        return y


class TMOE(nn.Module):
    """Reference MOE wrapper (st_attention.py:17-56)."""

    def __init__(self, num_experts, topk, input_dim, ffn_dim, output_dim,
                 num_heads, max_seq_len):
        super().__init__()
        self.proj = nn.Linear(input_dim, output_dim)
        self.activation = nn.GELU()
        self.model = TTutelMoE(input_dim, ffn_dim, num_experts, topk)
        self.embedding = nn.Parameter(
            torch.randn(1, max_seq_len, num_heads, input_dim))

    def forward(self, x):
        B, T, H, D = x.shape
        x = x + self.embedding[:, :T, :, :]
        y = self.proj(self.activation(self.model(x.reshape(-1, D))))
        return y.reshape(B, T, H, -1)


class TEffSelfAttn(nn.Module):
    """efficient_attention.py:9-46 with time_embed_dim=None."""

    def __init__(self, latent_dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.norm = nn.LayerNorm(latent_dim)
        self.query = nn.Linear(latent_dim, latent_dim)
        self.key = nn.Linear(latent_dim, latent_dim)
        self.value = nn.Linear(latent_dim, latent_dim)

    def forward(self, x, src_mask):
        B, T, D = x.shape
        H = self.num_heads
        query = F.softmax(self.query(self.norm(x)).view(B, T, H, -1), dim=-1)
        key = F.softmax((self.key(self.norm(x))
                         + (1 - src_mask) * -1000000).view(B, T, H, -1), dim=1)
        value = (self.value(self.norm(x)) * src_mask).view(B, T, H, -1)
        attention = torch.einsum("bnhd,bnhl->bhdl", key, value)
        y = torch.einsum("bnhd,bhdl->bnhl", query, attention).reshape(B, T, D)
        return x + y


class TSTMA(nn.Module):
    """st_attention.py:64-179 (eval; static + optional dynamic body)."""

    def __init__(self, latent_dim, text_latent_dim, num_heads, num_text_heads,
                 num_experts, topk, ffn_dim, time_embed_dim, max_seq_len,
                 max_text_seq_len, static_body=True, dynamic_body=False,
                 **unused):
        super().__init__()
        self.latent_dim, self.num_heads = latent_dim, num_heads
        self.num_text_heads = num_text_heads
        self.static_body, self.dynamic_body = static_body, dynamic_body
        self.norm = nn.LayerNorm(latent_dim)
        self.text_norm = nn.LayerNorm(text_latent_dim)
        self.text_moe = TMOE(num_experts, topk, text_latent_dim,
                             text_latent_dim * 4, 2 * latent_dim,
                             num_text_heads, max_text_seq_len)
        self.motion_moe = TMOE(num_experts, topk, latent_dim, latent_dim * 4,
                               4 * latent_dim, num_heads, max_seq_len)
        self.body_weight = nn.Parameter(torch.randn(num_heads, num_heads))
        if dynamic_body:
            self.body_d_attn = TEffSelfAttn(latent_dim, 8)
        self.proj_out = TStylization(latent_dim * num_heads, time_embed_dim)

    def forward(self, x, xf, emb, src_mask, cond_type):
        B, T, D = x.shape
        H, L = self.num_heads, self.latent_dim
        N = xf.shape[1] + T
        x = x.reshape(B, T, H, -1)
        text_feat = xf.reshape(B, xf.shape[1], self.num_text_heads, -1)
        text_feat = self.text_moe(self.text_norm(text_feat))
        motion_feat = self.motion_moe(self.norm(x))

        body_weight = F.softmax(self.body_weight, dim=1)
        body_value = motion_feat[:, :, :, :L]
        body_feat = body_value
        if self.static_body:
            body_feat = torch.einsum("hl,bnld->bnhd", body_weight, body_value)
        body_feat = body_feat.reshape(B, T, D)
        if self.dynamic_body:
            d_body = self.body_d_attn(body_value.reshape(B * T, H, -1),
                                      torch.ones(B * T, H, 1))
            body_feat = body_feat + d_body.reshape(B, T, D)

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
        value_motion = motion_feat[:, :, :, 2 * L:3 * L] * src_mask
        value = torch.cat((value_text, value_motion), dim=1).view(B, N, H, -1)
        query = F.softmax(motion_feat[:, :, :, 3 * L:].view(B, T, H, -1), dim=-1)
        attention = torch.einsum("bnhd,bnhl->bhdl", key, value)
        y_t = torch.einsum("bnhd,bhdl->bnhl", query, attention).reshape(B, T, D)
        return x.reshape(B, T, D) + self.proj_out(body_feat + y_t, emb)


class TSFFN(nn.Module):
    """stmogen.py:581-607."""

    def __init__(self, latent_dim, ffn_dim, num_heads, time_embed_dim):
        super().__init__()
        self.num_heads = num_heads
        self.linear1_list = nn.ModuleList(
            nn.Linear(latent_dim, ffn_dim) for _ in range(num_heads))
        self.linear2_list = nn.ModuleList(
            nn.Linear(ffn_dim, latent_dim) for _ in range(num_heads))
        self.activation = nn.GELU()
        self.proj_out = TStylization(latent_dim * num_heads, time_embed_dim)

    def forward(self, x, emb):
        B, T, D = x.shape
        x = x.reshape(B, T, self.num_heads, -1)
        outs = [self.linear2_list[i](self.activation(self.linear1_list[i](
            x[:, :, i]))) for i in range(self.num_heads)]
        y = torch.cat(outs, dim=-1)
        return x.reshape(B, T, D) + self.proj_out(y, emb)


class TDecoderLayer(nn.Module):
    def __init__(self, stma_kwargs, latent_dim, ffn_dim, num_heads,
                 time_embed_dim):
        super().__init__()
        self.ca_block = TSTMA(**stma_kwargs)
        self.ffn = TSFFN(latent_dim, ffn_dim, num_heads, time_embed_dim)

    def forward(self, x, xf, emb, src_mask, cond_type):
        x = self.ca_block(x, xf, emb, src_mask, cond_type)
        return self.ffn(x, emb)


class TPoseEncoder(nn.Module):
    """stmogen.py:140-378, motionx, patch_size=1, no gnn."""

    def __init__(self, latent_dim, input_dim=322):
        super().__init__()
        self.slices = smplx_slices()
        for name, sl in self.slices.items():
            setattr(self, f"{name}_embed", nn.Linear(len(sl), latent_dim))
        self.body_slice = sum(self.slices.values(), [])
        assert len(set(self.body_slice)) == input_dim
        self.body_embed = nn.Linear(len(self.body_slice), latent_dim)

    def forward(self, motion):
        feats = [getattr(self, f"{n}_embed")(motion[:, :, sl])
                 for n, sl in self.slices.items()]
        feats.append(self.body_embed(motion[:, :, self.body_slice]))
        return torch.cat(feats, dim=-1)


class TPoseDecoder(nn.Module):
    """stmogen.py:381-578, motionx, patch_size=1."""

    def __init__(self, latent_dim, output_dim=322):
        super().__init__()
        self.latent_dim, self.output_dim = latent_dim, output_dim
        self.slices = smplx_slices()
        for name, sl in self.slices.items():
            setattr(self, f"{name}_out", nn.Linear(latent_dim, len(sl)))
        self.body_slice = sum(self.slices.values(), [])
        self.body_out = nn.Linear(latent_dim, len(self.body_slice))

    def forward(self, motion):
        B, T = motion.shape[:2]
        D = self.latent_dim
        output = torch.zeros(B, T, self.output_dim)
        for i, (name, sl) in enumerate(self.slices.items()):
            output[:, :, sl] = getattr(self, f"{name}_out")(
                motion[:, :, i * D:(i + 1) * D])
        # the whole-body head's output is added RAW in plain feature order —
        # the reference does NOT scatter it through body_slice
        # (stmogen.py:541-558: `output = (output + body_feat) / 2.0`)
        body = self.body_out(motion[:, :, len(self.slices) * D:])
        return (output + body) / 2.0


class TQuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class TClipBlock(nn.Module):
    def __init__(self, width, heads):
        super().__init__()
        self.attn = nn.MultiheadAttention(width, heads)
        self.ln_1 = nn.LayerNorm(width)
        from collections import OrderedDict
        self.mlp = nn.Sequential(OrderedDict([
            ("c_fc", nn.Linear(width, width * 4)),
            ("gelu", TQuickGELU()),
            ("c_proj", nn.Linear(width * 4, width))]))
        self.ln_2 = nn.LayerNorm(width)

    def forward(self, x, attn_mask):  # [T, B, C]
        a = self.ln_1(x)
        x = x + self.attn(a, a, a, need_weights=False, attn_mask=attn_mask)[0]
        return x + self.mlp(self.ln_2(x))


class TClipTransformer(nn.Module):
    def __init__(self, width, layers, heads):
        super().__init__()
        self.resblocks = nn.ModuleList(TClipBlock(width, heads)
                                       for _ in range(layers))

    def forward(self, x, attn_mask):
        for blk in self.resblocks:
            x = blk(x, attn_mask)
        return x


class TClip(nn.Module):
    def __init__(self, width, layers, vocab=49408, context=77):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab, width)
        self.positional_embedding = nn.Parameter(torch.zeros(context, width))
        self.transformer = TClipTransformer(width, layers, max(1, width // 64))
        self.ln_final = nn.LayerNorm(width)


class TSTMoGen(nn.Module):
    """Reference STMoGenTransformer forward_test (stmogen.py:626-761 +
    diffusion_transformer.py:109-238), eval mode."""

    def __init__(self, m):
        super().__init__()
        ca = m["ca_block_cfg"]
        te = m["text_encoder"]
        ffn = m["ffn_cfg"]
        self.latent_dim = m["latent_dim"]
        self.scale = m["scale_func_cfg"]["scale"]
        self.sequence_embedding = nn.Parameter(
            torch.zeros(m["max_seq_len"], m["latent_dim"]))
        self.joint_embed = TPoseEncoder(m["pose_encoder_cfg"]["latent_dim"],
                                        m["input_feats"])
        self.out = TPoseDecoder(m["pose_decoder_cfg"]["latent_dim"],
                                m["input_feats"])
        self.time_embed = nn.Sequential(
            nn.Linear(m["latent_dim"], m["time_embed_dim"]), nn.SiLU(),
            nn.Linear(m["time_embed_dim"], m["time_embed_dim"]))
        stma_kwargs = dict(
            latent_dim=ca["latent_dim"], text_latent_dim=ca["text_latent_dim"],
            num_heads=ca["num_heads"], num_text_heads=ca["num_text_heads"],
            num_experts=ca["num_experts"], topk=ca["topk"],
            ffn_dim=ca["ffn_dim"], time_embed_dim=ca["time_embed_dim"],
            max_seq_len=ca["max_seq_len"],
            max_text_seq_len=ca["max_text_seq_len"],
            static_body=ca.get("static_body", True),
            dynamic_body=ca.get("dynamic_body", False))
        self.temporal_decoder_blocks = nn.ModuleList(
            TDecoderLayer(stma_kwargs, ffn["latent_dim"], ffn["ffn_dim"],
                          ffn["num_heads"], ffn["time_embed_dim"])
            for _ in range(m["num_layers"]))
        self.clip = TClip(te["clip_width"], te["clip_layers"])
        self.text_pre_proj = nn.Linear(te["clip_width"], te["latent_dim"])
        enc_layer = nn.TransformerEncoderLayer(
            d_model=te["latent_dim"], nhead=te.get("num_heads", 4),
            dim_feedforward=te["ff_size"], dropout=0.0, activation="gelu")
        self.textTransEncoder = nn.TransformerEncoder(
            enc_layer, num_layers=te["num_layers"])
        self.text_ln = nn.LayerNorm(te["latent_dim"])

    def encode_text(self, text_ids):
        T = text_ids.shape[1]
        x = self.clip.token_embedding(text_ids)
        x = x + self.clip.positional_embedding[:T]
        x = x.permute(1, 0, 2)  # [T, B, C]
        mask = torch.full((T, T), float("-inf")).triu(1)
        x = self.clip.transformer(x, mask)
        x = self.clip.ln_final(x)
        x = self.text_pre_proj(x)
        x = self.textTransEncoder(x)
        x = self.text_ln(x)
        return x.permute(1, 0, 2)  # [B, T, P]

    def forward_test(self, motion, timesteps, motion_mask, xf_out):
        B, T, _ = motion.shape
        src_mask = motion_mask.unsqueeze(-1)
        emb = self.time_embed(t_timestep_embedding(timesteps, self.latent_dim))
        h = self.joint_embed(motion) + self.sequence_embedding[None, :T]

        cond = torch.cat((torch.ones(B, 1, 1), torch.zeros(B, 1, 1)), dim=0)
        h = h.repeat(2, 1, 1)
        xf2 = xf_out.repeat(2, 1, 1)
        emb2 = emb.repeat(2, 1)
        mask2 = src_mask.repeat(2, 1, 1)
        for blk in self.temporal_decoder_blocks:
            h = blk(h, xf2, emb2, mask2, cond)
        out = self.out(h)
        t = int(timesteps[0])
        w = (1 - (1000 - t) / 1000) * self.scale + 1
        return out[:B] * w + out[B:] * (1 - w)


# --------------------------------------------------------------------------
def test_stmogen_full_forward_parity():
    import flax

    cfg = tiny_t2m_cfg()
    m = cfg["model"]
    # 4 experts: tutel capacity (k*int(1.5*ceil(N/E))) then sits far above
    # the expected per-expert load, keeping the comparison in the no-drop
    # regime the real protocol runs in (asserted inside TTutelMoE)
    m["ca_block_cfg"]["num_experts"] = 4
    arch = build_architecture(cfg)
    batch = make_text_batch(["a person walks forward", "someone waves hello"],
                            max_seq_len=16)
    batch["motion"] = np.random.RandomState(3).randn(
        *batch["motion"].shape).astype(np.float32)
    batch["motion_length"] = np.array([[16], [11]], np.int32)
    batch["motion_mask"] = (np.arange(16)[None, :]
                            < batch["motion_length"]).astype(np.float32)

    variables = flax.core.unfreeze(arch.init(jax.random.PRNGKey(0), batch))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    sd = fabricate_torch_sd(params, m["num_layers"], m["ffn_cfg"]["num_heads"],
                            m["text_encoder"]["num_layers"],
                            m["text_encoder"]["clip_layers"])
    # tame magnitudes so deep compositions of random weights stay in a sane
    # numeric range (parity is invariant to this common rescale)
    sd = {k: (v * (1.0 / np.sqrt(max(v.shape[-1], 4)))).astype(np.float32)
          for k, v in sd.items()}
    for k in list(sd):
        if k.endswith("temperature"):
            sd[k] = np.zeros_like(sd[k])  # gate logit scale e^0 = 1
        elif k.endswith("moe.embedding"):
            # large iid per-(pos, head) MoE embeddings decorrelate the gate
            # inputs so routing spreads across experts (no-drop regime)
            sd[k] = (sd[k] * 8.0).astype(np.float32)

    # ---- flax side: convert + forward
    tree = convert_stmogen(sd, m["num_layers"], m["ffn_cfg"]["num_heads"],
                           m["text_encoder"]["num_layers"],
                           m["text_encoder"]["clip_layers"])
    _tree_update(params, tree)
    variables["params"] = params
    xf_flax = arch.encode_text(variables, batch["text_ids"])
    timesteps = np.full((2,), 499, np.int32)
    # jit (persistent-cached): the eager flax apply dominates test wall-clock
    out_flax = np.asarray(jax.jit(
        lambda v, m_, t_, mask, ml, xf_: arch.model.apply(
            v, m_, t_, motion_mask=mask, motion_length=ml, xf_out=xf_,
            mode="test"))(
        variables, batch["motion"], timesteps,
        batch["motion_mask"], batch["motion_length"], xf_flax))

    # ---- torch side: load the SAME checkpoint into the re-statement
    model = TSTMoGen(m).eval()
    # strict=True proves the fabricated checkpoint covers the re-statement's
    # full parameter surface (no silently-unmapped weights on either side)
    model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True)
    xf_torch = model.encode_text(torch.from_numpy(
        np.asarray(batch["text_ids"], np.int64)))
    np.testing.assert_allclose(np.asarray(xf_flax), xf_torch.numpy(),
                               atol=1e-4, rtol=1e-3)

    out_torch = model.forward_test(
        torch.from_numpy(batch["motion"]),
        torch.from_numpy(timesteps.astype(np.int64)),
        torch.from_numpy(batch["motion_mask"]), xf_torch).numpy()

    scale = max(1.0, float(np.abs(out_torch).max()))
    diff = float(np.abs(out_flax - out_torch).max())
    assert diff < 1e-4 * scale, (diff, scale)
