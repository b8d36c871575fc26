"""End-to-end ReMoDiffuse / MoMatMoGen checkpoint-conversion parity.

Independent torch re-statement of the reference retrieval-augmented eval
forward (/root/reference/mogen/models/transformers/remodiffuse.py:202-341,
momatmogen.py:50-, attentions/semantics_modulated.py:18-189, and the
RetrievalDatabase learned re-encoders remodiffuse.py:84-201).  A fabricated
checkpoint loads strict into the re-statement AND through
``convert_remodiffuse``; re-encoded retrieval features, the 4-way-CFG
denoiser output, and the host-side retrieval ranking must all agree.
"""

import os
import sys

import jax
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import motioncraft_tpu.models  # noqa: F401
from motioncraft_tpu.models.baselines import (MoMatMoGenTransformer,
                                              ReMoDiffuseTransformer,
                                              RetrievalDatabase)
from motioncraft_tpu.models.tokenizer import tokenize
from motioncraft_tpu.utils.torch_convert import (_tree_update,
                                                 convert_remodiffuse)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import fabricate_torch as fab  # noqa: E402
from test_stmogen_forward_parity import (TClip, TStylization,  # noqa: E402
                                         t_timestep_embedding)

import pytest

pytestmark = pytest.mark.parity

torch.set_grad_enabled(False)

# tiny shapes shared by both models
B, T, D_IN, LAT, HEADS = 2, 16, 32, 24, 4
TEXT_LAT, CLIP_W, CLIP_LAYERS, TEXT_LAYERS = 16, 32, 1, 2
R, BANK_T, BANK_N, STRIDE, CLIP_SEQ_T = 2, 12, 8, 4, 5
N_MOTION_LAYERS, RETR_TEXT_LAYERS, TIME_EMB = 2, 2, 32


class TSemMod(nn.Module):
    """semantics_modulated.py:18-85 (dual=False) / :88-189 (dual=True)."""

    def __init__(self, latent_dim, text_latent_dim, num_heads, time_embed_dim,
                 dual=False):
        super().__init__()
        self.num_heads = num_heads
        self.latent_dim = latent_dim
        self.dual = dual
        self.norm = nn.LayerNorm(latent_dim)
        self.text_norm = nn.LayerNorm(text_latent_dim)
        self.query = nn.Linear(latent_dim, latent_dim)
        self.key_text = nn.Linear(text_latent_dim, latent_dim)
        self.value_text = nn.Linear(text_latent_dim, latent_dim)
        self.key_motion = nn.Linear(latent_dim, latent_dim)
        self.value_motion = nn.Linear(latent_dim, latent_dim)
        self.retr_norm1 = nn.LayerNorm(2 * latent_dim)
        self.retr_norm2 = nn.LayerNorm(latent_dim)
        self.key_retr = nn.Linear(2 * latent_dim, latent_dim)
        self.value_retr = nn.Linear(latent_dim, latent_dim)
        if dual:
            self.key_inter = nn.Linear(latent_dim, latent_dim)
            self.value_inter = nn.Linear(latent_dim, latent_dim)
        self.proj_out = TStylization(latent_dim, time_embed_dim)

    def _shared(self, x_all, xf, cond_type, re_dict):
        Bb = xf.shape[0]
        re_motion, re_text = re_dict["re_motion"], re_dict["re_text"]
        re_mask = re_dict["re_mask"].reshape(Bb, -1, 1)
        text_cond = (cond_type % 10 > 0).float()
        retr_cond = (cond_type // 10 > 0).float()
        re_text = re_text.repeat(1, 1, re_motion.shape[2], 1)
        re_feat_key = torch.cat((re_motion, re_text), dim=-1)
        re_feat_key = re_feat_key.reshape(Bb, -1, 2 * self.latent_dim)
        key_text = self.key_text(self.text_norm(xf)) + (1 - text_cond) * -1000000
        key_retr = (self.key_retr(self.retr_norm1(re_feat_key))
                    + (1 - retr_cond) * -1000000 + (1 - re_mask) * -1000000)
        re_feat_value = re_motion.reshape(Bb, -1, self.latent_dim)
        value_text = self.value_text(self.text_norm(xf)) * text_cond
        value_retr = (self.value_retr(self.retr_norm2(re_feat_value))
                      * retr_cond * re_mask)
        return key_text, key_retr, value_text, value_retr

    def _attend(self, query, key, value, Bb, Tt):
        H = self.num_heads
        N = key.shape[1]
        query = F.softmax(query.view(Bb, Tt, H, -1), dim=-1)
        key = F.softmax(key.view(Bb, N, H, -1), dim=1)
        value = value.view(Bb, N, H, -1)
        attention = torch.einsum("bnhd,bnhl->bhdl", key, value)
        return torch.einsum("bnhd,bhdl->bnhl", query, attention).reshape(
            Bb, Tt, self.latent_dim)

    def forward(self, x, xf, emb, src_mask, cond_type, re_dict):
        if not self.dual:
            Bb, Tt, D = x.shape
            kt, kr, vt, vr = self._shared(x, xf, cond_type, re_dict)
            key_motion = self.key_motion(self.norm(x)) + (1 - src_mask) * -1000000
            key = torch.cat((kt, kr, key_motion), dim=1)
            value = torch.cat((vt, vr, self.value_motion(self.norm(x)) * src_mask),
                              dim=1)
            y = self._attend(self.query(self.norm(x)), key, value, Bb, Tt)
            return x + self.proj_out(y, emb)
        L = self.latent_dim
        x1, x2 = x[:, :, :L].contiguous(), x[:, :, L:].contiguous()
        Bb, Tt, D = x1.shape
        kt, kr, vt, vr = self._shared(x1, xf, cond_type, re_dict)
        n1, n2 = self.norm(x1), self.norm(x2)
        neg = lambda k: k + (1 - src_mask) * -1000000
        key1 = torch.cat((kt, kr, neg(self.key_motion(n1)), neg(self.key_inter(n2))), dim=1)
        key2 = torch.cat((kt, kr, neg(self.key_motion(n2)), neg(self.key_inter(n1))), dim=1)
        val1 = torch.cat((vt, vr, self.value_motion(n1) * src_mask,
                          self.value_inter(n2) * src_mask), dim=1)
        val2 = torch.cat((vt, vr, self.value_motion(n2) * src_mask,
                          self.value_inter(n1) * src_mask), dim=1)
        y1 = self._attend(self.query(n1), key1, val1, Bb, Tt)
        y2 = self._attend(self.query(n2), key2, val2, Bb, Tt)
        return torch.cat((x1 + self.proj_out(y1, emb),
                          x2 + self.proj_out(y2, emb)), dim=-1)


class TFFNStyl(nn.Module):
    """diffusion_transformer.py:15-28 (exact-GELU + StylizationBlock)."""

    def __init__(self, latent_dim, ffn_dim, time_embed_dim):
        super().__init__()
        self.linear1 = nn.Linear(latent_dim, ffn_dim)
        self.linear2 = nn.Linear(ffn_dim, latent_dim)
        self.proj_out = TStylization(latent_dim, time_embed_dim)

    def forward(self, x, emb):
        y = self.linear2(F.gelu(self.linear1(x)))
        return x + self.proj_out(y, emb)


class TDualFFN(TFFNStyl):
    """momatmogen.py:12-31 — one weight set applied to each person's half."""

    def forward(self, x, emb):
        L = self.linear1.in_features
        return torch.cat((super().forward(x[:, :, :L], emb),
                          super().forward(x[:, :, L:], emb)), dim=-1)


class TEffSelfPlain(nn.Module):
    """efficient_attention.py:9-46 with time_embed_dim=None (database path)."""

    def __init__(self, latent_dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.norm = nn.LayerNorm(latent_dim)
        self.query = nn.Linear(latent_dim, latent_dim)
        self.key = nn.Linear(latent_dim, latent_dim)
        self.value = nn.Linear(latent_dim, latent_dim)

    def forward(self, x, src_mask):
        Bb, Tt, D = x.shape
        H = self.num_heads
        query = F.softmax(self.query(self.norm(x)).view(Bb, Tt, H, -1), dim=-1)
        key = F.softmax((self.key(self.norm(x))
                         + (1 - src_mask) * -1000000).view(Bb, Tt, H, -1), dim=1)
        value = (self.value(self.norm(x)) * src_mask).view(Bb, Tt, H, -1)
        attention = torch.einsum("bnhd,bnhl->bhdl", key, value)
        y = torch.einsum("bnhd,bhdl->bnhl", query, attention).reshape(Bb, Tt, D)
        return x + y


class TPlainFFN(nn.Module):
    """remodiffuse.py:15-27 — plain residual FFN, no stylization."""

    def __init__(self, latent_dim, ffn_dim):
        super().__init__()
        self.linear1 = nn.Linear(latent_dim, ffn_dim)
        self.linear2 = nn.Linear(ffn_dim, latent_dim)

    def forward(self, x):
        return x + self.linear2(F.gelu(self.linear1(x)))


class TDatabase(nn.Module):
    """RetrievalDatabase learned re-encoders (remodiffuse.py:84-201), taking
    the gathered bank rows directly (the ranking itself is host numpy)."""

    def __init__(self, latent_dim, motion_feats, num_motion_layers,
                 num_text_layers, num_heads, ff_size, max_seq_len, stride,
                 num_retrieval):
        super().__init__()
        self.stride, self.num_retrieval = stride, num_retrieval
        self.motion_proj = nn.Linear(motion_feats, latent_dim)
        self.motion_pos_embedding = nn.Parameter(torch.randn(max_seq_len,
                                                             latent_dim))
        self.motion_encoder_blocks = nn.ModuleList()
        for _ in range(num_motion_layers):
            blk = nn.Module()
            blk.sa_block = TEffSelfPlain(latent_dim, num_heads)
            blk.ffn = TPlainFFN(latent_dim, ff_size)
            self.motion_encoder_blocks.append(blk)
        enc_layer = nn.TransformerEncoderLayer(d_model=latent_dim,
                                               nhead=num_heads,
                                               dim_feedforward=ff_size,
                                               dropout=0.0, activation="gelu")
        self.text_encoder = nn.TransformerEncoder(enc_layer,
                                                  num_layers=num_text_layers)

    def forward(self, all_motions, src_mask, all_text_seq_features):
        Bb = all_motions.shape[0] // self.num_retrieval
        Tt = all_motions.shape[1]
        re_motion = self.motion_proj(all_motions) + \
            self.motion_pos_embedding.unsqueeze(0)[:, :Tt]
        for blk in self.motion_encoder_blocks:
            re_motion = blk.ffn(blk.sa_block(re_motion, src_mask.unsqueeze(-1)))
        re_motion = re_motion.view(Bb, self.num_retrieval, Tt, -1)
        re_motion = re_motion[:, :, ::self.stride, :]
        re_mask = src_mask[:, ::self.stride].reshape(Bb, self.num_retrieval, -1)
        re_text = self.text_encoder(all_text_seq_features.permute(1, 0, 2))
        re_text = re_text.permute(1, 0, 2).view(
            Bb, self.num_retrieval, all_text_seq_features.shape[1], -1)[:, :, -1:, :]
        return dict(re_motion=re_motion, re_text=re_text, re_mask=re_mask)


class TReMo(nn.Module):
    """ReMoDiffuseTransformer eval forward (remodiffuse.py:202-341),
    use_text_proj=False; 4-way CFG with the deterministic t<=100 branch."""

    def __init__(self, m, dual=False):
        super().__init__()
        te, rc = m["text_encoder"], m["retrieval_cfg"]
        L = m["latent_dim"]
        self.latent_dim = L
        self.dual = dual
        self.scale_func_cfg = m["scale_func_cfg"]
        self.sequence_embedding = nn.Parameter(torch.zeros(m["max_seq_len"], L))
        self.joint_embed = nn.Linear(m["input_feats"], L)
        self.out = nn.Linear(L, m["input_feats"])
        self.time_embed = nn.Sequential(
            nn.Linear(L, m["time_embed_dim"]), nn.SiLU(),
            nn.Linear(m["time_embed_dim"], m["time_embed_dim"]))
        self.clip = TClip(te["clip_width"], te["clip_layers"])
        self.text_pre_proj = nn.Linear(te["clip_width"], te["latent_dim"])
        enc_layer = nn.TransformerEncoderLayer(
            d_model=te["latent_dim"], nhead=te.get("num_heads", 4),
            dim_feedforward=te["ff_size"], dropout=0.0, activation="gelu")
        self.textTransEncoder = nn.TransformerEncoder(
            enc_layer, num_layers=te["num_layers"])
        self.text_ln = nn.LayerNorm(te["latent_dim"])
        self.database = TDatabase(
            rc["latent_dim"], rc["motion_feats"], rc["num_motion_layers"],
            rc["num_layers"], rc["num_heads"], rc["ff_size"],
            rc["max_seq_len"], rc["stride"], rc["num_retrieval"])
        self.temporal_decoder_blocks = nn.ModuleList()
        for _ in range(m["num_layers"]):
            blk = nn.Module()
            blk.ca_block = TSemMod(L, te["latent_dim"], m["num_heads"],
                                   m["time_embed_dim"], dual=dual)
            ffn_cls = TDualFFN if dual else TFFNStyl
            blk.ffn = ffn_cls(L, m["ffn_cfg"]["ffn_dim"], m["time_embed_dim"])
            self.temporal_decoder_blocks.append(blk)

    def encode_text(self, text_ids):
        Tt = text_ids.shape[1]
        x = self.clip.token_embedding(text_ids)
        x = x + self.clip.positional_embedding[:Tt]
        x = x.permute(1, 0, 2)
        mask = torch.full((Tt, Tt), float("-inf")).triu(1)
        x = self.clip.transformer(x, mask)
        x = self.clip.ln_final(x)
        x = self.text_pre_proj(x)
        x = self.textTransEncoder(x)
        x = self.text_ln(x)
        return x.permute(1, 0, 2)

    def forward_test(self, motion, timesteps, motion_mask, xf_out, re_dict):
        Bb, Tt, _ = motion.shape
        src_mask = motion_mask.unsqueeze(-1)
        emb = self.time_embed(t_timestep_embedding(timesteps, self.latent_dim))
        if self.dual:
            m1 = motion[:, :, :self.joint_embed.in_features]
            m2 = motion[:, :, self.joint_embed.in_features:]
            h = torch.cat((self.joint_embed(m1) + self.sequence_embedding[None, :Tt],
                           self.joint_embed(m2) + self.sequence_embedding[None, :Tt]),
                          dim=-1)
        else:
            h = self.joint_embed(motion) + self.sequence_embedding[None, :Tt]
        cond = torch.cat((torch.full((Bb, 1, 1), 99.0), torch.full((Bb, 1, 1), 1.0),
                          torch.full((Bb, 1, 1), 10.0), torch.zeros(Bb, 1, 1)), dim=0)
        h = h.repeat(4, 1, 1)
        xf4 = xf_out.repeat(4, 1, 1)
        emb4 = emb.repeat(4, 1)
        mask4 = src_mask.repeat(4, 1, 1)
        re4 = {k: v.repeat(4, *([1] * (v.ndim - 1))) for k, v in re_dict.items()}
        for blk in self.temporal_decoder_blocks:
            h = blk.ffn(blk.ca_block(h, xf4, emb4, mask4, cond, re4), emb4)
        if self.dual:
            L = self.latent_dim
            out = torch.cat((self.out(h[:, :, :L]), self.out(h[:, :, L:])), dim=-1)
        else:
            out = self.out(h)
        assert int(timesteps[0]) <= 100, "test uses the deterministic branch"
        c = self.scale_func_cfg
        both, text, retr = c["both_coef"], c["text_coef"], c["retr_coef"]
        none = 1 - both - text - retr
        return (out[:Bb] * both + out[Bb:2 * Bb] * text
                + out[2 * Bb:3 * Bb] * retr + out[3 * Bb:] * none)


def _model_cfg():
    return dict(
        input_feats=D_IN, max_seq_len=T, latent_dim=LAT, time_embed_dim=TIME_EMB,
        num_layers=2, num_heads=HEADS,
        ca_block_cfg=dict(type="SemanticsModulatedAttention", latent_dim=LAT,
                          text_latent_dim=TEXT_LAT, num_heads=HEADS, dropout=0,
                          time_embed_dim=TIME_EMB),
        ffn_cfg=dict(latent_dim=LAT, ffn_dim=48, dropout=0,
                     time_embed_dim=TIME_EMB),
        text_encoder=dict(pretrained_model="clip", latent_dim=TEXT_LAT,
                          num_layers=TEXT_LAYERS, num_heads=4, ff_size=32,
                          dropout=0, use_text_proj=False, clip_width=CLIP_W,
                          clip_layers=CLIP_LAYERS),
        retrieval_cfg=dict(num_retrieval=R, topk=R, latent_dim=LAT,
                           motion_feats=D_IN, num_layers=RETR_TEXT_LAYERS,
                           num_motion_layers=N_MOTION_LAYERS, num_heads=HEADS,
                           ff_size=32, max_seq_len=BANK_T, stride=STRIDE),
        scale_func_cfg=dict(coarse_scale=4.0, both_coef=0.5, text_coef=0.25,
                            retr_coef=0.15))


def _flax_model(cls, m):
    kw = {k: v for k, v in m.items()
          if k not in ("num_heads", "ca_block_cfg", "retrieval_cfg")}
    rc = dict(m["retrieval_cfg"])
    rc["sa_block_cfg"] = dict(type="EfficientSelfAttention", latent_dim=LAT,
                              num_heads=HEADS, dropout=0)
    rc["ffn_cfg"] = dict(latent_dim=LAT, ffn_dim=32, dropout=0)
    ca = dict(m["ca_block_cfg"])
    if cls is MoMatMoGenTransformer:
        ca["type"] = "DualSemanticsModulatedAttention"
    return cls(ca_block_cfg=ca, retrieval_cfg=rc, **kw)


def _run_parity(cls, dual):
    import flax

    m = _model_cfg()
    model = _flax_model(cls, m)
    rng = np.random.RandomState(5)
    feats = 2 * D_IN if dual else D_IN
    motion = rng.randn(B, T, feats).astype(np.float32)
    motion_mask = (np.arange(T)[None, :] < np.array([[T], [T - 5]])).astype(np.float32)
    text_ids = np.asarray(tokenize(["a person walks", "someone jumps high"]))
    # gathered retrieval rows (B*R bank windows)
    bank_motions = rng.randn(B * R, BANK_T, D_IN).astype(np.float32)
    bank_mask = (np.arange(BANK_T)[None, :]
                 < np.array([[BANK_T], [9], [7], [BANK_T]])).astype(np.float32)
    bank_text = rng.randn(B * R, CLIP_SEQ_T, LAT).astype(np.float32)
    timesteps = np.full((B,), 77, np.int32)

    re_init = model.init(
        jax.random.PRNGKey(1), bank_motions, bank_mask, bank_text, R,
        method="encode_retrieval")
    variables = flax.core.unfreeze(model.init(
        jax.random.PRNGKey(0), motion, timesteps, motion_mask=motion_mask,
        motion_length=np.full((B, 1), T, np.int32), text_ids=text_ids,
        re_dict=jax.tree_util.tree_map(np.asarray, model.apply(
            re_init, bank_motions, bank_mask, bank_text, R,
            method="encode_retrieval")),
        method="init_all"))
    # init_all never routes through encode_retrieval, so graft the
    # separately-initialized retrieval_encoder subtree into the main params
    variables["params"]["retrieval_encoder"] = flax.core.unfreeze(
        re_init)["params"]["retrieval_encoder"]
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    sd = fab.remodiffuse_sd(params, np.random.RandomState(7), m["num_layers"],
                            N_MOTION_LAYERS, RETR_TEXT_LAYERS, TEXT_LAYERS,
                            CLIP_LAYERS, dual=dual)
    sd = {k: (v * (1.0 / np.sqrt(max(v.shape[-1], 4)))).astype(np.float32)
          for k, v in sd.items()}

    tree = convert_remodiffuse({"model." + k: v for k, v in sd.items()},
                               m["num_layers"], N_MOTION_LAYERS,
                               RETR_TEXT_LAYERS, TEXT_LAYERS, CLIP_LAYERS)
    _tree_update(params, tree)
    variables["params"] = params

    re_flax = jax.tree_util.tree_map(np.asarray, model.apply(
        variables, bank_motions, bank_mask, bank_text, R,
        method="encode_retrieval"))
    xf_flax = np.asarray(model.apply(variables, text_ids, method="encode_text"))
    # jit (persistent-cached): the eager flax apply dominates test wall-clock
    out_flax = np.asarray(jax.jit(
        lambda v, m_, t_, mask, ml, xf_, rd: model.apply(
            v, m_, t_, motion_mask=mask, motion_length=ml, xf_out=xf_,
            re_dict=rd, mode="test"))(
        variables, motion, timesteps, motion_mask,
        np.full((B, 1), T, np.int32), xf_flax, re_flax))

    tm = TReMo(m, dual=dual).eval()
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}, strict=True)
    re_t = tm.database(torch.from_numpy(bank_motions),
                       torch.from_numpy(bank_mask),
                       torch.from_numpy(bank_text))
    for k in ("re_motion", "re_text", "re_mask"):
        np.testing.assert_allclose(np.asarray(re_flax[k]), re_t[k].numpy(),
                                   atol=1e-5, rtol=1e-3, err_msg=k)
    xf_t = tm.encode_text(torch.from_numpy(np.asarray(text_ids, np.int64)))
    np.testing.assert_allclose(xf_flax, xf_t.numpy(), atol=1e-5, rtol=1e-3)
    out_t = tm.forward_test(torch.from_numpy(motion),
                            torch.from_numpy(timesteps.astype(np.int64)),
                            torch.from_numpy(motion_mask), xf_t, re_t).numpy()
    scale = max(1.0, float(np.abs(out_t).max()))
    assert float(np.abs(out_flax - out_t).max()) < 1e-4 * scale


def test_remodiffuse_full_forward_parity():
    _run_parity(ReMoDiffuseTransformer, dual=False)


def test_momatmogen_full_forward_parity():
    _run_parity(MoMatMoGenTransformer, dual=True)


def test_retrieval_ranking_matches_torch(tmp_path):
    """Host-side retrieve(): cosine x kinematic ranking == the reference's
    torch formulation (remodiffuse.py:120-144)."""
    rng = np.random.RandomState(3)
    n, d = 20, 8
    bank = dict(text_features=rng.randn(n, d).astype(np.float32),
                captions=np.array([f"cap {i}" for i in range(n)]),
                motions=rng.randn(n, BANK_T, D_IN).astype(np.float32),
                m_lengths=rng.randint(4, BANK_T + 1, size=n),
                clip_seq_features=rng.randn(n, CLIP_SEQ_T, LAT).astype(np.float32))
    f = tmp_path / "bank.npz"
    np.savez(f, **bank)
    db = RetrievalDatabase(num_retrieval=3, topk=3, retrieval_file=str(f))
    q = rng.randn(d).astype(np.float32)
    length = 9
    got = db.retrieve(q, length, "a query caption")

    rel = torch.abs(torch.from_numpy(bank["m_lengths"]) - length)
    rel = rel / torch.clamp(rel, min=length)
    sem = F.cosine_similarity(torch.from_numpy(bank["text_features"]),
                              torch.from_numpy(q)[None])
    score = sem * torch.exp(-rel * db.kinematic_coef)
    want = torch.argsort(score, descending=True)[:3].tolist()
    assert got == want
