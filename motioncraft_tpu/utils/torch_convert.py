"""PyTorch checkpoint -> flax param conversion.

torch (cpu) is used ONLY to deserialize released checkpoints; all compute is
JAX.  Key maps cover:
  - the SMPL-X contrastive evaluator (epoch=199.ckpt: 'textencoder.*' /
    'motionencoder.*' keys, t2m_bigru_smplx.py:418-437)
  - the HumanML3D BiGRU evaluator (movement/motion/text encoder sub-dicts)
  - OpenAI CLIP text tower weights
  - STMoGen / ControlNet denoiser checkpoints (mmcv naming, including the
    legacy 'temporal_decoder_blocks.N.*' -> '.N.base_block.*' ControlNet remap
    from controlnet.py:427-439)

Conventions: torch Linear weight [out, in] -> flax Dense kernel [in, out]
(transpose); LayerNorm weight/bias -> scale/bias; Conv1d weight [out, in, k]
-> flax Conv kernel [k, in, out].
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        # "model_state" is the EMAGE trainer format (other_tools.py:1005-1023)
        for key in ("state_dict", "model_state", "model", "module"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in obj.items()}


def _k(prefix, name):
    return f"{prefix}.{name}" if prefix else name


def t_linear(sd, prefix):
    out = {"kernel": sd[_k(prefix, "weight")].T}
    if _k(prefix, "bias") in sd:
        out["bias"] = sd[_k(prefix, "bias")]
    return out


def t_layernorm(sd, prefix):
    return {"scale": sd[_k(prefix, "weight")], "bias": sd[_k(prefix, "bias")]}


def t_conv1d(sd, prefix):
    w = sd[_k(prefix, "weight")]  # [out, in, k]
    out = {"kernel": np.transpose(w, (2, 1, 0))}
    if _k(prefix, "bias") in sd:
        out["bias"] = sd[_k(prefix, "bias")]
    return out


def t_embedding(sd, prefix):
    return {"embedding": sd[_k(prefix, "weight")]}


def t_mha(sd, prefix):
    """torch nn.MultiheadAttention -> our ClipAttention (fused in_proj)."""
    return {
        "in_proj": {"kernel": sd[_k(prefix, "in_proj_weight")].T,
                    "bias": sd[_k(prefix, "in_proj_bias")]},
        "out_proj": {"kernel": sd[_k(prefix, "out_proj.weight")].T,
                     "bias": sd[_k(prefix, "out_proj.bias")]},
    }


def t_postln_layer(sd, prefix):
    """torch nn.TransformerEncoderLayer -> PostLNEncoderLayer."""
    return {
        "self_attn": t_mha(sd, _k(prefix, "self_attn")),
        "linear1": t_linear(sd, _k(prefix, "linear1")),
        "linear2": t_linear(sd, _k(prefix, "linear2")),
        "norm1": t_layernorm(sd, _k(prefix, "norm1")),
        "norm2": t_layernorm(sd, _k(prefix, "norm2")),
    }


def _tree_update(dst: dict, src: dict):
    """Recursive in-place update with shape checking."""
    for k, v in src.items():
        if isinstance(v, dict):
            _tree_update(dst[k], v)
        else:
            want = np.asarray(dst[k]).shape
            got = np.asarray(v).shape
            if want != got:
                raise ValueError(f"shape mismatch for {k}: flax {want} vs torch {got}")
            dst[k] = np.asarray(v, dtype=np.float32)


def _unfreeze(params):
    import flax
    return flax.core.unfreeze(params) if hasattr(params, "unfreeze") or not isinstance(
        params, dict) else params


# -------------------------------------------------------------- evaluators
def convert_actor_agnostic(sd: Dict[str, np.ndarray], num_layers: int = 4) -> dict:
    out = {"skel_embedding": t_linear(sd, "skel_embedding"),
           "mu_token": sd["mu_token"], "logvar_token": sd["logvar_token"]}
    for i in range(num_layers):
        out[f"layer_{i}"] = t_postln_layer(sd, f"seqTransEncoder.layers.{i}")
    return out


def convert_distilbert(sd: Dict[str, np.ndarray], prefix: str = "text_model.") -> dict:
    g = lambda name: f"{prefix}{name}"
    out = {
        "word_embeddings": t_embedding(sd, g("embeddings.word_embeddings")),
        "position_embeddings": t_embedding(sd, g("embeddings.position_embeddings")),
        "emb_ln": t_layernorm(sd, g("embeddings.LayerNorm")),
    }
    for i in range(6):
        lp = g(f"transformer.layer.{i}")
        qw, kw, vw = (sd[f"{lp}.attention.{n}.weight"] for n in ("q_lin", "k_lin", "v_lin"))
        qb, kb, vb = (sd[f"{lp}.attention.{n}.bias"] for n in ("q_lin", "k_lin", "v_lin"))
        out[f"layer_{i}"] = {
            "self_attn": {
                "in_proj": {"kernel": np.concatenate([qw, kw, vw], axis=0).T,
                            "bias": np.concatenate([qb, kb, vb])},
                "out_proj": t_linear(sd, f"{lp}.attention.out_lin"),
            },
            "linear1": t_linear(sd, f"{lp}.ffn.lin1"),
            "linear2": t_linear(sd, f"{lp}.ffn.lin2"),
            "norm1": t_layernorm(sd, f"{lp}.sa_layer_norm"),
            "norm2": t_layernorm(sd, f"{lp}.output_layer_norm"),
        }
    return out


def load_smplx_evaluator_ckpt(path: str, motion_params, text_params,
                              num_layers: int = 4) -> Tuple[Any, Any]:
    """epoch=199.ckpt with 'motionencoder.*' / 'textencoder.*' keys."""
    import jax
    sd = load_torch_state_dict(path)
    msd = {k[len("motionencoder."):]: v for k, v in sd.items()
           if k.startswith("motionencoder.")}
    tsd = {k[len("textencoder."):]: v for k, v in sd.items()
           if k.startswith("textencoder.")}

    motion_params = jax.tree_util.tree_map(np.asarray, _unfreeze(motion_params))
    _tree_update(motion_params["params"], convert_actor_agnostic(msd, num_layers))

    text_params = jax.tree_util.tree_map(np.asarray, _unfreeze(text_params))
    t_out = {"projection": t_linear(tsd, "projection.1"),
             "mu_token": tsd["mu_token"], "logvar_token": tsd["logvar_token"],
             "text_model": convert_distilbert(tsd)}
    for i in range(num_layers):
        t_out[f"layer_{i}"] = t_postln_layer(tsd, f"seqTransEncoder.layers.{i}")
    _tree_update(text_params["params"], t_out)
    return motion_params, text_params


def load_t2m_evaluator_ckpt(path: str, movement_params, motion_params, text_params,
                            text_pos_params):
    """Guo et al. checkpoint: dict with movement/motion/text encoder sub-dicts."""
    import jax
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    to_np = lambda d: {k: v.detach().cpu().numpy() for k, v in d.items()}
    mov, mot, txt = (to_np(ckpt["movement_encoder"]), to_np(ckpt["motion_encoder"]),
                     to_np(ckpt["text_encoder"]))

    movement_params = jax.tree_util.tree_map(np.asarray, _unfreeze(movement_params))
    _tree_update(movement_params["params"], {
        "conv1": t_conv1d(mov, "main.0"), "conv2": t_conv1d(mov, "main.3"),
        "out_net": t_linear(mov, "out_net")})

    def gru_tree(sd):
        # torch GRU gate order (r,z,n) -> flax GRUCell {ir,iz,in,hr,hz,hn}
        H = sd["gru.bias_ih_l0"].shape[0] // 3
        def split3(a):
            return a[:H], a[H:2 * H], a[2 * H:]
        out = {}
        for direction, name in (("", "gru_fwd"), ("_reverse", "gru_bwd")):
            w_ih = sd[f"gru.weight_ih_l0{direction}"]
            w_hh = sd[f"gru.weight_hh_l0{direction}"]
            b_ih = sd[f"gru.bias_ih_l0{direction}"]
            b_hh = sd[f"gru.bias_hh_l0{direction}"]
            wr, wz, wn = split3(w_ih)
            hr, hz, hn = split3(w_hh)
            br, bz, bn = split3(b_ih)
            hbr, hbz, hbn = split3(b_hh)
            # flax GRUCell folds the hidden-path r/z biases into the input path
            # (hr/hz are bias-free); hn keeps its own bias like torch's b_hn.
            out[name] = {
                "ir": {"kernel": wr.T, "bias": br + hbr},
                "iz": {"kernel": wz.T, "bias": bz + hbz},
                "in": {"kernel": wn.T, "bias": bn},
                "hr": {"kernel": hr.T}, "hz": {"kernel": hz.T},
                "hn": {"kernel": hn.T, "bias": hbn},
            }
        return out

    def bigru_tree(sd):
        tree = {"input_emb": t_linear(sd, "input_emb"),
                "hidden": sd["hidden"].reshape(2, -1),
                "out1": t_linear(sd, "output_net.0"),
                "out_ln": t_layernorm(sd, "output_net.1"),
                "out2": t_linear(sd, "output_net.3")}
        tree.update(gru_tree(sd))
        return tree

    motion_params = jax.tree_util.tree_map(np.asarray, _unfreeze(motion_params))
    _tree_update(motion_params["params"], bigru_tree(mot))
    text_params = jax.tree_util.tree_map(np.asarray, _unfreeze(text_params))
    _tree_update(text_params["params"], bigru_tree(txt))
    text_pos_params = jax.tree_util.tree_map(np.asarray, _unfreeze(text_pos_params))
    _tree_update(text_pos_params["params"], {"kernel": txt["pos_emb.weight"].T,
                                             "bias": txt["pos_emb.bias"]})
    return movement_params, motion_params, text_params, text_pos_params


# ------------------------------------------------------------------ CLIP
def convert_clip_text(sd: Dict[str, np.ndarray], layers: int = 12) -> dict:
    """OpenAI CLIP state dict -> ClipTextModel params."""
    out = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": t_layernorm(sd, "ln_final"),
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        out[f"resblock_{i}"] = {
            "attn": t_mha(sd, f"{p}.attn"),
            "ln_1": t_layernorm(sd, f"{p}.ln_1"),
            "ln_2": t_layernorm(sd, f"{p}.ln_2"),
            "mlp_fc": t_linear(sd, f"{p}.mlp.c_fc"),
            "mlp_proj": t_linear(sd, f"{p}.mlp.c_proj"),
        }
    return out


def remap_controlnet_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Legacy ControlNet checkpoint key remap (controlnet.py:427-439):
    'temporal_decoder_blocks.N.xxx' -> 'temporal_decoder_blocks.N.base_block.xxx'
    unless already under base_block/control blocks."""
    out = {}
    pat = re.compile(r"^(model\.)?temporal_decoder_blocks\.(\d+)\.(?!base_block|control)")
    for k, v in sd.items():
        m = pat.match(k)
        if m:
            idx = m.end()
            k = k[:idx] + "base_block." + k[idx:]
        out[k] = v
    return out


# ----------------------------------------------------------------- STMoGen
def t_stylization(sd, prefix):
    """StylizationBlock: emb_layers(Sequential[SiLU, Linear]), norm,
    out_layers(Sequential[SiLU, Dropout, Linear])."""
    return {
        "emb_layers": t_linear(sd, _k(prefix, "emb_layers.1")),
        "norm": t_layernorm(sd, _k(prefix, "norm")),
        "out_layers": {"linear": t_linear(sd, _k(prefix, "out_layers.2"))},
    }


def t_moe(sd, prefix, num_heads_unused=None):
    """Reference MOE wrapper + tutel moe_layer -> our MOE/MoELayer tree.

    tutel parameter names: gates.0.{cosine_projector.{weight,bias}, sim_matrix,
    temperature} (CosineTopKGate) or gates.0.wg.weight (LinearTopKGate).
    tutel's FusedExpertsNetwork (tutel/experts/ffn.py) stores
    batched_fc1_w as [E, F, D] in nn.Linear [out, in] convention (forward
    multiplies by its permute(0, 2, 1)) while batched_fc2_w is [E, F, D_out]
    used directly; biases are [E, 1, *].  Our flax layout is expert_w1
    [E, D, F] (x @ w1) and expert_w2 [E, F, D] (h @ w2), so fc1 transposes
    and fc2 passes through.  The hidden dim F is read from fc1_bias so the
    mapping stays correct even for checkpoints where D == F."""
    g = lambda n: _k(prefix, n)
    out = {"embedding": sd[g("embedding")],
           "proj": t_linear(sd, g("proj"))}
    gate_prefix = g("model.gates.0")
    if f"{gate_prefix}.sim_matrix" in sd:
        gate = {"cosine_projector": t_linear(sd, f"{gate_prefix}.cosine_projector"),
                "sim_matrix": sd[f"{gate_prefix}.sim_matrix"],
                "temperature": sd[f"{gate_prefix}.temperature"].reshape(1)}
    else:
        gate = {"wg": {"kernel": sd[f"{gate_prefix}.wg.weight"].T}}
    b1 = sd[g("model.experts.batched_fc1_bias")]
    b2 = sd[g("model.experts.batched_fc2_bias")]
    w1 = sd[g("model.experts.batched_fc1_w")]
    hidden = b1.reshape(b1.shape[0], -1).shape[1]
    if w1.shape[1] == hidden and w1.shape[2] != hidden:
        w1 = w1.transpose(0, 2, 1)  # tutel [E, F, D] -> flax [E, D, F]
    elif w1.shape[1] == w1.shape[2]:
        w1 = w1.transpose(0, 2, 1)  # ambiguous square: tutel convention
    out["model"] = {
        "gate": gate,
        "expert_w1": w1,
        "expert_b1": b1.reshape(b1.shape[0], -1),
        "expert_w2": sd[g("model.experts.batched_fc2_w")],
        "expert_b2": b2.reshape(b2.shape[0], -1),
    }
    return out


def t_stma(sd, prefix):
    """STMA attention params (st_attention.py:64-179)."""
    g = lambda n: _k(prefix, n)
    out = {
        "norm": t_layernorm(sd, g("norm")),
        "text_norm": t_layernorm(sd, g("text_norm")),
        "text_moe": t_moe(sd, g("text_moe")),
        "motion_moe": t_moe(sd, g("motion_moe")),
        "body_weight": sd[g("body_weight")],
        "proj_out": t_stylization(sd, g("proj_out")),
    }
    if f"{g('body_d_attn')}.query.weight" in sd:
        out["body_d_attn"] = {
            "norm": t_layernorm(sd, g("body_d_attn.norm")),
            "query": t_linear(sd, g("body_d_attn.query")),
            "key": t_linear(sd, g("body_d_attn.key")),
            "value": t_linear(sd, g("body_d_attn.value")),
        }
    return out


def t_sffn(sd, prefix, num_heads):
    """SFFN per-head Linear lists -> stacked [H, d, f] einsum weights."""
    g = lambda n: _k(prefix, n)
    w1 = np.stack([sd[g(f"linear1_list.{i}.weight")].T for i in range(num_heads)])
    b1 = np.stack([sd[g(f"linear1_list.{i}.bias")] for i in range(num_heads)])
    w2 = np.stack([sd[g(f"linear2_list.{i}.weight")].T for i in range(num_heads)])
    b2 = np.stack([sd[g(f"linear2_list.{i}.bias")] for i in range(num_heads)])
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2,
            "proj_out": t_stylization(sd, g("proj_out"))}


def t_pose_io(sd, prefix, suffix):
    """PoseEncoder/Decoder: one Linear (or PatchEmbed conv) per body part."""
    parts = {}
    for name in ("head", "stem", "larm", "rarm", "lleg", "rleg", "root",
                 "trans", "face", "lhand", "rhand", "body"):
        key = _k(prefix, f"{name}_{suffix}")
        if f"{key}.weight" in sd:
            parts[f"{name}_{suffix}"] = t_linear(sd, key)
        elif f"{key}.proj.weight" in sd:  # PatchEmbed1D
            parts[f"{name}_{suffix}"] = {"proj": t_conv1d(sd, f"{key}.proj")}
    return parts


def convert_stmogen(sd: Dict[str, np.ndarray], num_layers: int,
                    num_heads: int, text_num_layers: int = 2,
                    clip_layers: int = 12) -> dict:
    """Full STMoGenTransformer checkpoint -> flax param tree.

    Accepts the released mmcv checkpoints ('model.' prefixed keys from
    MotionDiffusion) after remap_controlnet_keys when a control branch is
    present."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    out: dict = {
        "sequence_embedding": sd["sequence_embedding"],
        "time_embed": {"layers_0": t_linear(sd, "time_embed.0"),
                       "layers_2": t_linear(sd, "time_embed.2")},
        "joint_embed": t_pose_io(sd, "joint_embed", "embed"),
        "out": t_pose_io(sd, "out", "out"),
    }
    text = {"text_ln": t_layernorm(sd, "text_ln")}
    if "text_pre_proj.weight" in sd:
        text["text_pre_proj"] = t_linear(sd, "text_pre_proj")
    for i in range(text_num_layers):
        text[f"textTransEncoder_{i}"] = t_postln_layer(sd, f"textTransEncoder.layers.{i}")
    if "clip.token_embedding.weight" in sd:
        clip_sd = {k[len("clip."):]: v for k, v in sd.items() if k.startswith("clip.")}
        text["clip"] = convert_clip_text(clip_sd, clip_layers)
    out["text_enc"] = text

    for i in range(num_layers):
        p = f"temporal_decoder_blocks.{i}"
        out[f"block_{i}"] = {
            "ca_block": t_stma(sd, f"{p}.ca_block"),
            "ffn": t_sffn(sd, f"{p}.ffn", num_heads),
        }
    return out


def load_stmogen_ckpt(path: str, variables, num_layers: int, num_heads: int,
                      text_num_layers: int = 2, clip_layers: int = 12,
                      strict: bool = True):
    """Load a released STMoGen .pth into flax variables (shape-checked)."""
    import flax
    import jax
    sd = remap_controlnet_keys(load_torch_state_dict(path))
    tree = convert_stmogen(sd, num_layers, num_heads, text_num_layers, clip_layers)
    variables = jax.tree_util.tree_map(np.asarray, flax.core.unfreeze(variables))
    _tree_update(variables["params"], tree)
    return variables


def convert_vaeskconv(sd: Dict[str, np.ndarray], num_layers: int = 4):
    """EMAGE VAESKConv (``AESKConv_240_100.bin``) -> flax param trees.

    Torch layout (motion_representation.py:67-76 + skeleton.py:9-113,547-585;
    each encoder layer is Sequential(SkeletonResidual)):
      encoder.layers.{i}.0.residual.0.{weight,bias}  masked conv [out,in,k]
      encoder.layers.{i}.0.residual.1.{weight,bias}  GroupNorm(10)
      encoder.layers.{i}.0.shortcut.{weight,bias}    1x1 masked conv
      fc_mu.{weight,bias} / fc_logvar.{weight,bias}  Linear
    Neighborhood masks and mean-pooling matrices are structural buffers —
    recomputed from the kinematic tree on host — and skipped here (the raw
    torch weights are zero outside the mask, so dense conv is equivalent).
    The decoder (VQDecoderV3) is not needed for FID embedding.
    """
    def masked_conv(prefix):
        # MaskedConv1d names its [k, in, out] kernel param "weight"
        c = t_conv1d(sd, prefix)
        return {"weight": c["kernel"], "bias": c["bias"]}

    enc = {}
    for i in range(num_layers):
        p = f"encoder.layers.{i}.0"
        enc[f"layer_{i}"] = {
            "conv": masked_conv(f"{p}.residual.0"),
            "gn": {"scale": sd[f"{p}.residual.1.weight"],
                   "bias": sd[f"{p}.residual.1.bias"]},
            "shortcut": masked_conv(f"{p}.shortcut"),
        }
    return enc, t_linear(sd, "fc_mu")


def load_vaeskconv_ckpt(path: str, enc_params, mu_params, num_layers: int = 4):
    """Load the EMAGE S2G FID evaluator checkpoint into flax params."""
    import flax
    import jax
    sd = load_torch_state_dict(path)
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    enc_tree, mu_tree = convert_vaeskconv(sd, num_layers)
    enc_params = jax.tree_util.tree_map(np.asarray, flax.core.unfreeze(enc_params))
    mu_params = jax.tree_util.tree_map(np.asarray, flax.core.unfreeze(mu_params))
    _tree_update(enc_params["params"], enc_tree)
    _tree_update(mu_params["params"], mu_tree)
    return enc_params, mu_params


# --------------------------------------------------- WavEncoder / BatchNorm
def t_bn(sd, prefix):
    """torch BatchNorm1d -> (flax params, flax batch_stats)."""
    return ({"scale": sd[_k(prefix, "weight")], "bias": sd[_k(prefix, "bias")]},
            {"mean": sd[_k(prefix, "running_mean")],
             "var": sd[_k(prefix, "running_var")]})


def t_wav_encoder(sd, prefix):
    """Reference WavEncoder (blocks.py:53-71: 6 BasicBlocks under
    feat_extractor.N) -> (params, batch_stats) trees for our WavEncoder."""
    params, stats = {}, {}
    for i in range(6):
        base = _k(prefix, f"feat_extractor.{i}")
        bp, bs = {}, {}
        bp["conv1"] = t_conv1d(sd, f"{base}.conv1")
        bp["conv2"] = t_conv1d(sd, f"{base}.conv2")
        for bn in ("bn1", "bn2"):
            p, s = t_bn(sd, f"{base}.{bn}")
            bp[bn], bs[bn] = p, s
        if f"{base}.downsample.0.weight" in sd:
            bp["down_conv"] = t_conv1d(sd, f"{base}.downsample.0")
            p, s = t_bn(sd, f"{base}.downsample.1")
            bp["down_bn"], bs["down_bn"] = p, s
        params[f"block{i}"], stats[f"block{i}"] = bp, bs
    return params, stats


# ----------------------------------------------------------------- MCM
def t_eff_attention(sd, prefix):
    """Efficient/Base self- or cross-attention (efficient_attention.py:9-146):
    norm [+ text_norm], query/key/value, optional StylizationBlock."""
    out = {"norm": t_layernorm(sd, _k(prefix, "norm"))}
    if f"{_k(prefix, 'text_norm')}.weight" in sd:
        out["text_norm"] = t_layernorm(sd, _k(prefix, "text_norm"))
    for name in ("query", "key", "value", "key_text", "key_motion",
                 "value_text", "value_motion"):
        if f"{_k(prefix, name)}.weight" in sd:
            out[name] = t_linear(sd, _k(prefix, name))
    if f"{_k(prefix, 'proj_out')}.norm.weight" in sd:
        out["proj_out"] = t_stylization(sd, _k(prefix, "proj_out"))
    return out


def t_ffn(sd, prefix):
    """DiffusionTransformer FFN (diffusion_transformer.py:15-28)."""
    return {"linear1": t_linear(sd, _k(prefix, "linear1")),
            "linear2": {"linear": t_linear(sd, _k(prefix, "linear2"))},
            "proj_out": t_stylization(sd, _k(prefix, "proj_out"))}


def t_mcm_layer(sd, prefix):
    """MCM DecoderLayer (mcm.py:12-41): channel sa + dual FFN + text ca."""
    return {"sa_block": t_eff_attention(sd, _k(prefix, "sa_block")),
            "ca_block": t_eff_attention(sd, _k(prefix, "ca_block")),
            "ffn_channel": t_ffn(sd, _k(prefix, "ffn_channel")),
            "ffn_temporal": t_ffn(sd, _k(prefix, "ffn_temporal"))}


def _convert_text_enc(sd, text_num_layers, clip_layers):
    text = {"text_ln": t_layernorm(sd, "text_ln")}
    if "text_pre_proj.weight" in sd:
        text["text_pre_proj"] = t_linear(sd, "text_pre_proj")
    if "text_proj.0.weight" in sd:
        # mogen wraps text_proj in nn.Sequential (diffusion_transformer.py:144)
        text["text_proj"] = t_linear(sd, "text_proj.0")
    elif "text_proj.weight" in sd:
        text["text_proj"] = t_linear(sd, "text_proj")
    for i in range(text_num_layers):
        text[f"textTransEncoder_{i}"] = t_postln_layer(
            sd, f"textTransEncoder.layers.{i}")
    if "clip.token_embedding.weight" in sd:
        clip_sd = {k[len("clip."):]: v for k, v in sd.items()
                   if k.startswith("clip.")}
        text["clip"] = convert_clip_text(clip_sd, clip_layers)
    return text


def convert_mcm(sd: Dict[str, np.ndarray], num_layers: int,
                text_num_layers: int = 4, clip_layers: int = 12) -> dict:
    """MCMTransformer checkpoint (mcm.py:44-) -> flax param tree."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    out: dict = {
        "time_embed": {"layers_0": t_linear(sd, "time_embed.0"),
                       "layers_2": t_linear(sd, "time_embed.2")},
        "joint_embed": t_linear(sd, "joint_embed"),
        "out": {"linear": t_linear(sd, "out")},
        "text_enc": _convert_text_enc(sd, text_num_layers, clip_layers),
    }
    if "sequence_embedding" in sd:
        out["sequence_embedding"] = sd["sequence_embedding"]
    for i in range(num_layers):
        out[f"block_{i}"] = t_mcm_layer(sd, f"temporal_decoder_blocks.{i}")
    return out


def load_mcm_ckpt(path: str, variables, num_layers: int,
                  text_num_layers: int = 4, clip_layers: int = 12):
    import flax
    import jax
    sd = load_torch_state_dict(path)
    tree = convert_mcm(sd, num_layers, text_num_layers, clip_layers)
    variables = jax.tree_util.tree_map(np.asarray, flax.core.unfreeze(variables))
    _tree_update(variables["params"], tree)
    return variables


# ------------------------------------------------------------- ControlNet
def convert_controlnet(sd: Dict[str, np.ndarray], num_layers: int,
                       num_heads: int, copy_blocks_num: int,
                       text_num_layers: int = 2, clip_layers: int = 12,
                       block_type: str = "stmogen"):
    """Merged base+control checkpoint (the released S2G/M2D .pth format,
    reference README.md:241, keys base_model.* / controlnet.N.* /
    condition_pre_encoder.* / control_cond_input.*, controlnet.py:108-199)
    -> (params, batch_stats) trees for ControlT2MHalf[_MCM]."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    base_sd = {k[len("base_model."):]: v for k, v in sd.items()
               if k.startswith("base_model.")}
    if block_type == "mcm":
        base = convert_mcm(base_sd, num_layers, text_num_layers, clip_layers)
    else:
        base = convert_stmogen(base_sd, num_layers, num_heads,
                               text_num_layers, clip_layers)
    params: dict = {"base_model": base}
    stats: dict = {}
    for i in range(copy_blocks_num):
        p = f"controlnet.{i}"
        if block_type == "mcm":
            copied = t_mcm_layer(sd, f"{p}.copied_block")
        else:
            copied = {"ca_block": t_stma(sd, f"{p}.copied_block.ca_block"),
                      "ffn": t_sffn(sd, f"{p}.copied_block.ffn", num_heads)}
        blk = {"copied_block": copied,
               "after_proj": {"linear": t_linear(sd, f"{p}.after_proj")}}
        if i == 0:
            blk["before_proj"] = t_linear(sd, f"{p}.before_proj")
        params[f"controlnet_{i}"] = blk
    if any(k.startswith("condition_pre_encoder.") for k in sd):
        wp, ws = t_wav_encoder(sd, "condition_pre_encoder.pre_encoder")
        params["condition_pre_encoder"] = wp
        stats["condition_pre_encoder"] = ws
    params["control_cond_input"] = {"linear": t_linear(sd, "control_cond_input")}
    return params, stats


def load_controlnet_ckpt(path: str, variables, num_layers: int, num_heads: int,
                         copy_blocks_num: int, text_num_layers: int = 2,
                         clip_layers: int = 12, block_type: str = "stmogen"):
    """Load a released merged base+control .pth into ControlT2MHalf variables.

    Falls back to the legacy base-only format (raw STMoGen keys, remapped as
    controlnet.py:427-439) when no base_model.* keys exist: only the frozen
    base branch is filled, control weights stay at their zero init."""
    import flax
    import jax
    sd = load_torch_state_dict(path)
    flat = {k[len("model."):] if k.startswith("model.") else k: v
            for k, v in sd.items()}
    variables = jax.tree_util.tree_map(np.asarray, flax.core.unfreeze(variables))
    if any(k.startswith("base_model.") for k in flat):
        params, stats = convert_controlnet(
            flat, num_layers, num_heads, copy_blocks_num, text_num_layers,
            clip_layers, block_type)
        _tree_update(variables["params"], params)
        if stats and "batch_stats" in variables:
            _tree_update(variables["batch_stats"], stats)
    else:
        # legacy base-only format; older ControlNet-era ckpts nest block
        # params under '.base_block.' (what the reference remap normalizes
        # toward, controlnet.py:427-439) — our flax base tree uses plain
        # block names, so strip that segment if present
        pat = re.compile(r"^(temporal_decoder_blocks\.\d+)\.base_block\.")
        remapped = {pat.sub(r"\1.", k): v for k, v in flat.items()}
        if block_type == "mcm":
            base = convert_mcm(remapped, num_layers, text_num_layers, clip_layers)
        else:
            base = convert_stmogen(remapped, num_layers, num_heads,
                                   text_num_layers, clip_layers)
        _tree_update(variables["params"]["base_model"], base)
    return variables


# ----------------------------------------------- MotionDiffuse / FineMoGen
def convert_motiondiffuse(sd: Dict[str, np.ndarray], num_layers: int,
                          text_num_layers: int = 4,
                          clip_layers: int = 12) -> dict:
    """MotionDiffuseTransformer checkpoint (motion_diffuse.py /
    diffusion_transformer.py base layout: Efficient self+cross attention
    blocks + FFN) -> flax param tree."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    out: dict = {
        "time_embed": {"layers_0": t_linear(sd, "time_embed.0"),
                       "layers_2": t_linear(sd, "time_embed.2")},
        "joint_embed": t_linear(sd, "joint_embed"),
        "out": {"linear": t_linear(sd, "out")},
        "text_enc": _convert_text_enc(sd, text_num_layers, clip_layers),
    }
    if "sequence_embedding" in sd:
        out["sequence_embedding"] = sd["sequence_embedding"]
    for i in range(num_layers):
        p = f"temporal_decoder_blocks.{i}"
        blk = {}
        if f"{p}.sa_block.norm.weight" in sd:
            blk["sa_block"] = t_eff_attention(sd, f"{p}.sa_block")
        if f"{p}.ca_block.norm.weight" in sd:
            blk["ca_block"] = t_eff_attention(sd, f"{p}.ca_block")
        if f"{p}.ffn.linear1.weight" in sd:
            blk["ffn"] = t_ffn(sd, f"{p}.ffn")
        out[f"block_{i}"] = blk
    return out


def load_motiondiffuse_ckpt(path: str, variables, num_layers: int,
                            text_num_layers: int = 4, clip_layers: int = 12):
    import flax
    import jax
    sd = load_torch_state_dict(path)
    tree = convert_motiondiffuse(sd, num_layers, text_num_layers, clip_layers)
    variables = jax.tree_util.tree_map(np.asarray, flax.core.unfreeze(variables))
    _tree_update(variables["params"], tree)
    return variables


def t_interval_ffn(sd, prefix):
    """fine_attention get_ffn Sequential(Linear, GELU, Linear) -> flax
    nn.Sequential names layers_0 / layers_2."""
    return {"layers_0": t_linear(sd, _k(prefix, "0")),
            "layers_2": t_linear(sd, _k(prefix, "2"))}


def t_sami(sd, prefix):
    """SAMI attention params (fine_attention.py:62-202).  The reference's
    ``key_motion`` parameter is declared but unused in its forward; skipped."""
    g = lambda n: _k(prefix, n)
    return {
        "norm": t_layernorm(sd, g("norm")),
        "text_norm": t_layernorm(sd, g("text_norm")),
        "text_moe": t_moe(sd, g("text_moe")),
        "motion_moe": t_moe(sd, g("motion_moe")),
        "body_weight": sd[g("body_weight")],
        "sigma": sd[g("sigma")].reshape(1),
        "t_sigma": sd[g("t_sigma")].reshape(1),
        "template_s": t_interval_ffn(sd, g("template_s")),
        "template_v": t_interval_ffn(sd, g("template_v")),
        "template_a": t_interval_ffn(sd, g("template_a")),
        "template_j": t_interval_ffn(sd, g("template_j")),
        "template_t": t_interval_ffn(sd, g("template_t")),
        "proj_out": t_stylization(sd, g("proj_out")),
    }


def convert_finemogen(sd: Dict[str, np.ndarray], num_layers: int,
                      num_heads: int, text_num_layers: int = 2,
                      clip_layers: int = 12) -> dict:
    """FineMoGenTransformer checkpoint (finemogen.py: PoseEncoder/Decoder +
    SAMI/SFFN stack, same skeleton as STMoGen) -> flax param tree."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    out: dict = {
        "sequence_embedding": sd["sequence_embedding"],
        "time_embed": {"layers_0": t_linear(sd, "time_embed.0"),
                       "layers_2": t_linear(sd, "time_embed.2")},
        "joint_embed": t_pose_io(sd, "joint_embed", "embed"),
        "out": t_pose_io(sd, "out", "out"),
        "text_enc": _convert_text_enc(sd, text_num_layers, clip_layers),
    }
    for i in range(num_layers):
        p = f"temporal_decoder_blocks.{i}"
        out[f"block_{i}"] = {
            "ca_block": t_sami(sd, f"{p}.ca_block"),
            "ffn": t_sffn(sd, f"{p}.ffn", num_heads),
        }
    return out


def load_finemogen_ckpt(path: str, variables, num_layers: int, num_heads: int,
                        text_num_layers: int = 2, clip_layers: int = 12):
    import flax
    import jax
    sd = load_torch_state_dict(path)
    tree = convert_finemogen(sd, num_layers, num_heads, text_num_layers,
                             clip_layers)
    variables = jax.tree_util.tree_map(np.asarray, flax.core.unfreeze(variables))
    _tree_update(variables["params"], tree)
    return variables


# ----------------------------------------------------------------- MDM
def convert_mdm(sd: Dict[str, np.ndarray], num_layers: int,
                clip_layers: int = 12) -> dict:
    """MDMTransformer checkpoint -> flax param tree.

    Accepts BOTH naming schemes: the reference mogen MDMTransformer
    (mdm.py:35-110: poseEmbedding / seqTransEncoder.layers.N /
    embed_timestep.time_embed / embed_text / poseFinal, optional clip.*) and
    the OFFICIAL released MDM checkpoint (model000475000.pt:
    input_process.poseEmbedding / output_process.poseFinal, clip under
    clip_model.* — frozen CLIP is usually stripped from the file, in which
    case the flax CLIP keeps its separately-converted weights)."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    alias = {}
    for k, v in sd.items():
        if k.startswith("input_process."):
            alias[k[len("input_process."):]] = v
        elif k.startswith("output_process."):
            alias[k[len("output_process."):]] = v
        elif k.startswith("clip_model."):
            alias["clip." + k[len("clip_model."):]] = v
        else:
            alias[k] = v
    sd = alias
    out: dict = {
        "poseEmbedding": t_linear(sd, "poseEmbedding"),
        "poseFinal": t_linear(sd, "poseFinal"),
        "embed_text": t_linear(sd, "embed_text"),
        "time_embed": {"layers_0": t_linear(sd, "embed_timestep.time_embed.0"),
                       "layers_2": t_linear(sd, "embed_timestep.time_embed.2")},
    }
    for i in range(num_layers):
        out[f"layer_{i}"] = t_postln_layer(sd, f"seqTransEncoder.layers.{i}")
    if "clip.token_embedding.weight" in sd:
        clip_sd = {k[len("clip."):]: v for k, v in sd.items()
                   if k.startswith("clip.")}
        out["clip"] = convert_clip_text(clip_sd, clip_layers)
        if "text_projection" in clip_sd:
            out["clip"]["text_projection"] = clip_sd["text_projection"]
    return out


def load_mdm_ckpt(path: str, variables, num_layers: int,
                  clip_layers: int = 12):
    import flax
    import jax
    sd = load_torch_state_dict(path)
    tree = convert_mdm(sd, num_layers, clip_layers)
    variables = jax.tree_util.tree_map(np.asarray, flax.core.unfreeze(variables))
    _tree_update(variables["params"], tree)
    return variables


# ----------------------------------------------------- ReMoDiffuse family
def t_semantics_modulated(sd, prefix):
    """SemanticsModulatedAttention / DualSemanticsModulatedAttention
    (semantics_modulated.py:18-189): retrieval-conditioned linear attention.
    The zero-init ``value_retr`` is a flax ZeroDense ({'linear': ...});
    ``key_inter``/``value_inter`` exist only in the dual (two-person)
    variant and are mapped when present."""
    g = lambda n: _k(prefix, n)
    out = {
        "norm": t_layernorm(sd, g("norm")),
        "text_norm": t_layernorm(sd, g("text_norm")),
        "retr_norm1": t_layernorm(sd, g("retr_norm1")),
        "retr_norm2": t_layernorm(sd, g("retr_norm2")),
        "query": t_linear(sd, g("query")),
        "key_text": t_linear(sd, g("key_text")),
        "value_text": t_linear(sd, g("value_text")),
        "key_motion": t_linear(sd, g("key_motion")),
        "value_motion": t_linear(sd, g("value_motion")),
        "key_retr": t_linear(sd, g("key_retr")),
        "value_retr": {"linear": t_linear(sd, g("value_retr"))},
        "proj_out": t_stylization(sd, g("proj_out")),
    }
    for name in ("key_inter", "value_inter"):
        if f"{g(name)}.weight" in sd:
            out[name] = t_linear(sd, g(name))
    return out


def t_retrieval_encoder(sd, num_motion_layers: int, num_text_layers: int):
    """RetrievalDatabase learned re-encoders (remodiffuse.py:84-201) ->
    flax RetrievalEncoder tree.  The database's motion encoder blocks are
    EncoderLayer(EfficientSelfAttention w/o StylizationBlock + plain FFN
    with zero-init linear2); the text encoder is a post-LN
    nn.TransformerEncoder.  Only learned params convert — the retrieval
    bank itself (text_features/motions/...) stays the host-side .npz."""
    out = {
        "motion_proj": t_linear(sd, "database.motion_proj"),
        "motion_pos_embedding": sd["database.motion_pos_embedding"],
    }
    for i in range(num_motion_layers):
        p = f"database.motion_encoder_blocks.{i}"
        out[f"motion_sa_{i}"] = t_eff_attention(sd, f"{p}.sa_block")
        out[f"motion_ffn1_{i}"] = t_linear(sd, f"{p}.ffn.linear1")
        out[f"motion_ffn2_{i}"] = {"linear": t_linear(sd, f"{p}.ffn.linear2")}
    for i in range(num_text_layers):
        out[f"text_layer_{i}"] = t_postln_layer(
            sd, f"database.text_encoder.layers.{i}")
    return out


def convert_remodiffuse(sd: Dict[str, np.ndarray], num_layers: int,
                        num_motion_layers: int = 4, retr_text_layers: int = 2,
                        text_num_layers: int = 2, clip_layers: int = 12) -> dict:
    """ReMoDiffuseTransformer / MoMatMoGenTransformer checkpoint
    (remodiffuse.py:202-341, momatmogen.py:50-) -> flax param tree.
    Decoder blocks are ca_block (SemanticsModulated[Dual]) + stylized FFN;
    MoMatMoGen's dual FFN shares one set of weights across both persons and
    nests as block_i/ffn/ffn in flax (DualFFN wraps a single FFN)."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    out: dict = {
        "time_embed": {"layers_0": t_linear(sd, "time_embed.0"),
                       "layers_2": t_linear(sd, "time_embed.2")},
        "joint_embed": t_linear(sd, "joint_embed"),
        "out": {"linear": t_linear(sd, "out")},
        "text_enc": _convert_text_enc(sd, text_num_layers, clip_layers),
        "retrieval_encoder": t_retrieval_encoder(sd, num_motion_layers,
                                                 retr_text_layers),
    }
    if "sequence_embedding" in sd:
        out["sequence_embedding"] = sd["sequence_embedding"]
    dual = any(".ca_block.key_inter.weight" in k for k in sd)
    for i in range(num_layers):
        p = f"temporal_decoder_blocks.{i}"
        ffn = t_ffn(sd, f"{p}.ffn")
        out[f"block_{i}"] = {
            "ca_block": t_semantics_modulated(sd, f"{p}.ca_block"),
            "ffn": {"ffn": ffn} if dual else ffn,
        }
    return out


def load_remodiffuse_ckpt(path: str, variables, num_layers: int,
                          num_motion_layers: int = 4, retr_text_layers: int = 2,
                          text_num_layers: int = 2, clip_layers: int = 12):
    import flax
    import jax
    sd = load_torch_state_dict(path)
    tree = convert_remodiffuse(sd, num_layers, num_motion_layers,
                               retr_text_layers, text_num_layers, clip_layers)
    variables = jax.tree_util.tree_map(np.asarray, flax.core.unfreeze(variables))
    _tree_update(variables["params"], tree)
    return variables


# --------------------------------------------------------------- wav2vec2

def _t_weight_norm_conv1d(sd, prefix):
    """torch nn.utils.weight_norm(Conv1d, dim=2) (the Wav2Vec2 positional
    conv): materialize w = g * v / ||v||_(0,1) and convert.  Handles both
    the legacy ``weight_g/weight_v`` keys and the parametrize-era
    ``parametrizations.weight.original0/1``."""
    if _k(prefix, "weight_g") in sd:
        g, v = sd[_k(prefix, "weight_g")], sd[_k(prefix, "weight_v")]
    else:
        g = sd[_k(prefix, "parametrizations.weight.original0")]
        v = sd[_k(prefix, "parametrizations.weight.original1")]
    norm = np.sqrt((np.asarray(v, np.float64) ** 2).sum(axis=(0, 1),
                                                        keepdims=True))
    w = np.asarray(g) * np.asarray(v) / norm  # [out, in/groups, k]
    return {"kernel": np.transpose(w, (2, 1, 0)).astype(np.float32),
            "bias": sd[_k(prefix, "bias")]}


def convert_wav2vec2(sd: Dict[str, np.ndarray], num_layers: int = 12,
                     num_conv_layers: int = 7) -> dict:
    """HF torch Wav2Vec2Model ('group'-norm base layout) -> native
    Wav2Vec2Module params (models/wav2vec.py).  Reference capability:
    EMAGE_2024/models/utils/wav2vec.py:72-146."""
    fe = {"group_norm": t_layernorm(sd, "feature_extractor.conv_layers.0.layer_norm")}
    for i in range(num_conv_layers):
        fe[f"conv_{i}"] = t_conv1d(sd, f"feature_extractor.conv_layers.{i}.conv")
    out = {
        "feature_extractor": fe,
        "fp_layer_norm": t_layernorm(sd, "feature_projection.layer_norm"),
        "fp_projection": t_linear(sd, "feature_projection.projection"),
        "pos_conv": _t_weight_norm_conv1d(sd, "encoder.pos_conv_embed.conv"),
        "encoder_layer_norm": t_layernorm(sd, "encoder.layer_norm"),
    }
    for i in range(num_layers):
        p = f"encoder.layers.{i}"
        out[f"layer_{i}"] = {
            "attention": {
                "q_proj": t_linear(sd, f"{p}.attention.q_proj"),
                "k_proj": t_linear(sd, f"{p}.attention.k_proj"),
                "v_proj": t_linear(sd, f"{p}.attention.v_proj"),
                "out_proj": t_linear(sd, f"{p}.attention.out_proj"),
            },
            "layer_norm": t_layernorm(sd, f"{p}.layer_norm"),
            "intermediate_dense": t_linear(sd, f"{p}.feed_forward.intermediate_dense"),
            "output_dense": t_linear(sd, f"{p}.feed_forward.output_dense"),
            "final_layer_norm": t_layernorm(sd, f"{p}.final_layer_norm"),
        }
    return out


def load_wav2vec2_params(path: str, variables, num_layers: int = 12,
                         num_conv_layers: int = 7):
    """Load an HF torch Wav2Vec2Model checkpoint into Wav2Vec2Module
    variables (shape-checked)."""
    import flax
    import jax
    sd = load_torch_state_dict(path)
    tree = convert_wav2vec2(sd, num_layers, num_conv_layers)
    variables = jax.tree_util.tree_map(np.asarray, flax.core.unfreeze(variables))
    _tree_update(variables["params"], tree)
    return variables
