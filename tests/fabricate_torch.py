"""Shared torch-state-dict fabrication for converter tests.

Each helper writes reference-named torch arrays into ``sd`` with shapes
implied by the corresponding flax param subtree, so converter tests can
verify key mapping + transposition without the real released checkpoints.
"""

import numpy as np


def lin(sd, name, tree, rng):
    sd[f"{name}.weight"] = rng.randn(*tree["kernel"].shape[::-1]).astype(np.float32)
    if "bias" in tree:
        sd[f"{name}.bias"] = rng.randn(*tree["bias"].shape).astype(np.float32)


def ln(sd, name, tree, rng):
    sd[f"{name}.weight"] = rng.randn(*tree["scale"].shape).astype(np.float32)
    sd[f"{name}.bias"] = rng.randn(*tree["bias"].shape).astype(np.float32)


def styl(sd, name, tree, rng):
    lin(sd, f"{name}.emb_layers.1", tree["emb_layers"], rng)
    ln(sd, f"{name}.norm", tree["norm"], rng)
    lin(sd, f"{name}.out_layers.2", tree["out_layers"]["linear"], rng)


def moe(sd, name, tree, rng):
    sd[f"{name}.embedding"] = rng.randn(*tree["embedding"].shape).astype(np.float32)
    lin(sd, f"{name}.proj", tree["proj"], rng)
    m = tree["model"]
    lin(sd, f"{name}.model.gates.0.cosine_projector", m["gate"]["cosine_projector"], rng)
    sd[f"{name}.model.gates.0.sim_matrix"] = rng.randn(
        *m["gate"]["sim_matrix"].shape).astype(np.float32)
    sd[f"{name}.model.gates.0.temperature"] = np.ones(1, np.float32)
    # tutel stores fc1 as [E, F, D] (nn.Linear convention)
    sd[f"{name}.model.experts.batched_fc1_w"] = rng.randn(
        m["expert_w1"].shape[0], m["expert_w1"].shape[2],
        m["expert_w1"].shape[1]).astype(np.float32)
    sd[f"{name}.model.experts.batched_fc1_bias"] = rng.randn(
        m["expert_b1"].shape[0], 1, m["expert_b1"].shape[1]).astype(np.float32)
    sd[f"{name}.model.experts.batched_fc2_w"] = rng.randn(
        *m["expert_w2"].shape).astype(np.float32)
    sd[f"{name}.model.experts.batched_fc2_bias"] = rng.randn(
        m["expert_b2"].shape[0], 1, m["expert_b2"].shape[1]).astype(np.float32)


def stma(sd, name, tree, rng):
    ln(sd, f"{name}.norm", tree["norm"], rng)
    ln(sd, f"{name}.text_norm", tree["text_norm"], rng)
    moe(sd, f"{name}.text_moe", tree["text_moe"], rng)
    moe(sd, f"{name}.motion_moe", tree["motion_moe"], rng)
    sd[f"{name}.body_weight"] = rng.randn(*tree["body_weight"].shape).astype(np.float32)
    styl(sd, f"{name}.proj_out", tree["proj_out"], rng)
    if "body_d_attn" in tree:
        ln(sd, f"{name}.body_d_attn.norm", tree["body_d_attn"]["norm"], rng)
        for nm in ("query", "key", "value"):
            lin(sd, f"{name}.body_d_attn.{nm}", tree["body_d_attn"][nm], rng)


def sffn(sd, name, tree, rng, num_heads):
    for h in range(num_heads):
        sd[f"{name}.linear1_list.{h}.weight"] = rng.randn(
            tree["w1"].shape[2], tree["w1"].shape[1]).astype(np.float32)
        sd[f"{name}.linear1_list.{h}.bias"] = rng.randn(tree["b1"].shape[1]).astype(np.float32)
        sd[f"{name}.linear2_list.{h}.weight"] = rng.randn(
            tree["w2"].shape[2], tree["w2"].shape[1]).astype(np.float32)
        sd[f"{name}.linear2_list.{h}.bias"] = rng.randn(tree["b2"].shape[1]).astype(np.float32)
    styl(sd, f"{name}.proj_out", tree["proj_out"], rng)


def eff_attention(sd, name, tree, rng):
    ln(sd, f"{name}.norm", tree["norm"], rng)
    if "text_norm" in tree:
        ln(sd, f"{name}.text_norm", tree["text_norm"], rng)
    for nm in ("query", "key", "value", "key_text", "key_motion",
               "value_text", "value_motion"):
        if nm in tree:
            lin(sd, f"{name}.{nm}", tree[nm], rng)
    if "proj_out" in tree:
        styl(sd, f"{name}.proj_out", tree["proj_out"], rng)


def ffn(sd, name, tree, rng):
    lin(sd, f"{name}.linear1", tree["linear1"], rng)
    lin(sd, f"{name}.linear2", tree["linear2"]["linear"], rng)
    styl(sd, f"{name}.proj_out", tree["proj_out"], rng)


def mcm_layer(sd, name, tree, rng):
    eff_attention(sd, f"{name}.sa_block", tree["sa_block"], rng)
    eff_attention(sd, f"{name}.ca_block", tree["ca_block"], rng)
    ffn(sd, f"{name}.ffn_channel", tree["ffn_channel"], rng)
    ffn(sd, f"{name}.ffn_temporal", tree["ffn_temporal"], rng)


def conv1d(sd, name, tree, rng):
    k, cin, cout = tree["kernel"].shape
    sd[f"{name}.weight"] = rng.randn(cout, cin, k).astype(np.float32)
    if "bias" in tree:
        sd[f"{name}.bias"] = rng.randn(cout).astype(np.float32)


def bn(sd, name, tree, rng):
    n = tree["scale"].shape[0]
    sd[f"{name}.weight"] = rng.randn(n).astype(np.float32)
    sd[f"{name}.bias"] = rng.randn(n).astype(np.float32)
    sd[f"{name}.running_mean"] = rng.randn(n).astype(np.float32)
    sd[f"{name}.running_var"] = np.abs(rng.randn(n)).astype(np.float32)


def wav_encoder(sd, name, tree, rng):
    for i in range(6):
        blk = tree[f"block{i}"]
        base = f"{name}.feat_extractor.{i}"
        conv1d(sd, f"{base}.conv1", blk["conv1"], rng)
        conv1d(sd, f"{base}.conv2", blk["conv2"], rng)
        bn(sd, f"{base}.bn1", blk["bn1"], rng)
        bn(sd, f"{base}.bn2", blk["bn2"], rng)
        if "down_conv" in blk:
            conv1d(sd, f"{base}.downsample.0", blk["down_conv"], rng)
            bn(sd, f"{base}.downsample.1", blk["down_bn"], rng)


def text_enc(sd, tree, rng, text_layers, clip_layers):
    ln(sd, "text_ln", tree["text_ln"], rng)
    if "text_pre_proj" in tree:
        lin(sd, "text_pre_proj", tree["text_pre_proj"], rng)
    if "text_proj" in tree:
        # mogen's text_proj is nn.Sequential(nn.Linear) -> keys text_proj.0.*
        lin(sd, "text_proj.0", tree["text_proj"], rng)
    for i in range(text_layers):
        lt = tree[f"textTransEncoder_{i}"]
        p = f"textTransEncoder.layers.{i}"
        sd[f"{p}.self_attn.in_proj_weight"] = rng.randn(
            *lt["self_attn"]["in_proj"]["kernel"].shape[::-1]).astype(np.float32)
        sd[f"{p}.self_attn.in_proj_bias"] = rng.randn(
            *lt["self_attn"]["in_proj"]["bias"].shape).astype(np.float32)
        lin(sd, f"{p}.self_attn.out_proj", lt["self_attn"]["out_proj"], rng)
        lin(sd, f"{p}.linear1", lt["linear1"], rng)
        lin(sd, f"{p}.linear2", lt["linear2"], rng)
        ln(sd, f"{p}.norm1", lt["norm1"], rng)
        ln(sd, f"{p}.norm2", lt["norm2"], rng)
    if "clip" in tree:
        clip = tree["clip"]
        sd["clip.token_embedding.weight"] = rng.randn(
            *clip["token_embedding"]["embedding"].shape).astype(np.float32)
        sd["clip.positional_embedding"] = rng.randn(
            *clip["positional_embedding"].shape).astype(np.float32)
        ln(sd, "clip.ln_final", clip["ln_final"], rng)
        if "text_projection" in clip:
            sd["clip.text_projection"] = rng.randn(
                *clip["text_projection"].shape).astype(np.float32)
        for i in range(clip_layers):
            blk = clip[f"resblock_{i}"]
            p = f"clip.transformer.resblocks.{i}"
            sd[f"{p}.attn.in_proj_weight"] = rng.randn(
                *blk["attn"]["in_proj"]["kernel"].shape[::-1]).astype(np.float32)
            sd[f"{p}.attn.in_proj_bias"] = rng.randn(
                *blk["attn"]["in_proj"]["bias"].shape).astype(np.float32)
            lin(sd, f"{p}.attn.out_proj", blk["attn"]["out_proj"], rng)
            ln(sd, f"{p}.ln_1", blk["ln_1"], rng)
            ln(sd, f"{p}.ln_2", blk["ln_2"], rng)
            lin(sd, f"{p}.mlp.c_fc", blk["mlp_fc"], rng)
            lin(sd, f"{p}.mlp.c_proj", blk["mlp_proj"], rng)


def stmogen_sd(params, rng, num_layers, num_heads, text_layers, clip_layers,
               prefix=""):
    """Full STMoGen torch sd from the flax param tree (optionally prefixed)."""
    sd = {}
    sd["sequence_embedding"] = rng.randn(
        *params["sequence_embedding"].shape).astype(np.float32)
    lin(sd, "time_embed.0", params["time_embed"]["layers_0"], rng)
    lin(sd, "time_embed.2", params["time_embed"]["layers_2"], rng)
    for part, tree in params["joint_embed"].items():
        lin(sd, f"joint_embed.{part}", tree, rng)
    for part, tree in params["out"].items():
        lin(sd, f"out.{part}", tree, rng)
    text_enc(sd, params["text_enc"], rng, text_layers, clip_layers)
    for i in range(num_layers):
        blk = params[f"block_{i}"]
        p = f"temporal_decoder_blocks.{i}"
        stma(sd, f"{p}.ca_block", blk["ca_block"], rng)
        sffn(sd, f"{p}.ffn", blk["ffn"], rng, num_heads)
    if prefix:
        sd = {prefix + k: v for k, v in sd.items()}
    return sd


def mcm_sd(params, rng, num_layers, text_layers, clip_layers, prefix=""):
    sd = {}
    if "sequence_embedding" in params:
        sd["sequence_embedding"] = rng.randn(
            *params["sequence_embedding"].shape).astype(np.float32)
    lin(sd, "time_embed.0", params["time_embed"]["layers_0"], rng)
    lin(sd, "time_embed.2", params["time_embed"]["layers_2"], rng)
    lin(sd, "joint_embed", params["joint_embed"], rng)
    lin(sd, "out", params["out"]["linear"], rng)
    text_enc(sd, params["text_enc"], rng, text_layers, clip_layers)
    for i in range(num_layers):
        mcm_layer(sd, f"temporal_decoder_blocks.{i}", params[f"block_{i}"], rng)
    if prefix:
        sd = {prefix + k: v for k, v in sd.items()}
    return sd


def interval_ffn(sd, name, tree, rng):
    lin(sd, f"{name}.0", tree["layers_0"], rng)
    lin(sd, f"{name}.2", tree["layers_2"], rng)


def sami(sd, name, tree, rng):
    ln(sd, f"{name}.norm", tree["norm"], rng)
    ln(sd, f"{name}.text_norm", tree["text_norm"], rng)
    moe(sd, f"{name}.text_moe", tree["text_moe"], rng)
    moe(sd, f"{name}.motion_moe", tree["motion_moe"], rng)
    sd[f"{name}.body_weight"] = rng.randn(*tree["body_weight"].shape).astype(np.float32)
    sd[f"{name}.sigma"] = np.full(1, 100.0, np.float32)
    sd[f"{name}.t_sigma"] = np.ones(1, np.float32)
    # the reference declares key_motion but never uses it; present in ckpts
    sd[f"{name}.key_motion"] = rng.randn(4, 4).astype(np.float32)
    for t in ("template_s", "template_v", "template_a", "template_j",
              "template_t"):
        interval_ffn(sd, f"{name}.{t}", tree[t], rng)
    styl(sd, f"{name}.proj_out", tree["proj_out"], rng)


def motiondiffuse_sd(params, rng, num_layers, text_layers, clip_layers,
                     prefix=""):
    sd = {}
    if "sequence_embedding" in params:
        sd["sequence_embedding"] = rng.randn(
            *params["sequence_embedding"].shape).astype(np.float32)
    lin(sd, "time_embed.0", params["time_embed"]["layers_0"], rng)
    lin(sd, "time_embed.2", params["time_embed"]["layers_2"], rng)
    lin(sd, "joint_embed", params["joint_embed"], rng)
    lin(sd, "out", params["out"]["linear"], rng)
    text_enc(sd, params["text_enc"], rng, text_layers, clip_layers)
    for i in range(num_layers):
        blk = params[f"block_{i}"]
        p = f"temporal_decoder_blocks.{i}"
        if "sa_block" in blk:
            eff_attention(sd, f"{p}.sa_block", blk["sa_block"], rng)
        if "ca_block" in blk:
            eff_attention(sd, f"{p}.ca_block", blk["ca_block"], rng)
        if "ffn" in blk:
            ffn(sd, f"{p}.ffn", blk["ffn"], rng)
    if prefix:
        sd = {prefix + k: v for k, v in sd.items()}
    return sd


def finemogen_sd(params, rng, num_layers, num_heads, text_layers, clip_layers,
                 prefix=""):
    sd = {}
    sd["sequence_embedding"] = rng.randn(
        *params["sequence_embedding"].shape).astype(np.float32)
    lin(sd, "time_embed.0", params["time_embed"]["layers_0"], rng)
    lin(sd, "time_embed.2", params["time_embed"]["layers_2"], rng)
    for part, tree in params["joint_embed"].items():
        lin(sd, f"joint_embed.{part}", tree, rng)
    for part, tree in params["out"].items():
        lin(sd, f"out.{part}", tree, rng)
    text_enc(sd, params["text_enc"], rng, text_layers, clip_layers)
    for i in range(num_layers):
        blk = params[f"block_{i}"]
        p = f"temporal_decoder_blocks.{i}"
        sami(sd, f"{p}.ca_block", blk["ca_block"], rng)
        sffn(sd, f"{p}.ffn", blk["ffn"], rng, num_heads)
    if prefix:
        sd = {prefix + k: v for k, v in sd.items()}
    return sd


def mdm_sd(params, rng, num_layers, clip_layers, official=False):
    """MDM checkpoint in the mogen naming, or the OFFICIAL released layout
    (input_process./output_process. prefixes, no clip weights)."""
    sd = {}
    pe = "input_process.poseEmbedding" if official else "poseEmbedding"
    pf = "output_process.poseFinal" if official else "poseFinal"
    lin(sd, pe, params["poseEmbedding"], rng)
    lin(sd, pf, params["poseFinal"], rng)
    lin(sd, "embed_text", params["embed_text"], rng)
    lin(sd, "embed_timestep.time_embed.0", params["time_embed"]["layers_0"], rng)
    lin(sd, "embed_timestep.time_embed.2", params["time_embed"]["layers_2"], rng)
    for i in range(num_layers):
        lt = params[f"layer_{i}"]
        p = f"seqTransEncoder.layers.{i}"
        sd[f"{p}.self_attn.in_proj_weight"] = rng.randn(
            *lt["self_attn"]["in_proj"]["kernel"].shape[::-1]).astype(np.float32)
        sd[f"{p}.self_attn.in_proj_bias"] = rng.randn(
            *lt["self_attn"]["in_proj"]["bias"].shape).astype(np.float32)
        lin(sd, f"{p}.self_attn.out_proj", lt["self_attn"]["out_proj"], rng)
        lin(sd, f"{p}.linear1", lt["linear1"], rng)
        lin(sd, f"{p}.linear2", lt["linear2"], rng)
        ln(sd, f"{p}.norm1", lt["norm1"], rng)
        ln(sd, f"{p}.norm2", lt["norm2"], rng)
    if not official:
        # mogen's MDMTransformer names its CLIP attribute clip_model
        clip = params["clip"]
        sd["clip_model.token_embedding.weight"] = rng.randn(
            *clip["token_embedding"]["embedding"].shape).astype(np.float32)
        sd["clip_model.positional_embedding"] = rng.randn(
            *clip["positional_embedding"].shape).astype(np.float32)
        sd["clip_model.text_projection"] = rng.randn(
            *clip["text_projection"].shape).astype(np.float32)
        ln(sd, "clip_model.ln_final", clip["ln_final"], rng)
        for i in range(clip_layers):
            blk = clip[f"resblock_{i}"]
            p = f"clip_model.transformer.resblocks.{i}"
            sd[f"{p}.attn.in_proj_weight"] = rng.randn(
                *blk["attn"]["in_proj"]["kernel"].shape[::-1]).astype(np.float32)
            sd[f"{p}.attn.in_proj_bias"] = rng.randn(
                *blk["attn"]["in_proj"]["bias"].shape).astype(np.float32)
            lin(sd, f"{p}.attn.out_proj", blk["attn"]["out_proj"], rng)
            ln(sd, f"{p}.ln_1", blk["ln_1"], rng)
            ln(sd, f"{p}.ln_2", blk["ln_2"], rng)
            lin(sd, f"{p}.mlp.c_fc", blk["mlp_fc"], rng)
            lin(sd, f"{p}.mlp.c_proj", blk["mlp_proj"], rng)
    return sd


def postln_layer(sd, name, tree, rng):
    """nn.TransformerEncoderLayer keys from a flax PostLNEncoderLayer tree."""
    sd[f"{name}.self_attn.in_proj_weight"] = rng.randn(
        *tree["self_attn"]["in_proj"]["kernel"].shape[::-1]).astype(np.float32)
    sd[f"{name}.self_attn.in_proj_bias"] = rng.randn(
        *tree["self_attn"]["in_proj"]["bias"].shape).astype(np.float32)
    lin(sd, f"{name}.self_attn.out_proj", tree["self_attn"]["out_proj"], rng)
    lin(sd, f"{name}.linear1", tree["linear1"], rng)
    lin(sd, f"{name}.linear2", tree["linear2"], rng)
    ln(sd, f"{name}.norm1", tree["norm1"], rng)
    ln(sd, f"{name}.norm2", tree["norm2"], rng)


def semantics_modulated(sd, name, tree, rng):
    for nm in ("norm", "text_norm", "retr_norm1", "retr_norm2"):
        ln(sd, f"{name}.{nm}", tree[nm], rng)
    for nm in ("query", "key_text", "value_text", "key_motion", "value_motion",
               "key_retr", "key_inter", "value_inter"):
        if nm in tree:
            lin(sd, f"{name}.{nm}", tree[nm], rng)
    lin(sd, f"{name}.value_retr", tree["value_retr"]["linear"], rng)
    styl(sd, f"{name}.proj_out", tree["proj_out"], rng)


def remodiffuse_sd(params, rng, num_layers, num_motion_layers, retr_text_layers,
                   text_layers, clip_layers, dual=False, prefix=""):
    """ReMoDiffuse/MoMatMoGen torch sd (remodiffuse.py/momatmogen.py naming)
    from the flax param tree."""
    sd = {}
    if "sequence_embedding" in params:
        sd["sequence_embedding"] = rng.randn(
            *params["sequence_embedding"].shape).astype(np.float32)
    lin(sd, "time_embed.0", params["time_embed"]["layers_0"], rng)
    lin(sd, "time_embed.2", params["time_embed"]["layers_2"], rng)
    lin(sd, "joint_embed", params["joint_embed"], rng)
    lin(sd, "out", params["out"]["linear"], rng)
    text_enc(sd, params["text_enc"], rng, text_layers, clip_layers)
    re = params["retrieval_encoder"]
    lin(sd, "database.motion_proj", re["motion_proj"], rng)
    sd["database.motion_pos_embedding"] = rng.randn(
        *re["motion_pos_embedding"].shape).astype(np.float32)
    for i in range(num_motion_layers):
        p = f"database.motion_encoder_blocks.{i}"
        eff_attention(sd, f"{p}.sa_block", re[f"motion_sa_{i}"], rng)
        lin(sd, f"{p}.ffn.linear1", re[f"motion_ffn1_{i}"], rng)
        lin(sd, f"{p}.ffn.linear2", re[f"motion_ffn2_{i}"]["linear"], rng)
    for i in range(retr_text_layers):
        postln_layer(sd, f"database.text_encoder.layers.{i}",
                     re[f"text_layer_{i}"], rng)
    for i in range(num_layers):
        blk = params[f"block_{i}"]
        p = f"temporal_decoder_blocks.{i}"
        semantics_modulated(sd, f"{p}.ca_block", blk["ca_block"], rng)
        ffn(sd, f"{p}.ffn", blk["ffn"]["ffn"] if dual else blk["ffn"], rng)
    if prefix:
        sd = {prefix + k: v for k, v in sd.items()}
    return sd
