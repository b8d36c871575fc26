"""Converter self-consistency: build the flax STMoGen, synthesize a torch-layout
state dict by inverting our converter conventions from a torch replica-free
fabrication, and check every flax param gets filled with the right shape."""

import jax
import jax.numpy as jnp
import numpy as np

import motioncraft_tpu.models  # noqa: F401
from motioncraft_tpu.apis.factory import make_text_batch, tiny_t2m_cfg
from motioncraft_tpu.registry import build_architecture
from motioncraft_tpu.utils.torch_convert import convert_stmogen, _tree_update


import pytest

pytestmark = pytest.mark.parity

def fabricate_torch_sd(params, num_layers, num_heads, text_layers, clip_layers):
    """Create torch-named arrays with shapes implied by the flax tree."""
    sd = {}
    rng = np.random.RandomState(0)

    def lin(name, tree):
        sd[f"{name}.weight"] = rng.randn(*tree["kernel"].shape[::-1]).astype(np.float32)
        if "bias" in tree:
            sd[f"{name}.bias"] = rng.randn(*tree["bias"].shape).astype(np.float32)

    def ln(name, tree):
        sd[f"{name}.weight"] = rng.randn(*tree["scale"].shape).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(*tree["bias"].shape).astype(np.float32)

    def styl(name, tree):
        lin(f"{name}.emb_layers.1", tree["emb_layers"])
        ln(f"{name}.norm", tree["norm"])
        lin(f"{name}.out_layers.2", tree["out_layers"]["linear"])

    def moe(name, tree):
        sd[f"{name}.embedding"] = rng.randn(*tree["embedding"].shape).astype(np.float32)
        lin(f"{name}.proj", tree["proj"])
        m = tree["model"]
        lin(f"{name}.model.gates.0.cosine_projector", m["gate"]["cosine_projector"])
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

    sd["sequence_embedding"] = rng.randn(*params["sequence_embedding"].shape).astype(np.float32)
    lin("time_embed.0", params["time_embed"]["layers_0"])
    lin("time_embed.2", params["time_embed"]["layers_2"])
    for part, tree in params["joint_embed"].items():
        lin(f"joint_embed.{part}", tree)
    for part, tree in params["out"].items():
        lin(f"out.{part}", tree)
    te = params["text_enc"]
    ln("text_ln", te["text_ln"])
    lin("text_pre_proj", te["text_pre_proj"])
    for i in range(text_layers):
        lt = te[f"textTransEncoder_{i}"]
        sd[f"textTransEncoder.layers.{i}.self_attn.in_proj_weight"] = rng.randn(
            *lt["self_attn"]["in_proj"]["kernel"].shape[::-1]).astype(np.float32)
        sd[f"textTransEncoder.layers.{i}.self_attn.in_proj_bias"] = rng.randn(
            *lt["self_attn"]["in_proj"]["bias"].shape).astype(np.float32)
        lin(f"textTransEncoder.layers.{i}.self_attn.out_proj", lt["self_attn"]["out_proj"])
        lin(f"textTransEncoder.layers.{i}.linear1", lt["linear1"])
        lin(f"textTransEncoder.layers.{i}.linear2", lt["linear2"])
        ln(f"textTransEncoder.layers.{i}.norm1", lt["norm1"])
        ln(f"textTransEncoder.layers.{i}.norm2", lt["norm2"])
    # clip
    clip = te["clip"]
    sd["clip.token_embedding.weight"] = rng.randn(
        *clip["token_embedding"]["embedding"].shape).astype(np.float32)
    sd["clip.positional_embedding"] = rng.randn(
        *clip["positional_embedding"].shape).astype(np.float32)
    ln("clip.ln_final", clip["ln_final"])
    for i in range(clip_layers):
        blk = clip[f"resblock_{i}"]
        p = f"clip.transformer.resblocks.{i}"
        sd[f"{p}.attn.in_proj_weight"] = rng.randn(
            *blk["attn"]["in_proj"]["kernel"].shape[::-1]).astype(np.float32)
        sd[f"{p}.attn.in_proj_bias"] = rng.randn(
            *blk["attn"]["in_proj"]["bias"].shape).astype(np.float32)
        lin(f"{p}.attn.out_proj", blk["attn"]["out_proj"])
        ln(f"{p}.ln_1", blk["ln_1"])
        ln(f"{p}.ln_2", blk["ln_2"])
        lin(f"{p}.mlp.c_fc", blk["mlp_fc"])
        lin(f"{p}.mlp.c_proj", blk["mlp_proj"])
    # blocks
    for i in range(num_layers):
        blk = params[f"block_{i}"]
        p = f"temporal_decoder_blocks.{i}"
        ca = blk["ca_block"]
        ln(f"{p}.ca_block.norm", ca["norm"])
        ln(f"{p}.ca_block.text_norm", ca["text_norm"])
        moe(f"{p}.ca_block.text_moe", ca["text_moe"])
        moe(f"{p}.ca_block.motion_moe", ca["motion_moe"])
        sd[f"{p}.ca_block.body_weight"] = rng.randn(*ca["body_weight"].shape).astype(np.float32)
        styl(f"{p}.ca_block.proj_out", ca["proj_out"])
        if "body_d_attn" in ca:
            ln(f"{p}.ca_block.body_d_attn.norm", ca["body_d_attn"]["norm"])
            for nm in ("query", "key", "value"):
                lin(f"{p}.ca_block.body_d_attn.{nm}", ca["body_d_attn"][nm])
        ffn = blk["ffn"]
        for h in range(num_heads):
            sd[f"{p}.ffn.linear1_list.{h}.weight"] = rng.randn(
                ffn["w1"].shape[2], ffn["w1"].shape[1]).astype(np.float32)
            sd[f"{p}.ffn.linear1_list.{h}.bias"] = rng.randn(ffn["b1"].shape[1]).astype(np.float32)
            sd[f"{p}.ffn.linear2_list.{h}.weight"] = rng.randn(
                ffn["w2"].shape[2], ffn["w2"].shape[1]).astype(np.float32)
            sd[f"{p}.ffn.linear2_list.{h}.bias"] = rng.randn(ffn["b2"].shape[1]).astype(np.float32)
        styl(f"{p}.ffn.proj_out", ffn["proj_out"])
    return sd


def test_stmogen_converter_fills_tree():
    cfg = tiny_t2m_cfg()
    arch = __import__("motioncraft_tpu.registry", fromlist=["x"]).build_architecture(cfg)
    batch = make_text_batch(["a"], max_seq_len=16)
    import flax
    variables = flax.core.unfreeze(arch.init(jax.random.PRNGKey(0), batch))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    m = cfg["model"]
    sd = fabricate_torch_sd(params, m["num_layers"],
                            m["ffn_cfg"]["num_heads"],
                            m["text_encoder"]["num_layers"],
                            m["text_encoder"]["clip_layers"])
    tree = convert_stmogen(sd, m["num_layers"], m["ffn_cfg"]["num_heads"],
                           m["text_encoder"]["num_layers"],
                           m["text_encoder"]["clip_layers"])
    before = jax.tree_util.tree_leaves(params)
    _tree_update(params, tree)  # raises on any shape mismatch
    # verify the conversion actually replaced values (not a no-op)
    changed = sum(int(not np.array_equal(a, b)) for a, b in
                  zip(before, jax.tree_util.tree_leaves(params)))
    assert changed > 50
