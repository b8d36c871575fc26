"""Released-checkpoint conversion for ControlNet (merged base+control) and MCM.

Fabricates torch state dicts in the reference's released-.pth layouts
(controlnet.py:108-199 module names, README.md:241 merged format; mcm.py:44-)
from the flax param tree shapes and verifies the converters fill every param
with the right shape (``_tree_update`` raises on mismatch) and actually
replace values.
"""

import os
import sys

import jax
import numpy as np
import pytest

import motioncraft_tpu.models  # noqa: F401
from motioncraft_tpu.config import Config
from motioncraft_tpu.models.tokenizer import tokenize
from motioncraft_tpu.registry import build_architecture
from motioncraft_tpu.utils.torch_convert import (_tree_update,
                                                 convert_controlnet,
                                                 convert_mcm)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import fabricate_torch as fab  # noqa: E402

pytestmark = [pytest.mark.slow, pytest.mark.parity]  # multi-minute e2e compiles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def count_changed(before, after):
    return sum(int(not np.array_equal(a, b)) for a, b in
               zip(jax.tree_util.tree_leaves(before),
                   jax.tree_util.tree_leaves(after)))


@pytest.fixture(scope="module")
def ctrl_arch_and_vars():
    import flax
    import jax.numpy as jnp
    cfg = Config.fromfile(os.path.join(REPO, "configs", "tests", "tiny_s2g.py"))
    arch = build_architecture(cfg.model)
    batch = {"motion": jnp.zeros((1, 16, 322)), "motion_mask": jnp.ones((1, 16)),
             "motion_length": jnp.full((1, 1), 16, jnp.int32),
             "text_ids": jnp.asarray(tokenize(["a"])),
             "c": jnp.zeros((1, 16 * 533, 2))}
    variables = flax.core.unfreeze(arch.init(jax.random.PRNGKey(0), batch))
    return cfg, jax.tree_util.tree_map(np.asarray, variables)


def fabricate_merged_sd(variables, num_layers, num_heads, copy_blocks,
                        text_layers, clip_layers):
    rng = np.random.RandomState(0)
    params = variables["params"]
    sd = fab.stmogen_sd(params["base_model"], rng, num_layers, num_heads,
                        text_layers, clip_layers, prefix="base_model.")
    for i in range(copy_blocks):
        blk = params[f"controlnet_{i}"]
        p = f"controlnet.{i}"
        fab.stma(sd, f"{p}.copied_block.ca_block",
                 blk["copied_block"]["ca_block"], rng)
        fab.sffn(sd, f"{p}.copied_block.ffn", blk["copied_block"]["ffn"],
                 rng, num_heads)
        fab.lin(sd, f"{p}.after_proj", blk["after_proj"]["linear"], rng)
        if i == 0:
            fab.lin(sd, f"{p}.before_proj", blk["before_proj"], rng)
    if "condition_pre_encoder" in params:
        # merge batch_stats shapes in for BN fabrication
        tree = jax.tree_util.tree_map(lambda x: x, params["condition_pre_encoder"])
        fab.wav_encoder(sd, "condition_pre_encoder.pre_encoder", tree, rng)
    fab.lin(sd, "control_cond_input", params["control_cond_input"]["linear"], rng)
    return sd


def test_controlnet_merged_ckpt_fills_tree(ctrl_arch_and_vars):
    cfg, variables = ctrl_arch_and_vars
    m = cfg.model["model"]
    bm = m["base_model"]
    num_layers, num_heads = bm["num_layers"], bm["ffn_cfg"]["num_heads"]
    text_layers = bm["text_encoder"]["num_layers"]
    clip_layers = bm["text_encoder"]["clip_layers"]
    copy_blocks = m["copy_blocks_num"]
    sd = fabricate_merged_sd(variables, num_layers, num_heads, copy_blocks,
                             text_layers, clip_layers)
    # released ckpts carry the MotionDiffusion 'model.' prefix
    sd = {"model." + k: v for k, v in sd.items()}
    params_tree, stats_tree = convert_controlnet(
        sd, num_layers, num_heads, copy_blocks, text_layers, clip_layers)
    import copy
    params = copy.deepcopy(variables["params"])
    before = copy.deepcopy(params)
    _tree_update(params, params_tree)  # raises on shape mismatch
    assert count_changed(before, params) > 80
    if "batch_stats" in variables:
        stats = copy.deepcopy(variables["batch_stats"])
        sbefore = copy.deepcopy(stats)
        _tree_update(stats, stats_tree)
        assert count_changed(sbefore, stats) > 10


def test_controlnet_legacy_base_only_ckpt(ctrl_arch_and_vars, tmp_path):
    """Base-only .pth (with or without .base_block nesting) fills only the
    frozen base branch via load_controlnet_ckpt."""
    torch = pytest.importorskip("torch")
    cfg, variables = ctrl_arch_and_vars
    m = cfg.model["model"]
    bm = m["base_model"]
    rng = np.random.RandomState(1)
    sd = fab.stmogen_sd(variables["params"]["base_model"], rng,
                        bm["num_layers"], bm["ffn_cfg"]["num_heads"],
                        bm["text_encoder"]["num_layers"],
                        bm["text_encoder"]["clip_layers"])
    # nest decoder blocks under .base_block. as legacy ckpts do
    legacy = {}
    for k, v in sd.items():
        if k.startswith("temporal_decoder_blocks."):
            pre, rest = k.split(".", 2)[0:2], k.split(".", 2)[2]
            k = f"{pre[0]}.{pre[1]}.base_block.{rest}"
        legacy["model." + k] = torch.from_numpy(np.asarray(v))
    path = tmp_path / "legacy.pth"
    torch.save({"state_dict": legacy}, path)
    from motioncraft_tpu.utils.torch_convert import load_controlnet_ckpt
    import copy
    base_before = copy.deepcopy(variables["params"]["base_model"])
    ctrl_before = copy.deepcopy(variables["params"]["controlnet_0"])
    out = load_controlnet_ckpt(
        str(path), copy.deepcopy(variables), bm["num_layers"],
        bm["ffn_cfg"]["num_heads"], m["copy_blocks_num"],
        bm["text_encoder"]["num_layers"], bm["text_encoder"]["clip_layers"])
    assert count_changed(base_before, out["params"]["base_model"]) > 40
    assert count_changed(ctrl_before, out["params"]["controlnet_0"]) == 0


def test_load_eval_variables_merged_pth(ctrl_arch_and_vars, tmp_path):
    """End-to-end: fabricated merged .pth -> load_eval_variables dispatch."""
    torch = pytest.importorskip("torch")
    cfg, variables = ctrl_arch_and_vars
    m = cfg.model["model"]
    bm = m["base_model"]
    sd = fabricate_merged_sd(variables, bm["num_layers"],
                             bm["ffn_cfg"]["num_heads"], m["copy_blocks_num"],
                             bm["text_encoder"]["num_layers"],
                             bm["text_encoder"]["clip_layers"])
    path = tmp_path / "merged.pth"
    torch.save({"state_dict": {"model." + k: torch.from_numpy(np.asarray(v))
                               for k, v in sd.items()}}, path)
    from motioncraft_tpu.utils.checkpoint import load_eval_variables
    import copy
    out = load_eval_variables(cfg.model, copy.deepcopy(variables),
                              torch_checkpoint=str(path))
    assert count_changed(variables["params"], out["params"]) > 80


def test_mcm_converter_fills_tree():
    import flax
    import jax.numpy as jnp
    from motioncraft_tpu.registry import SUBMODULES
    T = 16
    mcm_cfg = dict(
        type="MCMTransformer", input_feats=322, max_seq_len=T, latent_dim=32,
        time_embed_dim=64, num_layers=2,
        # channel attention: tokens are the feature dims, so sa latent = T
        sa_block_cfg=dict(type="EfficientSelfAttention", latent_dim=T,
                          num_heads=4, dropout=0, time_embed_dim=64),
        ca_block_cfg=dict(type="EfficientCrossAttention", latent_dim=32,
                          text_latent_dim=16, num_heads=4, dropout=0,
                          time_embed_dim=64),
        ffn_cfg=dict(latent_dim=32, ffn_dim=64, dropout=0, time_embed_dim=64),
        text_encoder=dict(pretrained_model="clip", latent_dim=16, num_layers=1,
                          ff_size=16, dropout=0, use_text_proj=False,
                          clip_width=32, clip_layers=1))
    model = SUBMODULES.build(mcm_cfg)
    args = dict(motion=jnp.zeros((1, T, 322)),
                timesteps=jnp.zeros((1,), jnp.int32),
                motion_mask=jnp.ones((1, T)),
                motion_length=jnp.full((1, 1), T, jnp.int32),
                text_ids=jnp.asarray(tokenize(["a"])))
    variables = flax.core.unfreeze(model.init(
        jax.random.PRNGKey(0), **args, method="init_all"))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    rng = np.random.RandomState(2)
    sd = fab.mcm_sd(params, rng, 2, 1, 1, prefix="model.")
    tree = convert_mcm(sd, num_layers=2, text_num_layers=1, clip_layers=1)
    import copy
    before = copy.deepcopy(params)
    _tree_update(params, tree)
    assert count_changed(before, params) > 40
