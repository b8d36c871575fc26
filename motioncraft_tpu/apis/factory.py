"""Canonical model configs + batch factories.

``flagship_t2m_cfg`` mirrors the reference 0.125B STMoGen T2M config
(/root/reference/configs/stmogen/T2M_motionx_align_Finedance_Beats2_face_no_loss_0_125b.py):
4 layers, 128x12 latent, MoE 16 experts top-2 cosine gate, CLIP ViT-B/32 text
tower, DDIM-50 ('15,15,8,6,6') eval sampler, CFG scale 6.5.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.tokenizer import tokenize
from ..registry import build_architecture


def flagship_t2m_cfg(*, num_layers: int = 4, latent_dim: int = 128, num_heads: int = 12,
                     max_seq_len: int = 196, input_feats: int = 322,
                     text_latent_dim: int = 256, ff_size: int = 512,
                     time_embed_dim: int = 2048, num_experts: int = 16,
                     clip_width: int = 512, clip_layers: int = 12,
                     respace: str = "15,15,8,6,6", expert_axis: Optional[str] = None,
                     dropout: float = 0.0) -> dict:
    return dict(
        type="MotionDiffusion",
        model=dict(
            type="STMoGenTransformer",
            input_feats=input_feats,
            max_seq_len=max_seq_len,
            latent_dim=latent_dim * num_heads,
            time_embed_dim=time_embed_dim,
            num_layers=num_layers,
            ca_block_cfg=dict(type="STMA", latent_dim=latent_dim,
                              text_latent_dim=text_latent_dim, num_heads=num_heads,
                              num_text_heads=1, num_experts=num_experts, topk=2,
                              gate_type="cosine_top", gate_noise=1.0, ffn_dim=ff_size,
                              time_embed_dim=time_embed_dim, max_seq_len=max_seq_len,
                              max_text_seq_len=77, temporal_comb=False,
                              dropout=dropout, dynamic_body=True,
                              expert_axis=expert_axis),
            ffn_cfg=dict(latent_dim=latent_dim, ffn_dim=ff_size, dropout=dropout,
                         time_embed_dim=time_embed_dim, num_heads=num_heads),
            text_encoder=dict(pretrained_model="clip", latent_dim=text_latent_dim,
                              num_layers=2, ff_size=2048, dropout=dropout,
                              use_text_proj=False, clip_width=clip_width,
                              clip_layers=clip_layers),
            pose_encoder_cfg=dict(dataset_name="motionx", latent_dim=latent_dim,
                                  input_dim=input_feats),
            pose_decoder_cfg=dict(dataset_name="motionx", latent_dim=latent_dim,
                                  output_dim=input_feats),
            scale_func_cfg=dict(scale=6.5),
            moe_route_loss_weight=10.0,
            template_kl_loss_weight=0.0001,
            use_pos_embedding=True,
        ),
        loss_recon=dict(type="MSELoss", loss_weight=1, reduction="none"),
        face_no_loss=True,
        diffusion_train=dict(beta_scheduler="linear", diffusion_steps=1000,
                             model_mean_type="start_x", model_var_type="fixed_large"),
        diffusion_test=dict(beta_scheduler="linear", diffusion_steps=1000,
                            model_mean_type="start_x", model_var_type="fixed_large",
                            respace=respace),
        inference_type="ddim",
        loss_reduction="batch",
    )


def tiny_t2m_cfg(expert_axis: Optional[str] = None, max_seq_len: int = 16) -> dict:
    """Scaled-down flagship for dry runs / CI (same topology, tiny dims)."""
    return flagship_t2m_cfg(num_layers=2, latent_dim=8, max_seq_len=max_seq_len,
                            text_latent_dim=16, ff_size=16, time_embed_dim=32,
                            clip_width=32, clip_layers=1, respace="4",
                            expert_axis=expert_axis)


def build_flagship(cfg: Optional[dict] = None):
    import motioncraft_tpu.models  # noqa: F401  (trigger registration)
    return build_architecture(cfg or flagship_t2m_cfg())


def bf16_cast_variables(variables):
    """Cast every floating leaf of a variables pytree to bfloat16 (the
    standard eval-time params cast used with ``compute_dtype=jnp.bfloat16``;
    diffusion schedule and metric math stay f32 at the call sites)."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a, variables)


def int8_quantize_variables(variables, **kwargs):
    """Rewrite the audited denoiser hot-path weights to int8 (see
    ops/quant.py; W8A8 dynamic by default, ``weight_only=True`` for the W8
    dequant-into-float-dot mode).  Apply AFTER ``bf16_cast_variables`` so
    the per-channel scales stay f32.  Opt-in, inference only."""
    from ..ops.quant import quantize_variables
    return quantize_variables(variables, **kwargs)


def make_text_batch(texts, max_seq_len: int = 196, input_feats: int = 322,
                    motion: Optional[np.ndarray] = None,
                    lengths: Optional[np.ndarray] = None) -> dict:
    B = len(texts)
    if motion is None:
        motion = np.zeros((B, max_seq_len, input_feats), np.float32)
    if lengths is None:
        lengths = np.full((B, 1), max_seq_len, np.int32)
    mask = (np.arange(max_seq_len)[None, :] < lengths).astype(np.float32)
    # numpy on purpose: jit transfers these at dispatch (async, pipelined).
    # Eager jnp.asarray here would issue one blocking RPC per array on a
    # remote-runtime TPU — the windowed eval loops call this per window.
    return {
        "motion": np.asarray(motion, np.float32),
        "motion_mask": mask,
        "motion_length": np.asarray(lengths, np.int32),
        "text_ids": tokenize(list(texts)),
    }


def flagship_m2d_cfg(window: int = 120, **kw) -> dict:
    """Flagship M2D: ControlNet branch over the 0.125B T2M base at 120-frame
    windows with raw 163-d music-feature conditioning, no pre-encoder
    (configs/stmogen/m2d_finedance_0125b.py schema)."""
    cfg = flagship_s2g_cfg(window=window, **kw)
    cfg["model"] = dict(cfg["model"])
    cfg["model"]["control_cond_feats"] = 163
    cfg["model"]["condition_encode_cfg"] = dict(
        dataset_name="nothing", condition_pre_encode=False,
        condition_pre_encode_type="nothing", control_cond_feats=163,
        condition_cfg=True)
    cfg["repaint"] = dict(overlap_len=30, add_blend=True,
                          same_overlap_noisy=False, jump_length=3,
                          jump_n_sample=2)
    return cfg


def flagship_s2g_cfg(window: int = 64, **kw) -> dict:
    """Flagship S2G: ControlNet branch over the 0.125B T2M base at 64-frame
    windows with raw-audio WavEncoder conditioning (configs/stmogen/
    s2g_beats2_0125b.py schema)."""
    base = flagship_t2m_cfg(max_seq_len=window, **kw)
    base_model = base["model"]
    latent = base_model["latent_dim"]
    cfg = dict(base)
    cfg["model"] = dict(
        type="ControlT2MHalf", base_model=base_model, copy_blocks_num=2,
        control_cond_feats=2,
        condition_encode_cfg=dict(dataset_name="beats2",
                                  condition_pre_encode=True,
                                  condition_pre_encode_type="wav",
                                  control_cond_feats=2,
                                  condition_latent_dim=latent,
                                  condition_cfg=True))
    cfg["repaint"] = dict(overlap_len=4, add_blend=True,
                          same_overlap_noisy=False, jump_length=3,
                          jump_n_sample=2)
    return cfg
