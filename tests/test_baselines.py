"""Smoke + behavior tests for the baseline denoiser families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import motioncraft_tpu.models  # noqa: F401
from motioncraft_tpu.models.baselines import (MCMTransformer, MDMTransformer,
                                              MoMatMoGenTransformer,
                                              MotionDiffuseTransformer,
                                              ReMoDiffuseTransformer)
from motioncraft_tpu.models.tokenizer import tokenize

B, T, D_IN = 2, 8, 24
TEXT_ENC = dict(pretrained_model="clip", latent_dim=16, num_layers=1, ff_size=16,
                dropout=0, use_text_proj=True, clip_width=32, clip_layers=1)


def base_kwargs(**over):
    kw = dict(input_feats=D_IN, max_seq_len=T, latent_dim=16, time_embed_dim=32,
              num_layers=1, text_encoder=TEXT_ENC)
    kw.update(over)
    return kw


def batch_args():
    return dict(motion=jnp.zeros((B, T, D_IN)),
                timesteps=jnp.zeros((B,), jnp.int32),
                motion_mask=jnp.ones((B, T)),
                motion_length=jnp.full((B, 1), T, jnp.int32),
                text_ids=jnp.asarray(tokenize(["hello world", "hi"])))


class TestMotionDiffuse:
    def test_forward(self):
        m = MotionDiffuseTransformer(**base_kwargs(
            sa_block_cfg=dict(type="EfficientSelfAttention", latent_dim=16,
                              num_heads=4, dropout=0, time_embed_dim=32),
            ca_block_cfg=dict(type="EfficientCrossAttention", latent_dim=16,
                              text_latent_dim=16, num_heads=4, dropout=0,
                              time_embed_dim=32),
            ffn_cfg=dict(latent_dim=16, ffn_dim=32, dropout=0, time_embed_dim=32)))
        args = batch_args()
        v = jax.jit(lambda a: m.init(jax.random.PRNGKey(0), **a,
                                     method="init_all"))(args)
        out = jax.jit(lambda v_, a: m.apply(v_, **a, method="init_all"))(v, args)
        assert out.shape == (B, T, D_IN)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)  # zero-init out


class TestMCM:
    def test_channel_attention_layer(self):
        m = MCMTransformer(**base_kwargs(
            sa_block_cfg=dict(type="EfficientSelfAttention", latent_dim=T,
                              num_heads=2, dropout=0, time_embed_dim=32),
            ca_block_cfg=dict(type="EfficientCrossAttention", latent_dim=16,
                              text_latent_dim=16, num_heads=4, dropout=0,
                              time_embed_dim=32),
            ffn_cfg=dict(latent_dim=16, ffn_dim=32, dropout=0, time_embed_dim=32)))
        args = batch_args()
        v = m.init(jax.random.PRNGKey(0), **args, method="init_all")
        out = m.apply(v, **args, method="init_all")
        assert out.shape == (B, T, D_IN)


class TestMDM:
    def test_cfg_guide_scale(self):
        m = MDMTransformer(input_feats=D_IN, latent_dim=16, ff_size=32,
                           num_layers=1, num_heads=2, dropout=0, clip_dim=32,
                           clip_layers=1, guide_scale=2.5)
        args = batch_args()
        v = m.init(jax.random.PRNGKey(0), args["motion"], args["timesteps"],
                   motion_mask=args["motion_mask"],
                   motion_length=args["motion_length"],
                   text_ids=args["text_ids"], method="init_all")
        xf = m.apply(v, args["text_ids"], method="encode_text")
        assert xf.shape == (B, 32)
        out = m.apply(v, args["motion"], args["timesteps"],
                      motion_mask=args["motion_mask"], xf_out=xf, mode="test")
        assert out.shape == (B, T, D_IN)
        # train mode with cond dropout mask
        out_tr = m.apply(v, args["motion"], args["timesteps"],
                         motion_mask=args["motion_mask"], xf_out=xf,
                         cond_type=jnp.zeros((B, 1, 1), jnp.int32), mode="train")
        assert out_tr.shape == (B, T, D_IN)


def _re_dict(latent=16, R=2, Tr=4):
    return dict(re_motion=jnp.zeros((B, R, Tr, latent)),
                re_text=jnp.zeros((B, R, 1, latent)),
                re_mask=jnp.ones((B, R, Tr)))


class TestReMoDiffuse:
    def _model(self, cls):
        return cls(**base_kwargs(
            ca_block_cfg=dict(type="SemanticsModulatedAttention"
                              if cls is ReMoDiffuseTransformer
                              else "DualSemanticsModulatedAttention",
                              latent_dim=16, text_latent_dim=16, num_heads=4,
                              dropout=0, time_embed_dim=32),
            ffn_cfg=dict(latent_dim=16, ffn_dim=32, dropout=0, time_embed_dim=32),
            text_encoder=dict(**{**TEXT_ENC, "use_text_proj": False}),
            scale_func_cfg=dict(coarse_scale=4.0, both_coef=0.5, text_coef=0.25,
                                retr_coef=0.15)))

    def test_remodiffuse_4way_cfg(self):
        m = self._model(ReMoDiffuseTransformer)
        args = batch_args()
        re_dict = _re_dict()
        v = m.init(jax.random.PRNGKey(0), **args, re_dict=re_dict, method="init_all")
        out = m.apply(v, **args, re_dict=re_dict, method="init_all")
        assert out.shape == (B, T, D_IN)

    def test_momatmogen_two_person(self):
        m = self._model(MoMatMoGenTransformer)
        args = batch_args()
        args["motion"] = jnp.zeros((B, T, 2 * D_IN))  # two persons
        re_dict = _re_dict()
        v = m.init(jax.random.PRNGKey(0), **args, re_dict=re_dict, method="init_all")
        out = m.apply(v, **args, re_dict=re_dict, method="init_all")
        assert out.shape == (B, T, 2 * D_IN)


class TestFineMoGen:
    def test_sami_model(self):
        from motioncraft_tpu.models.baselines import FineMoGenTransformer
        HEADS, LAT = 8, 8  # human_ml3d: 7 parts + body = 8 heads
        m = FineMoGenTransformer(
            input_feats=263, max_seq_len=T, latent_dim=LAT * HEADS,
            time_embed_dim=32, num_layers=1,
            ca_block_cfg=dict(type="SAMI", latent_dim=LAT, text_latent_dim=16,
                              num_heads=HEADS, num_text_heads=1, num_experts=4,
                              topk=2, gate_type="cosine_top", gate_noise=1.0,
                              ffn_dim=16, time_embed_dim=32, max_seq_len=T,
                              max_text_seq_len=77, temporal_comb=False, dropout=0),
            ffn_cfg=dict(latent_dim=LAT, ffn_dim=16, dropout=0, time_embed_dim=32,
                         num_heads=HEADS),
            text_encoder=dict(**{**TEXT_ENC, "use_text_proj": False}),
            pose_encoder_cfg=dict(dataset_name="human_ml3d", latent_dim=LAT,
                                  input_dim=263),
            pose_decoder_cfg=dict(dataset_name="human_ml3d", latent_dim=LAT,
                                  output_dim=263),
            scale_func_cfg=dict(scale=6.5))
        args = batch_args()
        args["motion"] = jnp.zeros((B, T, 263))
        # jit (persistent-cached): eager SAMI applies dominate wall-clock
        v = jax.jit(lambda a: m.init(jax.random.PRNGKey(0), **a,
                                     method="init_all"))(args)
        out = jax.jit(lambda v_, a: m.apply(v_, **a, method="init_all"))(v, args)
        assert out.shape == (B, T, 263)
