"""ControlNet branch + windowed long-form generation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import motioncraft_tpu.models  # noqa: F401
from motioncraft_tpu.models.controlnet import (ControlT2MHalf,
                                               controlnet_frozen_prefixes,
                                               init_control_blocks_from_base)
from motioncraft_tpu.models.tokenizer import tokenize
from motioncraft_tpu.registry import build_architecture

pytestmark = pytest.mark.slow  # multi-minute e2e compiles

HEADS, LAT = 12, 8
T, D_IN = 16, 322


def base_model_cfg():
    return dict(type="STMoGenTransformer", input_feats=D_IN, max_seq_len=T,
                latent_dim=LAT * HEADS, time_embed_dim=32, num_layers=2,
                ca_block_cfg=dict(type="STMA", latent_dim=LAT, text_latent_dim=16,
                                  num_heads=HEADS, num_text_heads=1, num_experts=4,
                                  topk=2, gate_type="cosine_top", gate_noise=0.0,
                                  ffn_dim=16, time_embed_dim=32, max_seq_len=T,
                                  max_text_seq_len=77, temporal_comb=False, dropout=0),
                ffn_cfg=dict(latent_dim=LAT, ffn_dim=16, dropout=0, time_embed_dim=32,
                             num_heads=HEADS),
                text_encoder=dict(pretrained_model="clip", latent_dim=16, num_layers=1,
                                  ff_size=16, dropout=0, use_text_proj=False,
                                  clip_width=32, clip_layers=1),
                pose_encoder_cfg=dict(dataset_name="motionx", latent_dim=LAT,
                                      input_dim=D_IN),
                pose_decoder_cfg=dict(dataset_name="motionx", latent_dim=LAT,
                                      output_dim=D_IN),
                scale_func_cfg=dict(scale=6.5))


def control_cfg(pre_encode=True):
    return dict(type="ControlT2MHalf", base_model=base_model_cfg(),
                copy_blocks_num=1,
                control_cond_feats=2,
                condition_encode_cfg=dict(dataset_name="beats2",
                                          condition_pre_encode=pre_encode,
                                          condition_pre_encode_type="wav",
                                          condition_latent_dim=16,
                                          control_cond_feats=2,
                                          condition_cfg=True))


def arch_cfg(model_cfg, respace="4"):
    return dict(type="MotionDiffusion", model=model_cfg,
                loss_recon=dict(type="MSELoss", loss_weight=1, reduction="none"),
                diffusion_train=dict(beta_scheduler="linear", diffusion_steps=1000,
                                     model_mean_type="start_x",
                                     model_var_type="fixed_large"),
                diffusion_test=dict(beta_scheduler="linear", diffusion_steps=1000,
                                    model_mean_type="start_x",
                                    model_var_type="fixed_large", respace=respace),
                inference_type="ddim", loss_reduction="batch",
                repaint=dict(overlap_len=4, same_overlap_noisy=True,
                             jump_length=3, jump_n_sample=2))


def make_batch(rng, with_audio=True):
    B = 1
    batch = {"motion": jnp.asarray(rng.randn(B, T, D_IN), jnp.float32),
             "motion_mask": jnp.ones((B, T)),
             "motion_length": jnp.full((B, 1), T, jnp.int32),
             "text_ids": jnp.asarray(tokenize(["someone is speaking"]))}
    if with_audio:
        # raw 16kHz onset+amplitude: samples = T/30*16000
        n_samples = T * (16000 // 30)
        batch["c"] = jnp.asarray(rng.randn(B, n_samples, 2), jnp.float32)
    return batch


@pytest.fixture(scope="module")
def ctrl_arch():
    arch = build_architecture(arch_cfg(control_cfg()))
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = arch.init(jax.random.PRNGKey(0), batch)
    return arch, variables, batch


class TestControlNet:
    def test_init_and_param_tree(self, ctrl_arch):
        _, variables, _ = ctrl_arch
        p = variables["params"]
        assert "base_model" in p and "controlnet_0" in p
        assert "copied_block" in p["controlnet_0"]
        assert "batch_stats" in variables  # WavEncoder BN

    def test_zero_init_noop_at_init(self, ctrl_arch):
        """With zero-init before/after projections and zero-init decoder, the
        control branch must not change the base output at init."""
        arch, variables, batch = ctrl_arch
        t = jnp.zeros((1,), jnp.int32)
        xf = arch.encode_text(variables, batch["text_ids"])
        call = lambda c: arch.model.apply(
            variables, batch["motion"], t, motion_mask=batch["motion_mask"],
            motion_length=batch["motion_length"], xf_out=xf, c=c, mode="test")
        out_with_c = call(batch["c"])
        out_without = call(None)
        np.testing.assert_allclose(np.asarray(out_with_c), np.asarray(out_without),
                                   atol=1e-5)

    def test_copy_blocks_from_base(self, ctrl_arch):
        arch, variables, _ = ctrl_arch
        import flax
        params = flax.core.unfreeze(variables["params"])
        params = init_control_blocks_from_base(params, copy_blocks_num=1)
        src = params["base_model"]["block_0"]
        dst = params["controlnet_0"]["copied_block"]
        s_leaves = jax.tree_util.tree_leaves(src)
        d_leaves = jax.tree_util.tree_leaves(dst)
        assert len(s_leaves) == len(d_leaves)
        for a, b in zip(s_leaves, d_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_frozen_prefixes(self):
        pref = controlnet_frozen_prefixes(True, "all")
        assert "base_model/text_enc" in pref and "base_model/block_" in pref
        # reference modes (misc.py:16-75)
        pref_rfh = controlnet_frozen_prefixes(True, "root_face_hand")
        for kept in ("face", "lhand", "rhand", "root", "trans", "body"):
            assert f"base_model/joint_embed/{kept}_embed" not in pref_rfh
            assert f"base_model/out/{kept}_out" not in pref_rfh
        for frz in ("head", "stem", "larm", "rarm", "lleg", "rleg"):
            assert f"base_model/joint_embed/{frz}_embed" in pref_rfh
        pref_rh = controlnet_frozen_prefixes(True, "root_hand")
        assert "base_model/joint_embed/face_embed" in pref_rh
        assert "base_model/joint_embed/lhand_embed" not in pref_rh

    def test_train_loss_with_condition(self, ctrl_arch):
        arch, variables, batch = ctrl_arch
        loss, logs = jax.jit(arch.loss)(variables, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))

    def test_sample_with_condition(self, ctrl_arch):
        arch, variables, batch = ctrl_arch
        out = jax.jit(lambda v, b, r: arch.sample(v, b, r))(
            variables, batch, jax.random.PRNGKey(2))
        assert out.shape == (1, T, D_IN) and np.isfinite(np.asarray(out)).all()


class TestWindowed:
    def test_windowed_generation(self, ctrl_arch):
        from motioncraft_tpu.apis.windowed import num_windows, windowed_sample
        arch, variables, _ = ctrl_arch
        rng_np = np.random.RandomState(3)
        total, window, pre = 40, T, 4
        spf = 16000 // 30
        audio_full = rng_np.randn(total * spf, 2).astype(np.float32)

        def make_window_batch(start, end):
            b = make_batch(rng_np, with_audio=False)
            b["motion"] = jnp.zeros((1, window, D_IN))
            b["c"] = jnp.asarray(audio_full[start * spf:end * spf])[None]
            return b

        assert num_windows(40, 16, 4) == 3
        out = windowed_sample(arch, variables, make_window_batch,
                              total_frames=total, window=window, pre_frames=pre,
                              rng=jax.random.PRNGKey(4), use_repaint=True,
                              repaint=arch.repaint_cfg)
        assert out.shape == (total, D_IN) and np.isfinite(out).all()

    def test_windowed_bf16_compute(self, ctrl_arch):
        """compute_dtype=bfloat16 runs the same windowed path (params cast,
        f32 output) and stays finite."""
        from motioncraft_tpu.apis.windowed import windowed_sample
        arch, variables, _ = ctrl_arch
        vb = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, variables)
        rng_np = np.random.RandomState(7)
        spf = 16000 // 30
        audio_full = rng_np.randn(40 * spf, 2).astype(np.float32)

        def make_window_batch(start, end):
            b = make_batch(rng_np, with_audio=False)
            b["motion"] = jnp.zeros((1, T, D_IN))
            b["c"] = jnp.asarray(audio_full[start * spf:end * spf])[None]
            return b

        arch._windowed_jit_cache = None  # bf16 variables need a fresh trace
        out = windowed_sample(arch, vb, make_window_batch,
                              total_frames=40, window=T, pre_frames=4,
                              rng=jax.random.PRNGKey(8), use_repaint=True,
                              repaint=arch.repaint_cfg,
                              compute_dtype=jnp.bfloat16)
        arch._windowed_jit_cache = None
        assert out.shape == (40, D_IN) and np.isfinite(out).all()

    def test_windowed_no_repaint(self, ctrl_arch):
        from motioncraft_tpu.apis.windowed import windowed_sample
        arch, variables, _ = ctrl_arch
        rng_np = np.random.RandomState(5)
        spf = 16000 // 30
        audio_full = rng_np.randn(40 * spf, 2).astype(np.float32)

        def make_window_batch(start, end):
            b = make_batch(rng_np, with_audio=False)
            b["motion"] = jnp.zeros((1, T, D_IN))
            b["c"] = jnp.asarray(audio_full[start * spf:end * spf])[None]
            return b

        out = windowed_sample(arch, variables, make_window_batch,
                              total_frames=40, window=T, pre_frames=4,
                              rng=jax.random.PRNGKey(6), use_repaint=False)
        assert out.shape == (40, D_IN) and np.isfinite(out).all()


class TestWindowedBatch:
    def test_batch_of_one_matches_single(self, ctrl_arch):
        """windowed_sample_batch with R=1 is bit-identical to
        windowed_sample (same rng, same jitted samplers)."""
        from motioncraft_tpu.apis.windowed import (windowed_sample,
                                                   windowed_sample_batch)
        arch, variables, _ = ctrl_arch
        spf = 16000 // 30
        audio = np.random.RandomState(11).randn(40 * spf, 2).astype(np.float32)
        fixed = make_batch(np.random.RandomState(0), with_audio=False)

        def mwb(start, end):
            b = dict(fixed)
            b["motion"] = jnp.zeros((1, T, D_IN))
            b["c"] = jnp.asarray(audio[start * spf:end * spf])[None]
            return b

        kw = dict(window=T, pre_frames=4, use_repaint=True,
                  repaint=arch.repaint_cfg, feat_dim=D_IN)
        single = windowed_sample(arch, variables, mwb, total_frames=40,
                                 rng=jax.random.PRNGKey(9), **kw)
        batched = windowed_sample_batch(arch, variables, [mwb], [40],
                                        rng=jax.random.PRNGKey(9), **kw)
        np.testing.assert_allclose(batched[0], single, atol=1e-5)

    def test_precompute_condition_matches_fallback(self, ctrl_arch):
        """The one-conv-call condition pre-encoding (banked c_enc slices)
        matches in-window encoding (precompute_condition=False)."""
        from motioncraft_tpu.apis.windowed import windowed_sample_batch
        arch, variables, _ = ctrl_arch
        spf = 16000 // 30
        rng_np = np.random.RandomState(17)
        audios = [rng_np.randn(40 * spf, 2).astype(np.float32)
                  for _ in range(2)]
        fixed = make_batch(np.random.RandomState(2), with_audio=False)

        def make_mwb(a):
            def mwb(start, end):
                b = dict(fixed)
                b["motion"] = jnp.zeros((1, T, D_IN))
                b["c"] = jnp.asarray(a[start * spf:end * spf])[None]
                return b
            return mwb

        kw = dict(window=T, pre_frames=4, rng=jax.random.PRNGKey(12),
                  use_repaint=True, repaint=arch.repaint_cfg, feat_dim=D_IN)
        pre = windowed_sample_batch(arch, variables,
                                    [make_mwb(a) for a in audios], [40, 40],
                                    precompute_condition=True, **kw)
        raw = windowed_sample_batch(arch, variables,
                                    [make_mwb(a) for a in audios], [40, 40],
                                    precompute_condition=False, **kw)
        for p, r in zip(pre, raw):
            np.testing.assert_allclose(p, r, atol=1e-5)

    def test_window_chunking_invariant(self, ctrl_arch):
        """Chunked banks (window_chunk=2) produce the same output as one
        bank: the carry crosses chunk boundaries and the rng fold uses the
        GLOBAL window index, not the chunk-local bank index."""
        from motioncraft_tpu.apis.windowed import windowed_sample_batch
        arch, variables, _ = ctrl_arch
        spf = 16000 // 30
        audio = np.random.RandomState(23).randn(52 * spf, 2).astype(np.float32)
        fixed = make_batch(np.random.RandomState(3), with_audio=False)

        def mwb(start, end):
            b = dict(fixed)
            b["motion"] = jnp.zeros((1, T, D_IN))
            b["c"] = jnp.asarray(audio[start * spf:end * spf])[None]
            return b

        kw = dict(window=T, pre_frames=4, rng=jax.random.PRNGKey(14),
                  use_repaint=True, repaint=arch.repaint_cfg, feat_dim=D_IN)
        whole = windowed_sample_batch(arch, variables, [mwb], [52], **kw)
        chunked = windowed_sample_batch(arch, variables, [mwb], [52],
                                        window_chunk=2, **kw)
        np.testing.assert_allclose(chunked[0], whole[0], atol=1e-6)

    def test_mixed_length_recordings(self, ctrl_arch):
        """R=2 lockstep with different recording lengths: each output has its
        own length; the shorter recording's padded windows are discarded."""
        from motioncraft_tpu.apis.windowed import windowed_sample_batch
        arch, variables, _ = ctrl_arch
        spf = 16000 // 30
        rng_np = np.random.RandomState(13)
        audios = [rng_np.randn(40 * spf, 2).astype(np.float32),
                  rng_np.randn(28 * spf, 2).astype(np.float32)]
        fixed = make_batch(np.random.RandomState(1), with_audio=False)

        def make_mwb(a):
            def mwb(start, end):
                b = dict(fixed)
                b["motion"] = jnp.zeros((1, T, D_IN))
                b["c"] = jnp.asarray(a[start * spf:end * spf])[None]
                return b
            return mwb

        outs = windowed_sample_batch(
            arch, variables, [make_mwb(a) for a in audios], [40, 28],
            window=T, pre_frames=4, rng=jax.random.PRNGKey(10),
            use_repaint=True, repaint=arch.repaint_cfg, feat_dim=D_IN)
        assert outs[0].shape == (40, D_IN) and np.isfinite(outs[0]).all()
        assert outs[1].shape == (28, D_IN) and np.isfinite(outs[1]).all()
