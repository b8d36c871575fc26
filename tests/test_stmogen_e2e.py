"""End-to-end tests: STMoGen denoiser + MotionDiffusion architecture.

A tiny model (config schema identical to
configs/stmogen/T2M_motionx_align_...0_125b.py, scaled down) goes through
init -> train loss -> jitted DDIM sampling, plus the 'gt' inference mode that
validates the pipeline without a model (reference configs/gt.py pattern).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import motioncraft_tpu.models  # noqa: F401  (register)
from motioncraft_tpu.models.body_layout import (body_slice, inverse_permutation,
                                                part_slices)
from motioncraft_tpu.models.tokenizer import tokenize
from motioncraft_tpu.registry import build_architecture

pytestmark = pytest.mark.slow  # multi-minute e2e compiles

LATENT = 8
HEADS = 12  # motionx layout: heads == body parts (11 + whole-body)
T = 16
D_IN = 322


def tiny_cfg(inference_type="ddim"):
    return dict(
        type="MotionDiffusion",
        model=dict(
            type="STMoGenTransformer",
            input_feats=D_IN,
            max_seq_len=T,
            latent_dim=LATENT * HEADS,
            time_embed_dim=32,
            num_layers=1,
            ca_block_cfg=dict(type="STMA", latent_dim=LATENT, text_latent_dim=24,
                              num_heads=HEADS, num_text_heads=1, num_experts=4,
                              topk=2, gate_type="cosine_top", gate_noise=1.0,
                              ffn_dim=16, time_embed_dim=32, max_seq_len=T,
                              max_text_seq_len=77, temporal_comb=False, dropout=0,
                              dynamic_body=True),
            ffn_cfg=dict(latent_dim=LATENT, ffn_dim=16, dropout=0,
                         time_embed_dim=32, num_heads=HEADS),
            text_encoder=dict(pretrained_model="clip", latent_dim=24, num_layers=1,
                              ff_size=32, dropout=0, use_text_proj=False,
                              clip_width=32, clip_layers=1),
            pose_encoder_cfg=dict(dataset_name="motionx", latent_dim=LATENT,
                                  input_dim=D_IN),
            pose_decoder_cfg=dict(dataset_name="motionx", latent_dim=LATENT,
                                  output_dim=D_IN),
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
                            respace="4"),
        inference_type=inference_type,
        loss_reduction="batch",
    )


def make_batch(rng, B=2):
    motion = jnp.asarray(rng.randn(B, T, D_IN), jnp.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 12:] = 0
    return {
        "motion": motion,
        "motion_mask": jnp.asarray(mask),
        "motion_length": jnp.asarray([[T], [12]], jnp.int32),
        "text_ids": jnp.asarray(tokenize(["a person walks", "someone waves"])),
    }


@pytest.fixture(scope="module")
def arch_and_vars():
    arch = build_architecture(tiny_cfg())
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = arch.init(jax.random.PRNGKey(0), batch)
    return arch, variables, batch


class TestLayout:
    def test_smplx_part_slices_form_permutation(self):
        flat = sum(part_slices("motionx").values(), [])
        assert sorted(flat) == list(range(322))
        inv = inverse_permutation(flat, 322)
        x = np.random.randn(322)
        np.testing.assert_allclose(x[flat][inv], x)

    def test_body_slices_sizes(self):
        assert len(set(body_slice("human_ml3d"))) == 263
        assert len(set(body_slice("kit_ml"))) == 251
        assert len(set(body_slice("motionx"))) == 322
        assert len(set(body_slice("rot6d"))) == 425
        assert len(set(body_slice("openpose17"))) == 34


class TestSTMoGenE2E:
    def test_init_has_all_subtrees(self, arch_and_vars):
        _, variables, _ = arch_and_vars
        params = variables["params"]
        assert "text_enc" in params and "clip" in params["text_enc"]
        assert "joint_embed" in params and "out" in params and "block_0" in params

    def test_decoder_zero_init_outputs_zero(self, arch_and_vars):
        arch, variables, batch = arch_and_vars
        t = jnp.zeros((2,), jnp.int32)
        xf = arch.encode_text(variables, batch["text_ids"])
        out = arch.model.apply(variables, batch["motion"], t,
                               motion_mask=batch["motion_mask"],
                               motion_length=batch["motion_length"],
                               xf_out=xf, mode="test")
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_train_loss_runs_and_has_aux(self, arch_and_vars):
        arch, variables, batch = arch_and_vars
        loss, logs = jax.jit(arch.loss)(variables, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        assert "recon_loss" in logs and "moe_route_loss" in logs
        # zero-init decoder -> pred=0 -> recon == masked mean of target^2
        motion = np.asarray(batch["motion"])
        mask = np.asarray(batch["motion_mask"])
        m = motion.copy()
        m[:, :, 159:309] = 0  # face_no_loss
        per_frame = (m ** 2).mean(-1) * mask
        want = (per_frame.sum(1) / mask.sum(1)).mean()
        np.testing.assert_allclose(float(logs["recon_loss"]), want, rtol=1e-4)

    def test_loss_grads_flow_but_not_to_clip(self, arch_and_vars):
        arch, variables, batch = arch_and_vars
        grads = jax.grad(lambda v: arch.loss(v, batch, jax.random.PRNGKey(2))[0])(variables)
        gp = grads["params"]
        clip_norm = sum(float(jnp.abs(g).sum())
                        for g in jax.tree_util.tree_leaves(gp["text_enc"]["clip"]))
        assert clip_norm == 0.0, "CLIP must be frozen"
        enc_norm = sum(float(jnp.abs(g).sum())
                       for g in jax.tree_util.tree_leaves(gp["joint_embed"]))
        assert enc_norm > 0.0

    def test_ddim_sampling_jitted(self, arch_and_vars):
        arch, variables, batch = arch_and_vars
        sample = jax.jit(lambda v, b, r: arch.sample(v, b, r))(
            variables, batch, jax.random.PRNGKey(3))
        assert sample.shape == (2, T, D_IN)
        assert np.isfinite(np.asarray(sample)).all()

    def test_gt_inference_mode(self):
        arch = build_architecture(tiny_cfg(inference_type="gt"))
        rng = np.random.RandomState(1)
        batch = make_batch(rng)
        out = arch.sample(None, batch, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(batch["motion"]))

    def test_split_results(self, arch_and_vars):
        arch, _, batch = arch_and_vars
        results = dict(batch)
        results["pred_motion"] = batch["motion"]
        results["motion_metas"] = [{"text": "a person walks"}, {"text": "someone waves"}]
        out = arch.split_results(results)
        assert len(out) == 2 and out[0]["text"] == "a person walks"
        assert out[0]["pred_motion"].shape == (T, D_IN)


class TestMixedPrecision:
    def test_bf16_train_step_keeps_f32_master(self, arch_and_vars):
        """fp16 option (reference Fp16OptimizerHook, apis/train.py:119-128):
        forward/backward in bfloat16, float32 master params + grads."""
        from motioncraft_tpu.apis.train import make_train_step
        from motioncraft_tpu.parallel import create_train_state
        arch, variables, batch = arch_and_vars
        state = create_train_state(variables["params"], {"type": "Adam", "lr": 1e-4})
        step = jax.jit(make_train_step(arch, fp16=dict(dtype="bfloat16",
                                                       loss_scale=8.0)))
        new_state, logs = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(logs["loss"]))
        leaves = jax.tree_util.tree_leaves(new_state.params)
        assert all(l.dtype == jnp.float32 for l in leaves
                   if jnp.issubdtype(l.dtype, jnp.floating))
        # params actually moved
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params)
        assert max(jax.tree_util.tree_leaves(diff)) > 0

    def test_bf16_and_f32_losses_close(self, arch_and_vars):
        from motioncraft_tpu.apis.train import make_train_step
        from motioncraft_tpu.parallel import create_train_state
        arch, variables, batch = arch_and_vars
        state = create_train_state(variables["params"], {"type": "Adam", "lr": 1e-4})
        rng = jax.random.PRNGKey(2)
        _, logs32 = jax.jit(make_train_step(arch))(state, batch, rng)
        _, logs16 = jax.jit(make_train_step(arch, fp16=dict()))(state, batch, rng)
        # same RNG path; bf16 rounding only
        assert abs(float(logs32["loss"]) - float(logs16["loss"])) < 0.05 * (
            abs(float(logs32["loss"])) + 1e-6) + 0.02


class TestRemat:
    def test_remat_train_step_matches_plain(self):
        """remat=True (jax.checkpoint over decoder blocks) computes the same
        loss and gradients as the plain path."""
        import numpy as np
        from motioncraft_tpu.apis import (build_flagship, make_text_batch,
                                          tiny_t2m_cfg)
        from motioncraft_tpu.apis.train import make_train_step
        from motioncraft_tpu.parallel import create_train_state
        cfg = tiny_t2m_cfg()
        arch = build_flagship(cfg)
        cfg_r = tiny_t2m_cfg()
        cfg_r["model"]["remat"] = True
        arch_r = build_flagship(cfg_r)
        batch = make_text_batch(["a person walks", "a person waves"],
                                max_seq_len=16)
        v = arch.init(jax.random.PRNGKey(0), batch)
        state = create_train_state(v["params"], {"type": "Adam", "lr": 1e-4})
        rng = jax.random.PRNGKey(1)
        s1, logs1 = jax.jit(make_train_step(arch))(state, batch, rng)
        s2, logs2 = jax.jit(make_train_step(arch_r))(state, batch, rng)
        np.testing.assert_allclose(float(logs1["loss"]), float(logs2["loss"]),
                                   rtol=1e-5)
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), s1.params, s2.params)
        assert max(jax.tree_util.tree_leaves(d)) < 1e-5
