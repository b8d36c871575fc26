"""Step caching (SmoothCache-style layer-residual reuse, diffusion/stepcache.py).

Covers: flag-table generation (pattern + calibration), exactness of the
all-compute cached path, eager-loop equivalence of the scanned cached sampler
under a real reuse pattern, calibration error collection, RePaint-harmonized
composition, and the opt-in guards.  The reference has no equivalent feature —
its only cost knob is timestep respacing (gaussian_diffusion.py:1346-1404).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motioncraft_tpu.apis import build_flagship, make_text_batch, tiny_t2m_cfg
from motioncraft_tpu.diffusion import (StepCacheConfig, ddim_step,
                                       flags_from_errors, model_timesteps,
                                       pattern_flags)
from motioncraft_tpu.diffusion.sampling import Outpainting, RepaintConfig


# --------------------------------------------------------------- flag tables

def test_pattern_flags_uniform():
    cfg = StepCacheConfig(reuse_every=2, warmup=1, tail=1)
    f = pattern_flags(6, 3, cfg)
    # run counter: s0 compute (warmup), s1 reuse, s2 compute, s3 reuse,
    # s4 compute, s5 compute (tail)
    assert f.shape == (6, 3)
    np.testing.assert_array_equal(f[:, 0], [False, True, False, True, False, False])
    assert (f == f[:, :1]).all()  # uniform across layers


def test_pattern_flags_denoise_mask_resets_runs():
    cfg = StepCacheConfig(reuse_every=2, warmup=1, tail=0)
    mask = np.array([True, True, False, True, True])  # step 2 is a re-noise
    f = pattern_flags(5, 1, cfg, denoise_mask=mask)
    # s0 compute, s1 reuse, s2 skipped (diffuse), s3 compute (run reset),
    # s4 reuse
    np.testing.assert_array_equal(f[:, 0], [False, True, False, False, True])


def test_pattern_flags_validation():
    with pytest.raises(ValueError):
        StepCacheConfig(warmup=0)
    with pytest.raises(ValueError):
        StepCacheConfig(reuse_every=0)
    bad = np.ones((4, 2), bool)  # step 0 reuse is illegal
    with pytest.raises(ValueError):
        pattern_flags(4, 2, StepCacheConfig(flags=bad))
    with pytest.raises(ValueError):
        pattern_flags(5, 2, StepCacheConfig(flags=np.zeros((4, 2), bool)))


def test_explicit_flags_respect_denoise_mask():
    # an explicit table flagging reuse on the first denoise step after an
    # ``undo`` jump would replay a residual cached across the discontinuity
    mask = np.array([True, True, False, True, True])
    flags = np.zeros((5, 2), bool)
    flags[3, 0] = True  # step 3 is the first denoise after the jump at 2
    with pytest.raises(ValueError, match="after a re-noise jump"):
        pattern_flags(5, 2, StepCacheConfig(flags=flags), denoise_mask=mask)
    # the same table is fine when the reuse sits later in the run
    ok = np.zeros((5, 2), bool)
    ok[4, 0] = True
    out = pattern_flags(5, 2, StepCacheConfig(flags=ok), denoise_mask=mask)
    np.testing.assert_array_equal(out, ok)


def test_flags_from_errors():
    errors = np.array([[9.0], [0.01], [0.01], [0.01], [0.01], [0.01]])
    f = flags_from_errors(errors, threshold=0.05, max_consecutive=2, tail=1)
    # step 0 computes; step 1 sees errors[0]=9 (vs zero cache) -> compute;
    # steps 2,3 reuse; step 4 hits max_consecutive -> compute; step 5 tail
    np.testing.assert_array_equal(f[:, 0], [False, False, True, True, False, False])


# ------------------------------------------------------------ sampler parity

@pytest.fixture(scope="module")
def arch_and_vars():
    arch = build_flagship(tiny_t2m_cfg(max_seq_len=16))
    batch = make_text_batch(["a person walks", "a person jumps"], max_seq_len=16)
    variables = arch.init(jax.random.PRNGKey(0), batch)
    # perturb away from the zero-init output heads: an untouched model has
    # exactly-zero block residuals, which would make every assertion vacuous
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    ks = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              if jnp.issubdtype(l.dtype, jnp.floating) else l
              for l, k in zip(leaves, ks)]
    return arch, jax.tree_util.tree_unflatten(treedef, leaves), batch


def test_all_compute_is_exact(arch_and_vars):
    arch, variables, batch = arch_and_vars
    rng = jax.random.PRNGKey(7)
    base = jax.jit(arch.sample)(variables, batch, rng)
    cfg = StepCacheConfig(reuse_every=1, warmup=1, tail=0)
    cached = jax.jit(lambda v, b, r: arch.sample(v, b, r, step_cache=cfg))(
        variables, batch, rng)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(cached))


def test_reuse_matches_eager_reference(arch_and_vars):
    """The scanned cached sampler == an eager python loop threading the same
    cache/flags through ddim_step (proves the scan wiring, flag alignment and
    carry threading, not just 'it runs')."""
    arch, variables, batch = arch_and_vars
    d = arch.diffusion_test
    rng = jax.random.PRNGKey(11)
    cfg = StepCacheConfig(reuse_every=2, warmup=1, tail=0)

    out_scan = jax.jit(lambda v, b, r: arch.sample(v, b, r, step_cache=cfg))(
        variables, batch, rng)

    # eager restatement of MotionDiffusion.sample + ddim_sample_loop
    motion = batch["motion"].astype(jnp.float32)
    B, T, D = motion.shape
    xf_out = arch.encode_text(variables, batch["text_ids"])

    def model_fn(x, t_model, cache, flags):
        out, new_cache = arch.model.apply(
            variables, x, t_model, motion_mask=batch["motion_mask"].astype(jnp.float32),
            motion_length=batch["motion_length"], xf_out=xf_out,
            num_intervals=1, mode="test", step_cache=cache, cache_flags=flags)
        return out.astype(jnp.float32), new_cache

    r_noise, r_loop = jax.random.split(rng)
    x = jax.random.normal(r_noise, (B, T, D), jnp.float32)
    flags = jnp.asarray(pattern_flags(d.num_timesteps, arch.model.num_layers, cfg))
    assert bool(flags.any()), "pattern must actually reuse for this test"
    cache = arch.model.make_step_cache(B, T)
    key = r_loop
    for s, t_scalar in enumerate(range(d.num_timesteps - 1, -1, -1)):
        key, sub = jax.random.split(key)
        t = jnp.full((B,), t_scalar, jnp.int32)
        holder = {}

        def mf(xx, tt):
            out, holder["c"] = model_fn(xx, tt, cache, flags[s])
            return out

        x, _, _ = ddim_step(d, mf, x, t, sub, eta=0.0, clip_denoised=False)
        cache = holder["c"]
    out_eager = arch.post_process(x)

    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_eager),
                               rtol=0, atol=1e-5)


def test_reuse_differs_from_baseline(arch_and_vars):
    """With perturbed weights the reuse branch must actually take effect:
    cached output differs from the exact sampler but stays finite."""
    arch, variables, batch = arch_and_vars
    rng = jax.random.PRNGKey(13)
    base = jax.jit(arch.sample)(variables, batch, rng)
    cfg = StepCacheConfig(reuse_every=2, warmup=1, tail=0)
    out = jax.jit(lambda v, b, r: arch.sample(v, b, r, step_cache=cfg))(
        variables, batch, rng)
    assert bool(jnp.isfinite(out).all())
    assert float(jnp.abs(out - base).max()) > 0.0


def test_collect_errors(arch_and_vars):
    arch, variables, batch = arch_and_vars
    rng = jax.random.PRNGKey(17)
    base = jax.jit(arch.sample)(variables, batch, rng)
    cfg = StepCacheConfig(collect_errors=True)
    out, errs = jax.jit(lambda v, b, r: arch.sample(v, b, r, step_cache=cfg))(
        variables, batch, rng)
    d = arch.diffusion_test
    assert errs.shape == (d.num_timesteps, arch.model.num_layers)
    # all-compute probe: the sample itself is exact
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))
    # steps >=1 measure real residual change on a perturbed model
    assert (np.asarray(errs)[1:] > 0).all()
    # ...and the calibrated table round-trips into a runnable config
    flags = flags_from_errors(np.asarray(errs), threshold=np.inf, tail=1)
    out2 = jax.jit(lambda v, b, r: arch.sample(
        v, b, r, step_cache=StepCacheConfig(flags=flags)))(variables, batch, rng)
    assert bool(jnp.isfinite(out2).all())


def test_harmonize_composes(arch_and_vars):
    """RePaint-harmonized windowed sampling accepts a step cache: all-compute
    flags reproduce the uncached harmonized output to <=2 ulp."""
    arch, variables, batch = arch_and_vars
    motion = batch["motion"].astype(jnp.float32)
    B, T, D = motion.shape
    mask = jnp.zeros((B, T, D), bool).at[:, :4, :].set(True)
    outp = Outpainting(mask=mask, gt=motion)
    rp = RepaintConfig(overlap_len=4, jump_length=2, jump_n_sample=2)
    rng = jax.random.PRNGKey(19)

    def run(step_cache):
        a = build_flagship(tiny_t2m_cfg(max_seq_len=16))
        a.repaint_cfg = rp
        return jax.jit(lambda v, b, r: a.sample(
            v, b, r, outpainting=outp, step_cache=step_cache))(variables, batch, rng)

    base = run(None)
    exact = run(StepCacheConfig(reuse_every=1, warmup=1, tail=0))
    # all-compute == uncached up to XLA fusion reassociation: the layer-0
    # CFG-dedup concats (cfg_layer0_dedup, attentions.py STMA) fuse
    # differently inside the cached path's lax.cond branches than in the
    # straight-line stack on the multi-dispatch harmonized loop (<=2 ulp);
    # single-dispatch bit-exactness is pinned by test_all_compute_is_exact
    np.testing.assert_allclose(np.asarray(base), np.asarray(exact), atol=1e-6)
    reuse = run(StepCacheConfig(reuse_every=2, warmup=1, tail=0))
    assert bool(jnp.isfinite(reuse).all())


def test_guards(arch_and_vars):
    arch, variables, batch = arch_and_vars
    with pytest.raises(ValueError, match="ddim"):
        arch.sample(variables, batch, jax.random.PRNGKey(0),
                    inference_type="ddpm", step_cache=StepCacheConfig())
    with pytest.raises(NotImplementedError):
        # calibration is defined on the plain loop only
        mask = jnp.zeros_like(batch["motion"], dtype=bool).at[:, :4, :].set(True)
        arch.sample(variables, batch, jax.random.PRNGKey(0),
                    outpainting=Outpainting(mask=mask, gt=batch["motion"].astype(jnp.float32)),
                    step_cache=StepCacheConfig(collect_errors=True))
    # plain-loop (no_repaint) outpainting with a tail-tracking repaint config:
    # cache_errors and noisy_tail share the return slot — must refuse, not
    # silently drop the tail
    old = arch.repaint_cfg
    try:
        arch.repaint_cfg = RepaintConfig(no_repaint=True, same_overlap_noisy=True)
        mask = jnp.zeros_like(batch["motion"], dtype=bool).at[:, :4, :].set(True)
        with pytest.raises(ValueError, match="tail-tracking"):
            arch.sample(variables, batch, jax.random.PRNGKey(0),
                        outpainting=Outpainting(mask=mask,
                                                gt=batch["motion"].astype(jnp.float32)),
                        step_cache=StepCacheConfig(collect_errors=True))
    finally:
        arch.repaint_cfg = old


# ------------------------------------------------ ControlNet (S2G) caching

@pytest.fixture(scope="module")
def s2g_arch_and_vars():
    """Tiny ControlNet S2G arch for cached-sampler parity (the long-form
    protocol's model; reference controlnet.py:108-465)."""
    from motioncraft_tpu.registry import build_architecture
    heads, lat, T = 12, 8, 16
    base = dict(type="STMoGenTransformer", input_feats=322, max_seq_len=T,
                latent_dim=lat * heads, time_embed_dim=32, num_layers=3,
                ca_block_cfg=dict(type="STMA", latent_dim=lat,
                                  text_latent_dim=16, num_heads=heads,
                                  num_text_heads=1, num_experts=4, topk=2,
                                  gate_type="cosine_top", gate_noise=0.0,
                                  ffn_dim=16, time_embed_dim=32,
                                  max_seq_len=T, max_text_seq_len=77,
                                  temporal_comb=False, dropout=0),
                ffn_cfg=dict(latent_dim=lat, ffn_dim=16, dropout=0,
                             time_embed_dim=32, num_heads=heads),
                text_encoder=dict(pretrained_model="clip", latent_dim=16,
                                  num_layers=1, ff_size=16, dropout=0,
                                  use_text_proj=False, clip_width=32,
                                  clip_layers=1),
                pose_encoder_cfg=dict(dataset_name="motionx", latent_dim=lat,
                                      input_dim=322),
                pose_decoder_cfg=dict(dataset_name="motionx", latent_dim=lat,
                                      output_dim=322),
                scale_func_cfg=dict(scale=6.5))
    cfg = dict(type="MotionDiffusion",
               model=dict(type="ControlT2MHalf", base_model=base,
                          copy_blocks_num=1, control_cond_feats=2,
                          condition_encode_cfg=dict(
                              dataset_name="beats2",
                              condition_pre_encode=True,
                              condition_pre_encode_type="wav",
                              condition_latent_dim=16,
                              control_cond_feats=2, condition_cfg=True)),
               loss_recon=dict(type="MSELoss", loss_weight=1,
                               reduction="none"),
               diffusion_train=dict(beta_scheduler="linear",
                                    diffusion_steps=1000,
                                    model_mean_type="start_x",
                                    model_var_type="fixed_large"),
               diffusion_test=dict(beta_scheduler="linear",
                                   diffusion_steps=1000,
                                   model_mean_type="start_x",
                                   model_var_type="fixed_large", respace="6"),
               inference_type="ddim", loss_reduction="batch",
               repaint=dict(overlap_len=4, add_blend=True, jump_length=3,
                            jump_n_sample=2))
    arch = build_architecture(cfg)
    rate = 16000 // 30
    batch = make_text_batch(["someone speaks", "someone else speaks"],
                            max_seq_len=16)
    batch["c"] = np.random.RandomState(0).randn(2, 16 * rate, 2).astype(np.float32)
    variables = arch.init(jax.random.PRNGKey(0), batch)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    ks = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              if jnp.issubdtype(l.dtype, jnp.floating) else l
              for l, k in zip(leaves, ks)]
    return arch, jax.tree_util.tree_unflatten(treedef, leaves), batch


def test_controlnet_all_compute_is_exact(s2g_arch_and_vars):
    """All-compute flags through the dict {h, c} cache are bit-identical to
    the uncached ControlNet sampler (incl. the c_skip-injected layers)."""
    arch, variables, batch = s2g_arch_and_vars
    rng = jax.random.PRNGKey(7)
    base = jax.jit(arch.sample)(variables, batch, rng)
    cfg = StepCacheConfig(reuse_every=1, warmup=1, tail=0)
    cached = jax.jit(lambda v, b, r: arch.sample(v, b, r, step_cache=cfg))(
        variables, batch, rng)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(cached))


def test_controlnet_reuse_runs_and_differs(s2g_arch_and_vars):
    """A real reuse pattern produces finite output that differs from exact
    (the cond actually took the reuse branch) but stays close (the
    SmoothCache premise holds for the control-injected chain too)."""
    arch, variables, batch = s2g_arch_and_vars
    rng = jax.random.PRNGKey(7)
    base = np.asarray(jax.jit(arch.sample)(variables, batch, rng))
    cfg = StepCacheConfig(reuse_every=2, warmup=1, tail=1)
    reuse = np.asarray(jax.jit(
        lambda v, b, r: arch.sample(v, b, r, step_cache=cfg))(
        variables, batch, rng))
    assert np.isfinite(reuse).all()
    assert np.abs(reuse - base).max() > 0
    denom = max(1.0, float(np.abs(base).max()))
    assert np.abs(reuse - base).max() / denom < 0.5


def test_windowed_step_cache_all_compute_exact(s2g_arch_and_vars):
    """step_cache threads through the windowed long-form path: all-compute
    flags reproduce the uncached windowed output to <=2 ulp (incl. the
    RePaint harmonized windows)."""
    from motioncraft_tpu.apis.windowed import windowed_sample

    arch, variables, batch = s2g_arch_and_vars
    rate = 16000 // 30
    total, window, pre = 40, 16, 4
    audio = np.random.RandomState(3).randn(total * rate, 2).astype(np.float32)

    def maker(start, end):
        b = make_text_batch(["someone speaks"], max_seq_len=window)
        b["c"] = audio[start * rate:end * rate][None]
        return b

    kw = dict(total_frames=total, window=window, pre_frames=pre,
              use_repaint=True, repaint=RepaintConfig(overlap_len=pre,
                                                      add_blend=True,
                                                      jump_length=3,
                                                      jump_n_sample=2))
    base = windowed_sample(arch, variables, maker,
                           rng=jax.random.PRNGKey(5), **kw)
    exact = windowed_sample(arch, variables, maker,
                            rng=jax.random.PRNGKey(5),
                            step_cache=StepCacheConfig(reuse_every=1,
                                                       warmup=1, tail=0),
                            **kw)
    # <=2 ulp, not bit-exact: see the fusion-reassociation note in
    # test_harmonize_composes (layer-0 CFG dedup under lax.cond)
    np.testing.assert_allclose(base, exact, atol=1e-6)
    reuse = windowed_sample(arch, variables, maker,
                            rng=jax.random.PRNGKey(5),
                            step_cache=StepCacheConfig(reuse_every=2),
                            **kw)
    assert reuse.shape == base.shape and np.isfinite(reuse).all()
