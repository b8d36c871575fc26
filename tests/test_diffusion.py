"""Numerical parity tests for the diffusion math core.

Golden values are re-derived in numpy float64 straight from the DDPM/DDIM
equations (Ho et al. 2020 eq. 4/7; Song et al. 2021 eq. 12), independent of
the implementation under test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motioncraft_tpu.diffusion import (create_diffusion, ddim_sample_loop, ddim_step,
                                       get_named_beta_schedule, get_schedule_jump_cjm_ddim,
                                       p_mean_variance, p_sample_loop, q_sample,
                                       space_timesteps, training_losses, model_timesteps)
from motioncraft_tpu.diffusion.sampling import Outpainting, RepaintConfig


def ref_tables(T=1000):
    betas = np.linspace(1e-4, 0.02, T, dtype=np.float64)
    alphas = 1 - betas
    ab = np.cumprod(alphas)
    ab_prev = np.append(1.0, ab[:-1])
    return betas, alphas, ab, ab_prev


class TestSchedules:
    def test_linear_schedule_scaled(self):
        b = get_named_beta_schedule("linear", 1000)
        assert b[0] == pytest.approx(1e-4) and b[-1] == pytest.approx(0.02)
        b500 = get_named_beta_schedule("linear", 500)
        assert b500[0] == pytest.approx(2e-4) and b500[-1] == pytest.approx(0.04)

    def test_cosine_schedule_bounded(self):
        b = get_named_beta_schedule("cosine", 1000)
        assert (b > 0).all() and (b <= 0.999).all()

    def test_space_timesteps_sections(self):
        # '15,15,8,6,6' over 1000 -> 50 steps, one per section stride
        steps = space_timesteps(1000, "15,15,8,6,6")
        assert len(steps) == 50
        assert min(steps) == 0
        steps_list = space_timesteps(300, [10, 15, 20])
        assert len(steps_list) == 45

    def test_space_timesteps_ddim(self):
        steps = space_timesteps(1000, "ddim50")
        assert steps == set(range(0, 1000, 20))

    def test_jump_schedule_valid(self):
        ts = get_schedule_jump_cjm_ddim(50, jump_length=3, jump_n_sample=2)
        assert ts[0] == int(50 * 0.6) - 1 and ts[-1] == -1
        for a, b in zip(ts[:-1], ts[1:]):
            assert abs(a - b) == 1


class TestQSample:
    def test_q_sample_golden(self, rng):
        d = create_diffusion(diffusion_steps=1000)
        _, _, ab, _ = ref_tables()
        x0 = rng.randn(4, 7, 5).astype(np.float32)
        noise = rng.randn(4, 7, 5).astype(np.float32)
        t = np.array([0, 10, 500, 999], dtype=np.int32)
        got = np.asarray(q_sample(d, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)))
        want = (np.sqrt(ab[t])[:, None, None].astype(np.float32) * x0
                + np.sqrt(1 - ab[t])[:, None, None].astype(np.float32) * noise)
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestPMeanVariance:
    def test_start_x_fixed_large_golden(self, rng):
        d = create_diffusion(diffusion_steps=1000, model_mean_type="start_x",
                             model_var_type="fixed_large")
        betas, alphas, ab, ab_prev = ref_tables()
        x = rng.randn(2, 3, 4).astype(np.float32)
        x0 = rng.randn(2, 3, 4).astype(np.float32)
        t = np.array([5, 700], dtype=np.int32)
        out = p_mean_variance(d, jnp.asarray(x0), jnp.asarray(x), jnp.asarray(t))
        # posterior mean in f64
        c1 = betas * np.sqrt(ab_prev) / (1 - ab)
        c2 = (1 - ab_prev) * np.sqrt(alphas) / (1 - ab)
        want_mean = (c1[t][:, None, None].astype(np.float32) * x0
                     + c2[t][:, None, None].astype(np.float32) * x)
        np.testing.assert_allclose(np.asarray(out["mean"]), want_mean, rtol=2e-5)
        # fixed_large variance = append(posterior_var[1], betas[1:])
        post_var = betas * (1 - ab_prev) / (1 - ab)
        fl = np.append(post_var[1], betas[1:])
        np.testing.assert_allclose(np.asarray(out["variance"])[:, 0, 0],
                                   fl[t].astype(np.float32), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out["pred_xstart"]), x0)

    def test_epsilon_pred_xstart_golden(self, rng):
        d = create_diffusion(diffusion_steps=1000, model_mean_type="epsilon",
                             model_var_type="fixed_small")
        _, _, ab, _ = ref_tables()
        x = rng.randn(2, 3, 4).astype(np.float32)
        eps = rng.randn(2, 3, 4).astype(np.float32)
        t = np.array([100, 900], dtype=np.int32)
        out = p_mean_variance(d, jnp.asarray(eps), jnp.asarray(x), jnp.asarray(t))
        want_x0 = (np.sqrt(1 / ab[t])[:, None, None] * x
                   - np.sqrt(1 / ab[t] - 1)[:, None, None] * eps).astype(np.float32)
        np.testing.assert_allclose(np.asarray(out["pred_xstart"]), want_x0, rtol=3e-4, atol=1e-5)

    def test_learned_range_split(self, rng):
        d = create_diffusion(diffusion_steps=100, model_mean_type="epsilon",
                             model_var_type="learned_range")
        x = rng.randn(2, 3, 4).astype(np.float32)
        model_out = rng.randn(2, 6, 4).astype(np.float32)
        t = np.array([4, 50], dtype=np.int32)
        out = p_mean_variance(d, jnp.asarray(model_out), jnp.asarray(x), jnp.asarray(t))
        assert out["mean"].shape == x.shape
        assert np.isfinite(np.asarray(out["log_variance"])).all()


class TestRespacing:
    def test_respaced_betas_golden(self):
        # respaced beta_i = 1 - ab[i]/ab[last kept]
        d = create_diffusion(diffusion_steps=1000, respace="15,15,8,6,6")
        assert d.num_timesteps == 50
        kept = sorted(space_timesteps(1000, "15,15,8,6,6"))
        _, _, ab, _ = ref_tables()
        last = 1.0
        want = []
        for i in kept:
            want.append(1 - ab[i] / last)
            last = ab[i]
        np.testing.assert_allclose(np.asarray(d.betas), np.array(want, dtype=np.float32), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(d.timestep_map), np.array(kept, dtype=np.int32))

    def test_model_timesteps_mapping(self):
        d = create_diffusion(diffusion_steps=1000, respace="ddim50")
        t = jnp.array([0, 1, 49])
        np.testing.assert_array_equal(np.asarray(model_timesteps(d, t)), [0, 20, 980])


class TestDDIM:
    def _golden_ddim_step(self, x, x0_pred, t, betas_sub, eta=0.0):
        alphas = 1 - betas_sub
        ab = np.cumprod(alphas)
        ab_prev = np.append(1.0, ab[:-1])
        eps = (np.sqrt(1 / ab[t])[:, None, None] * x - x0_pred) / np.sqrt(1 / ab[t] - 1)[:, None, None]
        mean = (x0_pred * np.sqrt(ab_prev[t])[:, None, None]
                + np.sqrt(1 - ab_prev[t])[:, None, None] * eps)
        return mean

    def test_ddim_step_eta0_golden(self, rng):
        d = create_diffusion(diffusion_steps=1000, respace="ddim50")
        kept = sorted(space_timesteps(1000, "ddim50"))
        _, _, ab_full, _ = ref_tables()
        last = 1.0
        sub_betas = []
        for i in kept:
            sub_betas.append(1 - ab_full[i] / last)
            last = ab_full[i]
        sub_betas = np.array(sub_betas)

        x = rng.randn(2, 5, 3).astype(np.float32)
        x0_pred = rng.randn(2, 5, 3).astype(np.float32)
        t = np.array([10, 30], dtype=np.int32)

        model_fn = lambda xx, tt: jnp.asarray(x0_pred)
        sample, pred, _ = ddim_step(d, model_fn, jnp.asarray(x), jnp.asarray(t),
                                    jax.random.PRNGKey(0), eta=0.0)
        want = self._golden_ddim_step(x.astype(np.float64), x0_pred.astype(np.float64), t, sub_betas)
        np.testing.assert_allclose(np.asarray(sample), want.astype(np.float32), rtol=2e-4, atol=2e-5)

    def test_ddim_loop_converges_to_x0_with_perfect_model(self, rng):
        """With a model that always predicts the true x0, DDIM(eta=0) must land on x0."""
        d = create_diffusion(diffusion_steps=1000, respace="ddim50")
        x0 = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
        model_fn = lambda x, t: jnp.broadcast_to(x0, x.shape)
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        res = ddim_sample_loop(d, model_fn, noise, jax.random.PRNGKey(2), eta=0.0)
        np.testing.assert_allclose(np.asarray(res.sample), np.asarray(x0), rtol=1e-3, atol=1e-3)

    def test_ddpm_loop_shape_and_finite(self, rng):
        d = create_diffusion(diffusion_steps=20)
        model_fn = lambda x, t: jnp.zeros_like(x)
        noise = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 3))
        out = p_sample_loop(d, model_fn, noise, jax.random.PRNGKey(1))
        assert out.shape == (2, 4, 3) and np.isfinite(np.asarray(out)).all()

    def test_repaint_keeps_gt_region(self, rng):
        d = create_diffusion(diffusion_steps=1000, respace="ddim50")
        B, T, D = 2, 8, 3
        gt = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
        mask = jnp.zeros((B, T, D), bool).at[:, :4, :].set(True)
        model_fn = lambda x, t: jnp.zeros_like(x)
        noise = jax.random.normal(jax.random.PRNGKey(3), (B, T, D))
        res = ddim_sample_loop(
            d, model_fn, noise, jax.random.PRNGKey(4), eta=0.0,
            outpainting=Outpainting(mask=mask, gt=gt),
            repaint=RepaintConfig(overlap_len=4, add_blend=False))
        # masked region ends at (approximately) the clean GT after the final step
        got = np.asarray(res.sample)[:, :4, :]
        np.testing.assert_allclose(got, np.asarray(gt)[:, :4, :], atol=0.1)

    def test_harmonize_loop_runs(self, rng):
        d = create_diffusion(diffusion_steps=1000, respace="ddim50")
        B, T, D = 1, 8, 3
        gt = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
        mask = jnp.zeros((B, T, D), bool).at[:, :4, :].set(True)
        model_fn = lambda x, t: jnp.zeros_like(x)
        noise = jax.random.normal(jax.random.PRNGKey(5), (B, T, D))
        res = ddim_sample_loop(
            d, model_fn, noise, jax.random.PRNGKey(6), eta=0.0,
            outpainting=Outpainting(mask=mask, gt=gt),
            repaint=RepaintConfig(overlap_len=4, jump_length=3, jump_n_sample=2,
                                  same_overlap_noisy=True))
        assert np.isfinite(np.asarray(res.sample)).all()
        assert res.noisy_tail is not None and res.noisy_tail.shape == (50, B, 4, D)


class TestTrainingLosses:
    def test_start_x_target(self, rng):
        d = create_diffusion(diffusion_steps=1000, model_mean_type="start_x")
        x0 = jnp.asarray(rng.randn(3, 6, 4).astype(np.float32))
        noise = jnp.asarray(rng.randn(3, 6, 4).astype(np.float32))
        t = jnp.asarray([0, 500, 999], dtype=jnp.int32)
        model_fn = lambda x, tt: x * 0.5
        out = training_losses(d, model_fn, x0, t, noise)
        np.testing.assert_allclose(np.asarray(out["target"]), np.asarray(x0))
        want_xt = np.asarray(q_sample(d, x0, t, noise))
        np.testing.assert_allclose(np.asarray(out["pred"]), want_xt * 0.5, rtol=1e-6)

    def test_epsilon_target(self, rng):
        d = create_diffusion(diffusion_steps=100, model_mean_type="epsilon")
        x0 = jnp.asarray(rng.randn(2, 4, 3).astype(np.float32))
        noise = jnp.asarray(rng.randn(2, 4, 3).astype(np.float32))
        t = jnp.asarray([3, 99], dtype=jnp.int32)
        out = training_losses(d, lambda x, tt: jnp.zeros_like(x), x0, t, noise)
        np.testing.assert_allclose(np.asarray(out["target"]), np.asarray(noise))
        np.testing.assert_allclose(np.asarray(out["mse"]),
                                   np.mean(np.asarray(noise) ** 2, axis=(1, 2)), rtol=1e-6)


class TestSamplers:
    def test_uniform_sampler(self):
        from motioncraft_tpu.diffusion import create_named_schedule_sampler
        s = create_named_schedule_sampler("uniform", 1000)
        t, w = s.sample(jax.random.PRNGKey(0), 64)
        assert t.shape == (64,) and (np.asarray(t) >= 0).all() and (np.asarray(t) < 1000).all()
        np.testing.assert_allclose(np.asarray(w), 1.0)

    def test_loss_second_moment_warmup_and_weights(self):
        from motioncraft_tpu.diffusion import create_named_schedule_sampler
        s = create_named_schedule_sampler("loss-second-moment", 10)
        assert np.allclose(s.weights(), 1.0)
        for _ in range(10):
            s.update_with_all_losses(list(range(10)), [float(i + 1) for i in range(10)])
        w = s.weights()
        assert w.sum() == pytest.approx(1.0)
        assert w[9] > w[0]
