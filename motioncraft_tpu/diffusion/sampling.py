"""Compiled sampling loops: DDPM / DDIM / RePaint-harmonized DDIM.

The reference runs a python ``for`` over timesteps with one CFG-doubled model
call per step (gaussian_diffusion.py:698-796, :925-1118).  Here every loop is
a single jitted ``lax.scan`` over a host-precomputed static schedule:
per-step constants are table lookups inside the scan, RePaint's irregular
jump schedule (scheduler.py:178-208) becomes a static ``(t_last, is_denoise)``
sequence, and the model call is one function handed in by the architecture
(which performs CFG batching internally).  Randomness is explicit: one PRNG
key folded per step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import gaussian as G
from .gaussian import GaussianDiffusion
from .schedules import get_schedule_jump_cjm_ddim

# model_fn(x[B,T,D], t_original[B]) -> model_output[B,T,D]
ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class RepaintConfig:
    """Static RePaint/outpainting knobs (CLI args plumbed as ``opt`` in the
    reference, tools/test.py:46-55 -> gaussian_diffusion.py:855-884,1079-1084)."""

    overlap_len: int = 4
    add_blend: bool = True
    same_overlap_noisy: bool = False
    no_repaint: bool = False
    no_resample: bool = False
    jump_length: int = 3
    jump_n_sample: int = 2


class Outpainting(NamedTuple):
    """Per-window dynamic outpainting state (``y`` dict in the reference)."""

    mask: jnp.ndarray  # bool [B, T, D]; True where GT is kept
    gt: jnp.ndarray  # [B, T, D]
    clip_idx: int = 0  # static window index
    # noised tails saved by the previous window, [num_timesteps, B, overlap, D]
    previous_noisy_tail: Optional[jnp.ndarray] = None


class SampleResult(NamedTuple):
    sample: jnp.ndarray
    pred_xstart: jnp.ndarray
    # [num_timesteps, B, overlap, D] when repaint.same_overlap_noisy else None
    noisy_tail: Optional[jnp.ndarray]
    # [num_steps, num_layers] relative L1 residual change per step/layer when
    # sampling ran with StepCacheConfig(collect_errors=True), else None
    cache_errors: Optional[jnp.ndarray] = None


def _seed_pre_seq(d, x, t, pre_seq, rng):
    """Overwrite leading frames with the noised previous-window output
    (p_sample :663-668 / ddim_sample :816-820)."""
    if pre_seq is None:
        return x
    T = pre_seq.shape[1]
    noise = jax.random.normal(rng, pre_seq.shape, pre_seq.dtype)
    x_t = G.q_sample(d, pre_seq, t, noise)
    return x.at[:, :T, :].set(x_t)


def ddim_step(
    d: GaussianDiffusion,
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    *,
    eta: float = 0.0,
    clip_denoised: bool = False,
    denoised_fn=None,
    pre_seq=None,
    outpainting: Optional[Outpainting] = None,
    repaint: Optional[RepaintConfig] = None,
):
    """One DDIM update (gaussian_diffusion.py:799-886) including the RePaint
    post-sample blend.  Returns (sample, pred_xstart, saved_tail_or_None)."""
    r_seed, r_model, r_noise, r_gt = jax.random.split(rng, 4)
    x = _seed_pre_seq(d, x, t, pre_seq, r_seed)

    model_output = model_fn(x, G.model_timesteps(d, t))
    out = G.p_mean_variance(
        d, model_output, x, t,
        clip_denoised=clip_denoised, denoised_fn=denoised_fn,
        outpainting_mask=None if outpainting is None else outpainting.mask,
        outpainting_gt=None if outpainting is None else outpainting.gt,
    )

    eps = G.predict_eps_from_xstart(d, x, t, out["pred_xstart"])
    alpha_bar = G._extract(d.alphas_cumprod, t, x.ndim)
    alpha_bar_prev = G._extract(d.alphas_cumprod_prev, t, x.ndim)
    sigma = (eta * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
             * jnp.sqrt(1 - alpha_bar / alpha_bar_prev))
    noise = jax.random.normal(r_noise, x.shape, x.dtype)
    mean_pred = (out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
                 + jnp.sqrt(1 - alpha_bar_prev - sigma ** 2) * eps)
    nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
    sample = mean_pred + nonzero * sigma * noise

    saved_tail = None
    if outpainting is not None:
        rp = repaint or RepaintConfig()
        ov = rp.overlap_len
        noise_weight = jnp.sqrt(1 - alpha_bar_prev)
        if rp.same_overlap_noisy and outpainting.clip_idx > 0:
            # reuse the exact noisy tail saved by the previous window at this t
            prev_tail = outpainting.previous_noisy_tail[t[0]]
            weighed_gt = outpainting.gt.at[:, :ov, :].set(prev_tail)
        else:
            gt_part = jnp.sqrt(alpha_bar_prev) * outpainting.gt
            noise_part = noise_weight * jax.random.normal(r_gt, x.shape, x.dtype)
            weighed_gt = gt_part + noise_part
        if rp.add_blend:
            # late-stage linear crossfade over the overlap (:872-875)
            lin = jnp.linspace(0.0, 1.0, ov, dtype=x.dtype).reshape(1, ov, 1)
            blended = weighed_gt[:, :ov, :] * (1 - lin) + sample[:, :ov, :] * lin
            use_blend = (noise_weight.reshape(-1)[0] < 0.2)
            weighed_gt = weighed_gt.at[:, :ov, :].set(
                jnp.where(use_blend, blended, weighed_gt[:, :ov, :]))
        sample = jnp.where(outpainting.mask, weighed_gt, sample)
        if rp.same_overlap_noisy:
            saved_tail = sample[:, -ov:, :]

    return sample, out["pred_xstart"], saved_tail


def p_sample_step(
    d: GaussianDiffusion,
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    *,
    clip_denoised: bool = False,
    denoised_fn=None,
    pre_seq=None,
):
    """One ancestral DDPM update (gaussian_diffusion.py:634-696)."""
    r_seed, r_noise = jax.random.split(rng)
    x = _seed_pre_seq(d, x, t, pre_seq, r_seed)
    model_output = model_fn(x, G.model_timesteps(d, t))
    out = G.p_mean_variance(d, model_output, x, t,
                            clip_denoised=clip_denoised, denoised_fn=denoised_fn)
    noise = jax.random.normal(r_noise, x.shape, x.dtype)
    nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
    sample = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
    return sample, out["pred_xstart"]


def p_sample_loop(
    d: GaussianDiffusion,
    model_fn: ModelFn,
    noise: jnp.ndarray,
    rng: jax.Array,
    *,
    clip_denoised: bool = False,
    denoised_fn=None,
    pre_seq=None,
) -> jnp.ndarray:
    """Full DDPM chain as one scan (p_sample_loop, :698-797)."""
    B = noise.shape[0]
    ts = jnp.arange(d.num_timesteps - 1, -1, -1)

    def body(carry, t_scalar):
        x, key = carry
        key, sub = jax.random.split(key)
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        x, _ = p_sample_step(d, model_fn, x, t, sub,
                             clip_denoised=clip_denoised, denoised_fn=denoised_fn,
                             pre_seq=pre_seq)
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (noise, rng), ts)
    return x


def _wrap_cached_model_fn(model_fn, cache, flags_row):
    """Adapt a cached model_fn ``(x, t, cache, flags) -> (out, new_cache)`` to
    the plain ``(x, t) -> out`` contract ``ddim_step`` expects, capturing the
    new cache through a trace-time holder (the wrapped fn is called exactly
    once per step trace)."""
    holder = {}

    def mf(x, t):
        out, holder["cache"] = model_fn(x, t, cache, flags_row)
        return out

    return mf, holder


def _cache_layers(step_cache0) -> int:
    """Number of reuse-controllable layers (the flags-table width).  A model
    may use a dict cache (e.g. ControlNet carries the control branch's ``c``
    states alongside the layer residuals); by convention the layer-residual
    table lives under key "h"."""
    if isinstance(step_cache0, dict):
        return step_cache0["h"].shape[0]
    return step_cache0.shape[0]


def _cache_error(new_cache, old_cache):
    """Per-layer relative L1 residual change [num_layers] (SmoothCache's
    calibration signal).  Leading axis of the cache pytree is layers."""
    if isinstance(new_cache, dict):
        new_cache, old_cache = new_cache["h"], old_cache["h"]
    axes = tuple(range(1, new_cache.ndim))
    num = jnp.sum(jnp.abs(new_cache.astype(jnp.float32)
                          - old_cache.astype(jnp.float32)), axis=axes)
    den = jnp.sum(jnp.abs(old_cache.astype(jnp.float32)), axis=axes)
    return num / (den + 1e-8)


def ddim_sample_loop(
    d: GaussianDiffusion,
    model_fn: ModelFn,
    noise: jnp.ndarray,
    rng: jax.Array,
    *,
    eta: float = 0.0,
    clip_denoised: bool = False,
    denoised_fn=None,
    pre_seq=None,
    outpainting: Optional[Outpainting] = None,
    repaint: Optional[RepaintConfig] = None,
    step_cache0: Optional[jnp.ndarray] = None,
    cache_cfg=None,
) -> SampleResult:
    """DDIM chain (:925-1049); dispatches to the harmonized RePaint loop when
    an outpainting mask is supplied and resampling is enabled (:962-976).

    When ``step_cache0`` is given, ``model_fn`` must have the cached signature
    ``(x, t, cache, flags[num_layers]) -> (out, new_cache)`` and the per-step
    reuse table from ``cache_cfg`` (diffusion/stepcache.py) is scanned
    alongside the timesteps."""
    if outpainting is not None and not (repaint or RepaintConfig()).no_repaint:
        return ddim_sample_loop_harmonize(
            d, model_fn, noise, rng, eta=eta, clip_denoised=clip_denoised,
            denoised_fn=denoised_fn, outpainting=outpainting,
            repaint=repaint or RepaintConfig(),
            step_cache0=step_cache0, cache_cfg=cache_cfg)

    B = noise.shape[0]
    ts = jnp.arange(d.num_timesteps - 1, -1, -1)
    rp = repaint or RepaintConfig()
    track_tail = outpainting is not None and rp.same_overlap_noisy
    tails0 = (jnp.zeros((d.num_timesteps, B, rp.overlap_len, noise.shape[-1]), noise.dtype)
              if track_tail else None)

    caching = step_cache0 is not None
    collect = caching and getattr(cache_cfg, "collect_errors", False)
    if caching:
        from .stepcache import StepCacheConfig, pattern_flags
        cfg = cache_cfg or StepCacheConfig()
        L = _cache_layers(step_cache0)
        flags_np = (np.zeros((d.num_timesteps, L), bool) if collect
                    else pattern_flags(d.num_timesteps, L, cfg))
        xs = (ts, jnp.asarray(flags_np))
    else:
        xs = (ts, jnp.zeros((d.num_timesteps, 0), bool))

    def body(carry, step):
        x, key, tails, _, cache = carry
        t_scalar, flags_row = step
        key, sub = jax.random.split(key)
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        if caching:
            mf, holder = _wrap_cached_model_fn(model_fn, cache, flags_row)
        else:
            mf, holder = model_fn, {"cache": cache}
        x, pred_x0, tail = ddim_step(
            d, mf, x, t, sub, eta=eta, clip_denoised=clip_denoised,
            denoised_fn=denoised_fn, pre_seq=pre_seq,
            outpainting=outpainting, repaint=repaint)
        new_cache = holder["cache"]
        err = _cache_error(new_cache, cache) if collect else None
        if tails is not None and tail is not None:
            tails = tails.at[t_scalar].set(tail)
        # carry the last pred_xstart instead of stacking all of them
        # (stacked [num_steps, B, T, D] would be ~0.8 GB at the bench shape)
        return (x, key, tails, pred_x0, new_cache), err

    cache0 = step_cache0 if caching else jnp.zeros((0,), noise.dtype)
    (x, _, tails, pred_x0, _), errs = jax.lax.scan(
        body, (noise, rng, tails0, noise, cache0), xs)
    return SampleResult(sample=x, pred_xstart=pred_x0, noisy_tail=tails,
                        cache_errors=errs if collect else None)


def ddim_sample_loop_harmonize(
    d: GaussianDiffusion,
    model_fn: ModelFn,
    noise: jnp.ndarray,
    rng: jax.Array,
    *,
    eta: float = 0.0,
    clip_denoised: bool = False,
    denoised_fn=None,
    outpainting: Outpainting,
    repaint: RepaintConfig,
    step_cache0: Optional[jnp.ndarray] = None,
    cache_cfg=None,
) -> SampleResult:
    """RePaint time-travel DDIM (:1050-1118) as one scan over the static jump
    schedule: denoise steps run ddim_step, diffuse steps run the ``undo``
    re-noising; both live under ``lax.cond`` with static per-step selectors.

    Step caching (stepcache.py) composes: reuse flags are generated against
    the jump schedule's denoise mask so every post-jump step recomputes (the
    ``undo`` re-noising changes x discontinuously), and the residual cache
    passes through diffuse steps untouched."""
    B = noise.shape[0]
    if repaint.no_resample:
        times = get_schedule_jump_cjm_ddim(d.num_timesteps)
    else:
        times = get_schedule_jump_cjm_ddim(
            d.num_timesteps, jump_length=repaint.jump_length,
            jump_n_sample=repaint.jump_n_sample)
    pairs = np.array(list(zip(times[:-1], times[1:])), dtype=np.int32)
    t_last_arr = jnp.asarray(pairs[:, 0])
    denoise_np = (pairs[:, 1] < pairs[:, 0])
    denoise_arr = jnp.asarray(denoise_np.astype(np.int32))

    track_tail = repaint.same_overlap_noisy
    tails0 = (jnp.zeros((d.num_timesteps, B, repaint.overlap_len, noise.shape[-1]), noise.dtype)
              if track_tail else jnp.zeros((1, 1, 1, 1), noise.dtype))

    caching = step_cache0 is not None
    if caching:
        from .stepcache import StepCacheConfig, pattern_flags
        cfg = cache_cfg or StepCacheConfig()
        if getattr(cfg, "collect_errors", False):
            raise NotImplementedError(
                "collect_errors calibration runs on the plain DDIM loop")
        flags = jnp.asarray(pattern_flags(len(pairs), _cache_layers(step_cache0),
                                          cfg, denoise_mask=denoise_np))
    else:
        flags = jnp.zeros((len(pairs), 0), bool)
    cache0 = step_cache0 if caching else jnp.zeros((0,), noise.dtype)

    def body(carry, step):
        x, key, tails, cache = carry
        t_last, is_denoise, flags_row = step
        key, sub = jax.random.split(key)
        t = jnp.full((B,), t_last, dtype=jnp.int32)

        def do_denoise(args):
            x, sub, tails, cache = args
            if caching:
                mf, holder = _wrap_cached_model_fn(model_fn, cache, flags_row)
            else:
                mf, holder = model_fn, {"cache": cache}
            nx, _, tail = ddim_step(
                d, mf, x, t, sub, eta=eta, clip_denoised=clip_denoised,
                denoised_fn=denoised_fn, outpainting=outpainting, repaint=repaint)
            if track_tail and tail is not None:
                tails = jax.lax.dynamic_update_index_in_dim(tails, tail, t_last, 0)
            return nx, tails, holder["cache"]

        def do_diffuse(args):
            x, sub, tails, cache = args
            return G.undo(d, x, t, sub), tails, cache

        x, tails, cache = jax.lax.cond(is_denoise == 1, do_denoise, do_diffuse,
                                       (x, sub, tails, cache))
        return (x, key, tails, cache), None

    (x, _, tails, _), _ = jax.lax.scan(
        body, (noise, rng, tails0, cache0), (t_last_arr, denoise_arr, flags))
    return SampleResult(sample=x, pred_xstart=x, noisy_tail=tails if track_tail else None)
