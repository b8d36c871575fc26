"""Windowed autoregressive long-form generation with overlap seeding /
RePaint outpainting.

Re-designs the hot windowed loops of tools/s2g_test.py:120-260 (64-frame
windows, pre_frames=4) and tools/m2d_test.py:91-309 (120-frame windows,
pre_frames=30): the python loop over windows stays on host (window count is
data-dependent), but each window is ONE jitted DDIM scan — including the CFG
doubling, the RePaint x0-overwrite/blend, and the noisy-tail carry — so the
device never round-trips inside a window.

All carries stay in normalized latent space; de-normalize once at the end
(as the reference does at :229-249).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.sampling import Outpainting, RepaintConfig


def num_windows(total_frames: int, window: int, pre_frames: int) -> int:
    """roundt = (n - pre) // (window - pre) (s2g_test.py:144-146)."""
    return max(1, (total_frames - pre_frames) // (window - pre_frames))


def _jitted_samplers(arch):
    """One set of jitted sample fns per architecture, cached on the instance.

    Re-creating ``jax.jit`` wrappers per call (or per window) would give each
    its own trace cache and recompile the DDIM scan for every recording —
    the long-form S2G test set has dozens.  jit's own cache handles distinct
    shapes/modes underneath a single wrapper."""
    cache = getattr(arch, "_windowed_jit_cache", None)
    if cache is None:
        def outpaint_fn(v, b, r, gt, mask, prev_tail, clip_idx_gt0, dt):
            op = Outpainting(mask=mask, gt=gt,
                             clip_idx=1 if clip_idx_gt0 else 0,
                             previous_noisy_tail=prev_tail)
            return arch.sample(v, b, r, outpainting=op, compute_dtype=dt)

        cache = {
            "plain": jax.jit(
                lambda v, b, r, dt: arch.sample(v, b, r, compute_dtype=dt),
                static_argnums=(3,)),
            "pre_seq": jax.jit(
                lambda v, b, r, p, dt: arch.sample(v, b, r, pre_seq=p,
                                                   compute_dtype=dt),
                static_argnums=(4,)),
            "outpaint": jax.jit(outpaint_fn, static_argnums=(6, 7)),
        }
        arch._windowed_jit_cache = cache
    return cache


def windowed_sample(
    arch,
    variables,
    make_window_batch: Callable[[int, int], Dict],
    *,
    total_frames: int,
    window: int,
    pre_frames: int,
    rng: jax.Array,
    use_repaint: bool = True,
    repaint: Optional[RepaintConfig] = None,
    feat_dim: int = 322,
    compute_dtype=None,
) -> np.ndarray:
    """Generate ``total_frames`` of motion window by window.

    make_window_batch(start, end) returns the batch dict for frames
    [start, end) — motion zeros [1, window, D], motion_mask/length, text_ids,
    and the aligned condition 'c' slice.

    Window seeding: with use_repaint, the first pre_frames of each window are
    outpainted from the previous window's tail via the RePaint harmonized DDIM
    (y={'gt','outpainting_mask'} in the reference, s2g_test.py:188-212);
    otherwise plain tail-seeding via q_sample (pre_seq).
    """
    repaint = repaint or RepaintConfig(overlap_len=pre_frames)
    rounds = num_windows(total_frames, window, pre_frames)
    stride = window - pre_frames
    jits = _jitted_samplers(arch)
    sample_jit = jits["plain"]
    sample_preseq = jits["pre_seq"]
    sample_outpaint = jits["outpaint"]

    out_frames: list = []
    last_window = None  # normalized-space [1, window, D]
    noisy_tail = None

    for w in range(rounds):
        start = w * stride
        end = start + window
        batch = make_window_batch(start, end)
        rng, sub = jax.random.split(rng)

        if w == 0 or not use_repaint:
            if w == 0:
                result = sample_jit(variables, batch, sub, compute_dtype)
            else:
                # seed the overlap with the previous tail (pre_seq path)
                pre_seq = last_window[:, -pre_frames:, :]
                result = sample_preseq(variables, batch, sub, pre_seq,
                                       compute_dtype)
            sample = result[0] if isinstance(result, tuple) else result
        else:
            D = feat_dim
            gt = jnp.zeros((1, window, D)).at[:, :pre_frames, :].set(
                last_window[:, -pre_frames:, :])
            mask = jnp.zeros((1, window, D), bool).at[:, :pre_frames, :].set(True)
            prev_tail = (noisy_tail if noisy_tail is not None else
                         jnp.zeros((arch.diffusion_test.num_timesteps, 1,
                                    repaint.overlap_len, D)))
            result = sample_outpaint(
                variables, batch, sub, gt, mask, prev_tail,
                noisy_tail is not None and repaint.same_overlap_noisy,
                compute_dtype)
            if isinstance(result, tuple):
                sample, noisy_tail = result
            else:
                sample = result

        last_window = sample
        host = np.asarray(jax.device_get(sample))[0]
        if w == 0:
            out_frames.append(host)
        else:
            out_frames.append(host[pre_frames:])

    full = np.concatenate(out_frames, axis=0)
    return full[:total_frames]


def denormalize(motion: np.ndarray, mean: np.ndarray, std: np.ndarray,
                eps: float = 1e-9) -> np.ndarray:
    return motion * (std + eps) + mean


def windowed_sample_batch(
    arch,
    variables,
    make_window_batches,  # list of per-recording make_window_batch callables
    total_frames_list,
    *,
    window: int,
    pre_frames: int,
    rng: jax.Array,
    use_repaint: bool = True,
    repaint: Optional[RepaintConfig] = None,
    feat_dim: int = 322,
    compute_dtype=None,
):
    """Lockstep-batched long-form generation over R recordings.

    The reference protocol (and ``windowed_sample``) generates window w+1
    only after window w of the SAME recording — but windows of DIFFERENT
    recordings are independent, so window w of all R recordings runs as one
    [R, window, D] batch.  A TPU-first redesign of the S2G/M2D eval loop: at
    R=8 the per-window DDIM scan amortizes over 8 recordings, recovering the
    batch efficiency the per-recording protocol throws away.  Recordings
    shorter than the longest keep sampling padded windows whose outputs are
    discarded (bounded waste, grouping by length avoids most of it).

    Returns a list of [total_frames_r, D] arrays, one per recording.
    """
    R = len(make_window_batches)
    assert R == len(total_frames_list)
    repaint = repaint or RepaintConfig(overlap_len=pre_frames)
    rounds = [num_windows(tf, window, pre_frames) for tf in total_frames_list]
    max_rounds = max(rounds)
    stride = window - pre_frames
    jits = _jitted_samplers(arch)

    outs: list = [[] for _ in range(R)]
    last_window = None
    noisy_tail = None
    for w in range(max_rounds):
        start, end = w * stride, w * stride + window
        parts = [mwb(start, end) for mwb in make_window_batches]
        batch: Dict = {}
        for key in parts[0]:
            vals = [np.asarray(p[key]) for p in parts]
            if not np.issubdtype(vals[0].dtype, np.number):
                continue
            # pad trailing-window condition slices to a common length
            maxlen = max(v.shape[1] for v in vals) if vals[0].ndim > 1 else None
            if maxlen is not None:
                vals = [np.pad(v, [(0, 0), (0, maxlen - v.shape[1])]
                               + [(0, 0)] * (v.ndim - 2)) for v in vals]
            batch[key] = np.concatenate(vals, axis=0)
        rng, sub = jax.random.split(rng)

        if w == 0 or not use_repaint:
            if w == 0:
                result = jits["plain"](variables, batch, sub, compute_dtype)
            else:
                pre_seq = last_window[:, -pre_frames:, :]
                result = jits["pre_seq"](variables, batch, sub, pre_seq,
                                         compute_dtype)
            sample = result[0] if isinstance(result, tuple) else result
        else:
            D = feat_dim
            gt = jnp.zeros((R, window, D)).at[:, :pre_frames, :].set(
                last_window[:, -pre_frames:, :])
            mask = jnp.zeros((R, window, D), bool).at[:, :pre_frames, :].set(True)
            prev_tail = (noisy_tail if noisy_tail is not None else
                         jnp.zeros((arch.diffusion_test.num_timesteps, R,
                                    repaint.overlap_len, D)))
            result = jits["outpaint"](
                variables, batch, sub, gt, mask, prev_tail,
                noisy_tail is not None and repaint.same_overlap_noisy,
                compute_dtype)
            if isinstance(result, tuple):
                sample, noisy_tail = result
            else:
                sample = result

        last_window = sample
        host = np.asarray(jax.device_get(sample))
        for r in range(R):
            if w >= rounds[r]:
                continue
            outs[r].append(host[r] if w == 0 else host[r][pre_frames:])
    return [np.concatenate(o, axis=0)[:tf]
            for o, tf in zip(outs, total_frames_list)]
