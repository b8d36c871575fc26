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


def _jitted_samplers(arch, step_cache=None):
    """One set of jitted sample fns per architecture, cached on the instance.

    Re-creating ``jax.jit`` wrappers per call (or per window) would give each
    its own trace cache and recompile the DDIM scan for every recording —
    the long-form S2G test set has dozens.  jit's own cache handles distinct
    shapes/modes underneath a single wrapper.

    Each step is ONE dispatch: the window's rng (``fold_in`` of a traced
    window index), the overlap tail slice of the previous window, and the
    outpainting gt/mask construction all live inside the jit, so the host
    loop never issues eager ops between windows — on a remote-runtime TPU
    every eager op is a blocking RPC, and the old per-window eager carries
    cost ~4x the jitted window itself (measured: 514 ms jitted window at
    R=8 vs ~1.9 s/window end-to-end)."""
    caches = getattr(arch, "_windowed_jit_cache", None)
    if caches is None:
        caches = arch._windowed_jit_cache = {}
    # arch.sample bakes inference_type/repaint_cfg into the trace — key on
    # them so mutating arch config between calls can't reuse a stale trace
    sc_key = None
    if step_cache is not None:  # static config; key the trace cache on it
        sc_key = (step_cache.reuse_every, step_cache.warmup, step_cache.tail,
                  None if step_cache.flags is None
                  else np.asarray(step_cache.flags).tobytes())
    cfg_key = (getattr(arch, "inference_type", None),
               getattr(arch, "repaint_cfg", None), sc_key)
    cache = caches.get(cfg_key)
    if cache is None:
        def make_fns(banked):
            # banked=True: ``b`` is {"static": window-invariant arrays,
            # "banked": [n_chunk, ...] banks}, all resident on device; the
            # window's batch is sliced out of the banks by the TRACED
            # chunk-local index ``bidx``, so dispatching window w moves zero
            # bytes (``widx`` stays the GLOBAL index feeding the rng fold)
            def pick(b, bidx):
                if not banked:
                    return b
                return {**b["static"],
                        **{k: v[bidx] for k, v in b["banked"].items()}}

            sc_kw = {} if step_cache is None else {"step_cache": step_cache}

            def first_fn(v, b, rng, widx, bidx, dt):
                out = arch.sample(v, pick(b, bidx), jax.random.fold_in(rng, widx),
                                  compute_dtype=dt, **sc_kw)
                return out[0] if isinstance(out, tuple) else out

            def preseq_fn(v, b, rng, widx, bidx, last, pre, dt):
                out = arch.sample(v, pick(b, bidx), jax.random.fold_in(rng, widx),
                                  pre_seq=last[:, -pre:, :], compute_dtype=dt,
                                  **sc_kw)
                return out[0] if isinstance(out, tuple) else out

            def outpaint_fn(v, b, rng, widx, bidx, last, tails, pre,
                            clip_idx_gt0, dt):
                gt = jnp.zeros_like(last).at[:, :pre, :].set(last[:, -pre:, :])
                mask = jnp.zeros(last.shape, bool).at[:, :pre, :].set(True)
                op = Outpainting(mask=mask, gt=gt,
                                 clip_idx=1 if clip_idx_gt0 else 0,
                                 previous_noisy_tail=tails)
                out = arch.sample(v, pick(b, bidx), jax.random.fold_in(rng, widx),
                                  outpainting=op, compute_dtype=dt, **sc_kw)
                if isinstance(out, tuple):
                    return out  # (sample, new noisy tails)
                return out, tails

            suffix = "_b" if banked else ""
            return {
                "plain" + suffix: jax.jit(first_fn, static_argnums=(5,)),
                "pre_seq" + suffix: jax.jit(preseq_fn, static_argnums=(6, 7)),
                "outpaint" + suffix: jax.jit(outpaint_fn, static_argnums=(7, 8, 9)),
            }

        def encode_fn(v, c, seq_len):
            # same f32 encode arch.sample performs in-window (architecture.py)
            return arch.model.apply(v, c.astype(jnp.float32), seq_len,
                                    method="encode_condition")

        cache = {**make_fns(False), **make_fns(True),
                 "encode": jax.jit(encode_fn, static_argnums=(2,)),
                 "num_timesteps": arch.diffusion_test.num_timesteps}
        caches[cfg_key] = cache
    return cache


def _dispatch_window(jits, variables, batch, rng, w, last, tails, *,
                     use_repaint, repaint, pre_frames, compute_dtype,
                     banked=False, bank_base=0):
    """Dispatch one window (no sync, no eager ops).  Returns (sample, tails)
    device refs; ``tails`` is lazily created as host zeros on the first
    outpainted window (transferred once).  With ``banked``, ``batch`` is the
    {static, banked-[n_chunk, ...]} pytree and the jit slices out window
    ``w - bank_base``."""
    sfx = "_b" if banked else ""
    widx, bidx = np.int32(w), np.int32(w - bank_base)
    if w == 0:
        return (jits["plain" + sfx](variables, batch, rng, widx, bidx,
                                    compute_dtype), tails)
    if not use_repaint:
        return (jits["pre_seq" + sfx](variables, batch, rng, widx, bidx, last,
                                      pre_frames, compute_dtype), tails)
    if tails is None:
        # diffusion_test.num_timesteps is the respaced step count; the tail
        # bank is only read when same_overlap_noisy (else DCE'd by XLA)
        num_t = jits["num_timesteps"]
        tails = np.zeros((num_t, last.shape[0], repaint.overlap_len,
                          last.shape[-1]), np.float32)
    clip_idx_gt0 = bool(repaint.same_overlap_noisy and w >= 2)
    return jits["outpaint" + sfx](variables, batch, rng, widx, bidx, last,
                                  tails, pre_frames, clip_idx_gt0,
                                  compute_dtype)


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
    step_cache=None,
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
    jits = _jitted_samplers(arch, step_cache)
    kw = dict(use_repaint=use_repaint, repaint=repaint,
              pre_frames=pre_frames, compute_dtype=compute_dtype)

    # dispatch every window without syncing: the carry (previous window, the
    # noisy-tail bank) stays on device inside the jit chain, so the host just
    # enqueues one call per window while the device pipelines the DDIM scans
    samples: list = []
    last = None  # normalized-space [1, window, D] device ref
    tails = None
    for w in range(rounds):
        batch = make_window_batch(w * stride, w * stride + window)
        last, tails = _dispatch_window(jits, variables, batch, rng, w, last,
                                       tails, **kw)
        samples.append(last)

    host = [np.asarray(s) for s in jax.device_get(samples)]  # single sync
    out_frames = [host[0][0]] + [h[0][pre_frames:] for h in host[1:]]
    full = np.concatenate(out_frames, axis=0)
    return full[:total_frames]


def denormalize(motion: np.ndarray, mean: np.ndarray, std: np.ndarray,
                eps: float = 1e-9) -> np.ndarray:
    return motion * (std + eps) + mean


def _concat_parts(parts):
    """Concat per-recording window batches over the batch axis (numeric keys
    only); trailing-window condition slices are zero-padded to a common
    length."""
    batch: Dict = {}
    for key in parts[0]:
        vals = [np.asarray(p[key]) for p in parts]
        if not np.issubdtype(vals[0].dtype, np.number):
            continue
        maxlen = max(v.shape[1] for v in vals) if vals[0].ndim > 1 else None
        if maxlen is not None:
            vals = [np.pad(v, [(0, 0), (0, maxlen - v.shape[1])]
                           + [(0, 0)] * (v.ndim - 2)) for v in vals]
        batch[key] = np.concatenate(vals, axis=0)
    return batch


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
    step_cache=None,
    precompute_condition: bool = True,
    window_chunk: Optional[int] = None,
    lookahead: int = 4,
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

    Host work happens per CHUNK of ``window_chunk`` windows, never per
    window: each chunk's batches are built, window-invariant arrays (zeros
    motion, masks, constant text) are split out and transferred once, the
    varying keys are stacked into [n_chunk, ...] banks, and (with
    ``precompute_condition``, for models exposing ``encode_condition``) the
    raw per-window condition is replaced by its encoded features via one
    conv call per chunk.  The dispatch loop slices the device-resident
    banks by a traced chunk-local index, so no bytes cross the host
    boundary between windows (on a remote-runtime TPU each transfer is a
    blocking RPC; this took R=8 S2G from 330 to 875 windows/min).  Outputs
    are drained to host behind a ``lookahead`` of in-flight windows, so
    device memory stays O(chunk), not O(recording length).

    Returns a list of [total_frames_r, D] arrays, one per recording.
    """
    R = len(make_window_batches)
    assert R == len(total_frames_list)
    repaint = repaint or RepaintConfig(overlap_len=pre_frames)
    rounds = [num_windows(tf, window, pre_frames) for tf in total_frames_list]
    max_rounds = max(rounds)
    stride = window - pre_frames
    jits = _jitted_samplers(arch, step_cache)
    kw = dict(use_repaint=use_repaint, repaint=repaint,
              pre_frames=pre_frames, compute_dtype=compute_dtype)
    # bound the encode-call batch (and the bank size) to ~256 windows
    chunk = window_chunk or max(1, 256 // max(1, R))

    host: list = []  # drained per-window [R, window, D] arrays
    pending: list = []  # in-flight device refs
    last = None
    tails = None
    for c0 in range(0, max_rounds, chunk):
        wins = []
        for w in range(c0, min(c0 + chunk, max_rounds)):
            start, end = w * stride, w * stride + window
            wins.append(_concat_parts([mwb(start, end)
                                       for mwb in make_window_batches]))
        enc = None
        if "c" in wins[0]:
            # pad the raw condition to one length across the chunk (kept
            # windows always have the full-length slice — only discarded
            # padded windows of shorter recordings are affected)
            cs = [b.pop("c") for b in wins]
            L = max(c.shape[1] for c in cs)
            cs = np.stack([np.pad(c, [(0, 0), (0, L - c.shape[1])]
                                  + [(0, 0)] * (c.ndim - 2)) for c in cs])
            if precompute_condition and hasattr(type(arch.model),
                                                "encode_condition"):
                # one conv call encodes the whole chunk; eval-mode BatchNorm
                # makes the result independent of the batch composition
                enc = jits["encode"](
                    variables, cs.reshape((len(wins) * R,) + cs.shape[2:]),
                    window)
                enc = enc.reshape((len(wins), R) + enc.shape[1:])
            else:
                for i, b in enumerate(wins):
                    b["c"] = cs[i]
        # window-invariant arrays (zeros motion, masks, constant text) are
        # transferred once, not banked n_chunk times
        static, banked = {}, {}
        for k in wins[0]:
            vals = [b[k] for b in wins]
            if all(v.shape == vals[0].shape and np.array_equal(v, vals[0])
                   for v in vals[1:]):
                static[k] = vals[0]
            else:
                banked[k] = np.stack(vals)
        banks = jax.device_put({"static": static, "banked": banked})
        if enc is not None:
            banks["banked"]["c_enc"] = enc  # already a device ref

        for w in range(c0, min(c0 + chunk, max_rounds)):
            last, tails = _dispatch_window(jits, variables, banks, rng, w,
                                           last, tails, banked=True,
                                           bank_base=c0, **kw)
            pending.append(last)
            if len(pending) > lookahead:
                host.append(np.asarray(pending.pop(0)))

    host.extend(np.asarray(s) for s in jax.device_get(pending))
    outs: list = [[] for _ in range(R)]
    for w, h in enumerate(host):
        for r in range(R):
            if w < rounds[r]:
                outs[r].append(h[r] if w == 0 else h[r][pre_frames:])
    return [np.concatenate(o, axis=0)[:tf]
            for o, tf in zip(outs, total_frames_list)]
