"""Production serving: dynamic request batching over bucketed static shapes.

The reference ships research CLIs only (tools/visualize.py renders one
prompt per process run); it has no serving story.  This is a TPU-native
deployment layer over the same sampling path:

- requests (text, motion length, optional frame-aligned condition — raw
  audio for S2G, music features for M2D) enter a queue; long-form requests
  (``submit_long``) of arbitrary length are served window-by-window with
  RePaint-outpainted overlaps, and concurrent long requests run in LOCKSTEP
  (one DDIM scan per window for the whole group, apis/windowed.py);
- a dispatcher thread groups up to the largest batch bucket, waiting at most
  ``max_wait_ms`` after the first arrival (classic dynamic batching —
  latency-bounded, throughput-greedy);
- each group is padded up to the nearest *batch bucket* so every dispatch
  hits a pre-compiled executable: XLA traces once per bucket (static
  shapes), never per request;
- optional *sequence buckets* partition a group by motion length so short
  requests run a short-T executable (the linear-attention denoiser is
  ~linear in T) instead of paying full-T latency;
- optional ``mesh``: batch rows shard over the data axis for multi-chip
  serving (params replicated; every batch bucket must tile the axis);
- one jitted CFG-DDIM sample serves the whole group; outputs are sliced to
  each request's length, denormalized when stats are configured, and the
  per-request futures are fulfilled.

Determinism: a dispatch uses ``fold_in(base_seed, dispatch_index)``, so a
given (group composition, dispatch index) pair is reproducible; individual
requests are not bit-stable across different groupings (the batch shares
one noise tensor) — same trade every dynamic batcher makes.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import numpy as np


@dataclass
class _Pending:
    text: str
    length: int
    # optional per-request condition, aligned to the motion frames: raw
    # 16 kHz audio [length*533, 2] for S2G, music features [length, 163]
    # for M2D (reference tools/{s2g,m2d}_test.py condition protocols)
    condition: Optional[np.ndarray] = None
    # long-form request: generated window-by-window (RePaint outpainting)
    # instead of one fixed-T dispatch; `length` is then total_frames
    long: bool = False
    future: Future = field(default_factory=Future)
    t_enqueue: float = field(default_factory=time.monotonic)

    def cond_sig(self):
        """Requests batch together only when their conditions agree in
        per-frame rate and trailing shape (one trace signature each)."""
        if self.condition is None:
            return None
        rate = self.condition.shape[0] // max(1, self.length)
        return (rate,) + tuple(self.condition.shape[1:])


_STOP = object()


class MotionGenServer:
    """Dynamic-batching text-to-motion server over ``arch.sample``.

    Parameters
    ----------
    arch, variables: a built architecture (registry.build_architecture) and
        its (possibly bf16-cast / int8-quantized) variables.
    batch_buckets: ascending static batch sizes to compile; a group of n
        requests is padded to the smallest bucket >= n.
    max_wait_ms: how long the dispatcher holds an underfull group open after
        the first request arrives.
    mean, std: optional normalization stats — outputs are denormalized to
        the dataset's native units (tools/visualize.py:98-100).
    compute_dtype: e.g. jnp.bfloat16 for bf16 denoiser compute.
    """

    def __init__(self, arch, variables, *, max_seq_len: int = 196,
                 input_feats: int = 322,
                 batch_buckets: Sequence[int] = (1, 2, 4, 8),
                 seq_buckets: Optional[Sequence[int]] = None,
                 max_wait_ms: float = 20.0, seed: int = 0,
                 compute_dtype=None, mean: Optional[np.ndarray] = None,
                 std: Optional[np.ndarray] = None, mesh=None,
                 window: Optional[int] = None, pre_frames: int = 4,
                 repaint=None):
        if list(batch_buckets) != sorted(set(int(b) for b in batch_buckets)):
            raise ValueError("batch_buckets must be ascending and unique")
        self._arch = arch
        self._variables = variables
        self._max_seq_len = int(max_seq_len)
        self._input_feats = int(input_feats)
        self._buckets = [int(b) for b in batch_buckets]
        # sequence-length buckets: a request compiles/runs at the smallest
        # bucket >= its length instead of always paying full-T latency
        # (the linear-attention denoiser is ~linear in T)
        self._seq_buckets = sorted(set(int(t) for t in seq_buckets)) \
            if seq_buckets else [self._max_seq_len]
        if self._seq_buckets[-1] != self._max_seq_len:
            raise ValueError("seq_buckets must end at max_seq_len")
        self._max_wait_s = float(max_wait_ms) / 1e3
        self._rng = jax.random.PRNGKey(seed)
        if (mean is None) != (std is None):
            raise ValueError("mean and std must be given together")
        self._mean = None if mean is None else np.asarray(mean, np.float32)
        self._std = None if std is None else np.asarray(std, np.float32)
        self._mesh = mesh
        # long-form serving (windowed RePaint outpainting over
        # apis/windowed.py): window defaults to the model's full context
        self._window = int(window) if window else self._max_seq_len
        self._pre_frames = int(pre_frames)
        self._repaint = repaint
        self._compute_dtype = compute_dtype
        self._long_dispatches = 0
        fn = lambda v, b, r: arch.sample(v, b, r, compute_dtype=compute_dtype)  # noqa: E731
        if mesh is None:
            self._sample = jax.jit(fn)
        else:
            # multi-chip serving: batch rows sharded over the 'data' axis,
            # params replicated — every bucket must tile the data axis
            from ..parallel import batch_sharding, replicated
            ndata = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                                 if a in ("dcn", "data")]))
            bad = [b for b in self._buckets if b % ndata]
            if bad:
                raise ValueError(
                    f"batch_buckets {bad} not divisible by the mesh's "
                    f"data-parallel size {ndata}")
            self._sample = jax.jit(fn, in_shardings=(replicated(mesh),
                                                     batch_sharding(mesh),
                                                     replicated(mesh)))

        self._q: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._thread: Optional[threading.Thread] = None
        self._dispatches = 0
        self._requests = 0
        self._request_rows = 0  # sum of group sizes (occupancy numerator)
        self._padded_rows = 0
        self._latencies: list = []  # bounded; seconds enqueue->fulfil

    # -- lifecycle ---------------------------------------------------------

    def start(self):
        with self._lock:
            if self._thread is None or not self._thread.is_alive():
                self._thread = threading.Thread(target=self._loop, daemon=True)
                self._thread.start()
        return self

    def stop(self, timeout: float = 30.0):
        t = self._thread
        if t is not None and t.is_alive():
            self._q.put(_STOP)
            t.join(timeout)
        # a request enqueued while the dispatcher was exiting would never
        # resolve — fail it loudly instead of stranding the caller
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not _STOP and not item.future.done():
                item.future.set_exception(
                    RuntimeError("server stopped before dispatch"))

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    def warmup(self, buckets: Optional[Sequence[int]] = None):
        """Pre-compile the sample executable for each (batch, seq) bucket
        pair (first TPU compile is minutes through a cold cache; do it
        before traffic)."""
        from ..apis.factory import make_text_batch
        for b in buckets or self._buckets:
            for t in self._seq_buckets:
                batch = make_text_batch(["warmup"] * b, t, self._input_feats)
                jax.block_until_ready(self._call(batch, self._rng))
        return self

    # -- client API --------------------------------------------------------

    @staticmethod
    def _check_condition(condition, length):
        if condition is None:
            return None
        condition = np.asarray(condition, np.float32)
        if condition.ndim < 1 or condition.shape[0] % max(1, length):
            raise ValueError(
                f"condition length {condition.shape[0]} is not a whole "
                f"per-frame rate for {length} frames")
        return condition

    def submit(self, text: str, length: Optional[int] = None,
               condition: Optional[np.ndarray] = None) -> Future:
        """Enqueue one request; resolves to a [length, input_feats] f32
        array (denormalized when stats are configured).

        ``condition`` is the frame-aligned conditioning payload for
        conditioned architectures (ControlNet S2G/M2D): raw 16 kHz audio
        samples (rate samples/frame) or per-frame music features.  Its
        leading dim must be a whole multiple of ``length``; requests batch
        together only when their condition rate + trailing shape agree."""
        length = self._max_seq_len if length is None else int(length)
        if not 0 < length <= self._max_seq_len:
            raise ValueError(
                f"length {length} outside (0, {self._max_seq_len}]")
        self.start()
        req = _Pending(str(text), length,
                       condition=self._check_condition(condition, length))
        self._q.put(req)
        return req.future

    def submit_long(self, text: str, total_frames: int,
                    condition: Optional[np.ndarray] = None) -> Future:
        """Enqueue a LONG-FORM request: ``total_frames`` may exceed the
        model context; generation runs window-by-window with RePaint
        outpainted overlaps (apis/windowed.py — the reference's
        tools/s2g_test.py:120-260 loop, productized).  Long requests that
        arrive within the batching window run in LOCKSTEP through one DDIM
        scan per window (windowed_sample_batch), so long-form throughput
        scales with concurrency too.  Resolves to [total_frames, D]."""
        total_frames = int(total_frames)
        if total_frames <= 0:
            raise ValueError(f"total_frames {total_frames} must be > 0")
        self.start()
        req = _Pending(str(text), total_frames, long=True,
                       condition=self._check_condition(condition, total_frames))
        self._q.put(req)
        return req.future

    def generate(self, texts: Sequence[str],
                 lengths: Optional[Sequence[int]] = None) -> list:
        """Synchronous convenience: submit all, wait for all."""
        lengths = [None] * len(texts) if lengths is None else list(lengths)
        if len(lengths) != len(texts):
            raise ValueError(f"{len(texts)} texts but {len(lengths)} lengths")
        futures = [self.submit(t, l) for t, l in zip(texts, lengths)]
        return [f.result() for f in futures]

    def stats(self) -> dict:
        with self._lock:
            lat = sorted(self._latencies)
            n = len(lat)
            return {
                "requests": self._requests,
                "dispatches": self._dispatches,
                "long_dispatches": self._long_dispatches,
                "mean_occupancy": (self._request_rows / self._dispatches
                                   if self._dispatches else 0.0),
                "padding_fraction": (self._padded_rows /
                                     max(1, self._request_rows + self._padded_rows)),
                # percentiles cover the most recent window only (bounded list)
                "latency_p50_s": lat[n // 2] if n else None,
                "latency_p95_s": lat[min(n - 1, int(n * 0.95))] if n else None,
                "latency_window": n,
            }

    # -- dispatcher --------------------------------------------------------

    def _loop(self):
        max_bucket = self._buckets[-1]
        while True:
            first = self._q.get()
            if first is _STOP:
                return
            group = [first]
            deadline = time.monotonic() + self._max_wait_s
            stop_after = False
            while len(group) < max_bucket:
                rem = deadline - time.monotonic()
                if rem <= 0:
                    break
                try:
                    item = self._q.get(timeout=rem)
                except queue.Empty:
                    break
                if item is _STOP:
                    stop_after = True
                    break
                group.append(item)
            self._dispatch(group)
            if stop_after:
                return

    def _call(self, batch, rng):
        if self._mesh is not None:
            with jax.set_mesh(self._mesh):
                return self._sample(self._variables, batch, rng)
        return self._sample(self._variables, batch, rng)

    def _dispatch(self, group):
        """Partition a group by (long?, sequence bucket, condition
        signature), one dispatch each (each key is one trace signature)."""
        subgroups: dict = {}
        for g in group:
            if g.long:
                key = ("long", g.cond_sig())
            else:
                tb = next(t for t in self._seq_buckets if t >= g.length)
                key = (tb, g.cond_sig())
            subgroups.setdefault(key, []).append(g)
        for key in sorted(subgroups, key=str):
            if key[0] == "long":
                self._dispatch_long(subgroups[key])
            else:
                self._dispatch_bucket(subgroups[key], key[0])

    def _dispatch_bucket(self, group, t_bucket):
        from ..apis.factory import make_text_batch
        try:
            bucket = next(b for b in self._buckets if b >= len(group))
            pad = bucket - len(group)
            texts = [g.text for g in group] + [group[-1].text] * pad
            lengths = np.asarray([g.length for g in group]
                                 + [group[-1].length] * pad,
                                 np.int32)[:, None]
            batch = make_text_batch(texts, t_bucket,
                                    self._input_feats, lengths=lengths)
            if group[0].condition is not None:
                # zero-pad each request's condition to the bucket's frame
                # count x the group's shared per-frame rate
                rate = group[0].cond_sig()[0]
                rows = [g.condition for g in group] + [group[-1].condition] * pad
                c = np.zeros((bucket, t_bucket * rate)
                             + group[0].condition.shape[1:], np.float32)
                for i, r in enumerate(rows):
                    c[i, :r.shape[0]] = r
                batch["c"] = c
            with self._lock:
                rng = jax.random.fold_in(self._rng, self._dispatches)
                self._dispatches += 1
                self._requests += len(group)
                self._request_rows += len(group)
                self._padded_rows += pad
            out = np.asarray(self._call(batch, rng), np.float32)
            if self._std is not None:
                from ..apis.windowed import denormalize
                out = denormalize(out, self._mean, self._std)
            now = time.monotonic()
            with self._lock:
                self._latencies.extend(now - g.t_enqueue for g in group)
                del self._latencies[:-4096]
            for i, g in enumerate(group):
                g.future.set_result(out[i, :g.length])
        except BaseException as e:  # noqa: BLE001 — fanned out to callers
            for g in group:
                if not g.future.done():
                    g.future.set_exception(e)

    def _dispatch_long(self, group):
        """Lockstep-batched long-form dispatch: window w of every request in
        the group runs as ONE DDIM scan (apis/windowed.py
        windowed_sample_batch), RePaint-outpainting each window's overlap
        from the previous one.  Ragged lengths are fine — shorter requests
        ride padded windows whose outputs are discarded."""
        from ..apis.factory import make_text_batch
        from ..apis.windowed import windowed_sample, windowed_sample_batch
        from ..diffusion.sampling import RepaintConfig
        try:
            bucket = next((b for b in self._buckets if b >= len(group)),
                          len(group))
            pad = bucket - len(group)
            reqs = list(group) + [group[-1]] * pad
            window, pre = self._window, self._pre_frames

            def make_maker(g):
                rate = None if g.condition is None else g.cond_sig()[0]

                def maker(start, end):
                    b = make_text_batch([g.text], window, self._input_feats)
                    if g.condition is not None:
                        c = np.zeros((window * rate,)
                                     + g.condition.shape[1:], np.float32)
                        seg = g.condition[start * rate:end * rate]
                        c[:seg.shape[0]] = seg
                        b["c"] = c[None]
                    return b
                return maker

            makers = [make_maker(g) for g in reqs]
            totals = [g.length for g in reqs]
            with self._lock:
                rng = jax.random.fold_in(self._rng, self._dispatches)
                self._dispatches += 1
                self._long_dispatches += 1
                self._requests += len(group)
                self._request_rows += len(group)
                self._padded_rows += pad
            repaint = self._repaint or RepaintConfig(overlap_len=pre,
                                                     add_blend=True)
            kw = dict(window=window, pre_frames=pre, rng=rng,
                      use_repaint=True, repaint=repaint,
                      feat_dim=self._input_feats,
                      compute_dtype=self._compute_dtype)
            if len(makers) == 1:
                outs = [windowed_sample(self._arch, self._variables,
                                        makers[0], total_frames=totals[0],
                                        **kw)]
            else:
                outs = windowed_sample_batch(self._arch, self._variables,
                                             makers, totals, **kw)
            if self._std is not None:
                from ..apis.windowed import denormalize
                outs = [denormalize(o, self._mean, self._std) for o in outs]
            now = time.monotonic()
            with self._lock:
                self._latencies.extend(now - g.t_enqueue for g in group)
                del self._latencies[:-4096]
            for g, o in zip(group, outs):
                g.future.set_result(np.asarray(o, np.float32))
        except BaseException as e:  # noqa: BLE001 — fanned out to callers
            for g in group:
                if not g.future.done():
                    g.future.set_exception(e)
