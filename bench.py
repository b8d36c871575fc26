"""Benchmark: flagship T2M sampling throughput (motions/min).

Measures end-to-end DDIM-50 (respace '15,15,8,6,6') CFG-doubled sampling of
196-frame x 322-dim SMPL-X motions on the available accelerator, matching the
reference's eval generation shape (configs/stmogen/...0_125b.py:27,98,104 and
batch 128/GPU).

North-star baseline (BASELINE.md): >=1000 motions/min on a v5e-8 at DDIM-50,
i.e. 125 motions/min per chip.  vs_baseline = measured_per_chip / 125.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    # the axon TPU plugin registers at interpreter start and ignores the env
    # var unless the config is set before first backend use (see
    # .claude/skills/verify) — without this a "CPU" smoke run grabs the TPU
    # device lock and serializes against real TPU jobs
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from motioncraft_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()
import numpy as np

BASELINE_PER_CHIP = 1000.0 / 8.0  # motions/min per chip from the v5e-8 target


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--quick", action="store_true", help="small model + batch smoke run")
    ap.add_argument("--dtype", choices=["f32", "bf16", "int8", "int8w"],
                    default="bf16",
                    help="denoiser compute dtype (diffusion math stays f32); "
                         "int8 = bf16 activations + W8A8 int8 weights on the "
                         "audited hot path (ops/quant.py); int8w = W8 "
                         "weight-only (int8 weights dequantized into the "
                         "float dots, no activation quant)")
    ap.add_argument("--no-s2g", action="store_true",
                    help="skip the long-form S2G windows/min secondary metric")
    ap.add_argument("--no-m2d", action="store_true",
                    help="skip the long-form M2D windows/min secondary metric")
    ap.add_argument("--no-extras", action="store_true",
                    help="skip the secondary step-cache throughput rows "
                         "(measured by default so every headline lever lands "
                         "in the driver-captured JSON)")
    def step_cache_arg(v):
        n = int(v)
        if n != 0 and n < 2:  # reject a silent no-op (1/negatives)
            raise argparse.ArgumentTypeError(
                "--step-cache must be 0 (off) or an integer >= 2")
        return n

    ap.add_argument("--step-cache-table", default=None, metavar="PATH",
                    help="calibrated per-(step, layer) reuse table "
                         "(tools/calibrate_step_cache.py .npz/.json output, "
                         "e.g. artifacts/step_cache_flagship.json); mutually "
                         "exclusive with --step-cache N")
    ap.add_argument("--step-cache", type=step_cache_arg, default=0, metavar="N",
                    help="SmoothCache-style layer-residual reuse: recompute "
                         "each decoder layer every N-th DDIM step, replay the "
                         "cached residual otherwise (diffusion/stepcache.py). "
                         "0 = off (the exact protocol number)")
    args = ap.parse_args()

    from motioncraft_tpu.apis import (build_flagship, flagship_t2m_cfg, make_text_batch,
                                      tiny_t2m_cfg)

    if args.quick:
        cfg, B, T, iters = tiny_t2m_cfg(max_seq_len=32), 8, 32, 2
    else:
        cfg, B, T, iters = flagship_t2m_cfg(), args.batch, 196, args.iters

    arch = build_flagship(cfg)
    texts = [f"a person performs action number {i}" for i in range(B)]
    batch = make_text_batch(texts, max_seq_len=T)
    rng = jax.random.PRNGKey(0)
    print(f"bench: init {('tiny' if args.quick else '0.125B')} model, "
          f"B={B} T={T} dtype={args.dtype} on {jax.devices()[0].platform}",
          file=sys.stderr)
    variables = arch.init(rng, batch)

    compute_dtype = None
    if args.dtype in ("bf16", "int8", "int8w"):
        from motioncraft_tpu.apis import bf16_cast_variables
        compute_dtype = jnp.bfloat16
        variables = bf16_cast_variables(variables)
    if args.dtype in ("int8", "int8w"):
        from motioncraft_tpu.apis import int8_quantize_variables
        variables = int8_quantize_variables(
            variables, weight_only=args.dtype == "int8w")

    step_cache = None
    if args.step_cache_table is not None:
        if args.step_cache > 1:
            raise SystemExit("--step-cache and --step-cache-table are "
                             "mutually exclusive")
        from motioncraft_tpu.diffusion import StepCacheConfig, load_flags
        table = load_flags(args.step_cache_table)
        step_cache = StepCacheConfig(flags=table)
        print(f"bench: calibrated step-cache table {args.step_cache_table} "
              f"(reuse fraction {table.mean():.1%})", file=sys.stderr)
    elif args.step_cache > 1:
        from motioncraft_tpu.diffusion import StepCacheConfig
        step_cache = StepCacheConfig(reuse_every=args.step_cache)
    sample_jit = jax.jit(lambda v, b, r: arch.sample(v, b, r,
                                                     compute_dtype=compute_dtype,
                                                     step_cache=step_cache))

    # warmup / compile; halve the batch on HBM exhaustion so the bench always
    # reports a number instead of dying
    while True:
        try:
            t0 = time.time()
            out = sample_jit(variables, batch, jax.random.PRNGKey(1))
            jax.block_until_ready(out)
            break
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or B <= 8:
                raise
            B //= 2
            print(f"bench: OOM, retrying with batch {B}", file=sys.stderr)
            # drop the failed executable + its live buffers before retrying,
            # otherwise the halved attempt inherits a fragmented heap
            import gc
            out = None
            jax.clear_caches()
            gc.collect()
            batch = make_text_batch(texts[:B], max_seq_len=T)
    print(f"bench: compile+first run {time.time() - t0:.1f}s", file=sys.stderr)

    # per-iteration timing: the driver record needs a variance field — the
    # remote-runtime tunnel has shown multi-x day-to-day latency swings, so a
    # single aggregate number is not comparable across sessions.  Throughput
    # is reported as the MEDIAN per-iter rate with the spread stamped.
    times = []
    for i in range(iters):
        t0 = time.time()
        out = sample_jit(variables, batch, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    dt = float(np.median(times)) * iters  # median-equivalent total for MFU

    motions_per_min = B / float(np.median(times)) * 60.0
    n_chips = len(jax.devices())
    per_chip = motions_per_min / max(1, n_chips) if n_chips > 1 else motions_per_min
    result = {
        "metric": "t2m_ddim50_throughput",
        "value": round(motions_per_min, 2),
        "unit": "motions/min",
        "vs_baseline": round(per_chip / BASELINE_PER_CHIP, 3),
        "batch": B,
        "value_spread": [round(B / max(times) * 60.0, 2),
                         round(B / min(times) * 60.0, 2)],
        "n_iters": iters,
        # measured sweep on 16 GB v5e-1: 564/min @ B=64 but 464/min @ B=128
        # (HBM pressure) — the per-batch sweet spot is narrow; see FIDELITY.md
        "batch_note": "B=64 is the 16GB-v5e sweet spot; B=128 regresses on HBM",
    }
    if args.dtype != "bf16":
        result["dtype"] = args.dtype
    if args.step_cache > 1 or args.step_cache_table:
        # approximate mode: never the headline protocol number
        if args.step_cache_table:
            result["step_cache_table"] = args.step_cache_table
            result["step_cache_reuse_fraction"] = round(
                float(step_cache.flags.mean()), 4)
        else:
            result["step_cache"] = args.step_cache
        result["metric"] = "t2m_ddim50_stepcache_throughput"
    mfu = compute_mfu(arch, variables, batch, compute_dtype, dt / iters)
    if mfu is not None:
        result["mfu"] = round(mfu, 4)
        if args.step_cache > 1 or args.step_cache_table:
            # the FLOP count assumes every layer computes at every step;
            # with reuse flags set this reads as EFFECTIVE utilization
            result["mfu_note"] = ("effective (counts skipped layer FLOPs "
                                  "as done)")
    exact_run = args.step_cache == 0 and not args.step_cache_table
    if exact_run and not args.no_extras and not args.quick:
        # secondary step-cache rows: the approximate levers are headline
        # numbers, so the driver-captured JSON must carry them (with their
        # quality bound living in artifacts/approx_drift.json)
        from motioncraft_tpu.diffusion import StepCacheConfig, load_flags
        for row, sc_cfg in (("t2m_stepcache2_per_min",
                             StepCacheConfig(reuse_every=2)),
                            ("t2m_stepcache_table_per_min", "table")):
            table_path = "artifacts/step_cache_flagship.json"
            if sc_cfg == "table":
                import os
                if not os.path.isfile(table_path):
                    continue
                table = load_flags(table_path)
                sc_cfg = StepCacheConfig(flags=table)
                result["t2m_stepcache_table"] = table_path
                result["t2m_stepcache_table_reuse"] = round(
                    float(table.mean()), 4)
            sc_jit = jax.jit(lambda v, b, r, _sc=sc_cfg: arch.sample(
                v, b, r, compute_dtype=compute_dtype, step_cache=_sc))
            try:
                jax.block_until_ready(
                    sc_jit(variables, batch, jax.random.PRNGKey(1)))
                ts = []
                for i in range(iters):
                    t0 = time.time()
                    jax.block_until_ready(
                        sc_jit(variables, batch, jax.random.PRNGKey(2 + i)))
                    ts.append(time.time() - t0)
                result[row] = round(B / float(np.median(ts)) * 60.0, 2)
                result[row + "_spread"] = [round(B / max(ts) * 60.0, 2),
                                           round(B / min(ts) * 60.0, 2)]
            except Exception as e:
                print(f"bench: {row} failed: {e}", file=sys.stderr)

    def add_windowed_rows(prefix, fn):
        int8 = args.dtype if args.dtype in ("int8", "int8w") else None
        sc = args.step_cache if args.step_cache > 1 else None
        if args.step_cache_table:
            # calibrated tables are T2M-layer-shaped and don't apply to the
            # windowed samplers — stamp the rows' true provenance so the
            # mixed configuration is explicit in the JSON
            result[f"{prefix}_step_cache"] = None
            result[f"{prefix}_note"] = (f"{prefix} rows run WITHOUT the "
                                        "step-cache table (table is "
                                        "T2M-calibrated)")
        for suffix, R in (("", 1), ("_batched8", 8)):
            try:
                med, spread = fn(recording_batch=R, int8=int8, step_cache=sc)
                result[f"{prefix}_windows_per_min{suffix}"] = round(med, 2)
                result[f"{prefix}_windows_per_min{suffix}_spread"] = [
                    round(spread[0], 2), round(spread[1], 2)]
            except Exception as e:  # secondary metrics never kill the bench
                print(f"bench: {prefix}{suffix} metric failed: {e}",
                      file=sys.stderr)

    if not args.no_s2g and not args.quick:
        add_windowed_rows("s2g", bench_s2g_windows)
    if not args.no_m2d and not args.quick:
        add_windowed_rows("m2d", bench_m2d_windows)
    print(json.dumps(result))


def compute_mfu(arch, variables, batch, compute_dtype, sec_per_call):
    """Model FLOPs Utilization: XLA's flop count for ONE compiled CFG
    denoiser forward x the DDIM step count / measured wall time / chip peak.
    (Cost analysis of the whole sampling executable undercounts: XLA reports
    the scan BODY's flops once, not x trip-count.)  Tracks 'is this fast in
    absolute terms' run-over-run.  Returns None off-TPU."""
    kind = jax.devices()[0].device_kind.lower()
    peaks_bf16 = {  # dense bf16 peak FLOP/s per chip (public TPU specs)
        "v5 lite": 197e12, "v5litepod": 197e12, "v5e": 197e12,
        "v4": 275e12, "v5p": 459e12, "v5": 459e12,
        "v6 lite": 918e12, "v6e": 918e12, "v6": 918e12,
    }
    peak = next((v for k, v in peaks_bf16.items() if k in kind), None)
    if peak is None:
        return None
    try:
        steps = int(arch.diffusion_test.num_timesteps)
        B, T, D = batch["motion"].shape
        cast = (lambda a: a.astype(compute_dtype)
                if compute_dtype is not None else a)
        xf = arch.encode_text(variables, batch["text_ids"])

        def fwd(v, m, t, mask, ml, x):
            return arch.model.apply(v, m, t, motion_mask=mask,
                                    motion_length=ml, xf_out=x, mode="test")

        args = (variables, cast(jnp.zeros((B, T, D), jnp.float32)),
                jnp.full((B,), 500, jnp.int32), cast(batch["motion_mask"]),
                batch["motion_length"], cast(xf))
        cost = jax.jit(fwd).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) * steps
    except Exception as e:
        print(f"bench: cost_analysis unavailable ({e})", file=sys.stderr)
        return None
    if flops <= 0:
        return None
    return flops / sec_per_call / (peak * max(1, len(jax.devices())))


def _bench_windowed(name, cfg, make_window_batch, window, pre,
                    total_frames=604, recording_batch=1, int8=None,
                    step_cache=None, n_rec=5):
    """Long-form windowed throughput: RePaint-outpainted windows over
    synthetic recordings (the reference protocol's hot loop,
    tools/s2g_test.py:120-260 / m2d_test.py).  recording_batch=1 is the
    sequential protocol; >1 runs independent recordings in lockstep through
    one DDIM scan per window (windowed_sample_batch).  Returns
    (median windows/min over n_rec per-recording timings, (min, max) spread)
    — the remote-runtime tunnel shows multi-x latency variance day-to-day,
    so the spread is part of the record, not a footnote."""
    from motioncraft_tpu.apis import bf16_cast_variables
    from motioncraft_tpu.apis.windowed import (num_windows, windowed_sample,
                                               windowed_sample_batch)
    from motioncraft_tpu.diffusion.sampling import RepaintConfig
    from motioncraft_tpu.registry import build_architecture

    arch = build_architecture(cfg)
    variables = bf16_cast_variables(
        arch.init(jax.random.PRNGKey(0), make_window_batch(0, window)))
    if int8:  # "int8" (W8A8) or "int8w" (weight-only)
        from motioncraft_tpu.apis import int8_quantize_variables
        variables = int8_quantize_variables(variables,
                                            weight_only=int8 == "int8w")
    repaint = RepaintConfig(overlap_len=pre, add_blend=True, jump_length=3,
                            jump_n_sample=2)
    sc_cfg = None
    if step_cache:
        from motioncraft_tpu.diffusion import StepCacheConfig
        sc_cfg = StepCacheConfig(reuse_every=step_cache)
    R = recording_batch
    if R > 1:
        def run(key):
            windowed_sample_batch(
                arch, variables, [make_window_batch] * R, [total_frames] * R,
                window=window, pre_frames=pre, rng=key, use_repaint=True,
                repaint=repaint, compute_dtype=jnp.bfloat16,
                step_cache=sc_cfg)
    else:
        def run(key):
            windowed_sample(
                arch, variables, make_window_batch, total_frames=total_frames,
                window=window, pre_frames=pre, rng=key, use_repaint=True,
                repaint=repaint, compute_dtype=jnp.bfloat16,
                step_cache=sc_cfg)
    t0 = time.time()
    run(jax.random.PRNGKey(1))
    print(f"bench: {name} R={R} compile+first recording "
          f"{time.time() - t0:.1f}s", file=sys.stderr)
    times = []
    for i in range(n_rec):
        t0 = time.time()
        run(jax.random.PRNGKey(2 + i))
        times.append(time.time() - t0)
    n_win = num_windows(total_frames, window, pre) * R
    print(f"bench: {name} R={R} per-recording s: "
          f"{[round(t, 1) for t in times]}", file=sys.stderr)
    rates = [n_win / t * 60.0 for t in times]
    return float(np.median(rates)), (min(rates), max(rates))


def bench_s2g_windows(window=64, pre=4, total_frames=604, sr=16000, fps=30,
                      recording_batch=1, int8=None, step_cache=None):
    """S2G: 64-frame windows, raw-audio 2-lane conditioning at 16 kHz."""
    from motioncraft_tpu.apis import flagship_s2g_cfg, make_text_batch

    spf = sr // fps
    audio = np.random.RandomState(0).randn(total_frames * spf, 2).astype(np.float32)

    def make_window_batch(start, end):
        batch = make_text_batch(["a person is doing a speech"], max_seq_len=window)
        batch["c"] = audio[start * spf:end * spf][None]  # numpy: no eager RPC
        return batch

    return _bench_windowed("s2g", flagship_s2g_cfg(window=window),
                           make_window_batch, window, pre, total_frames,
                           recording_batch, int8, step_cache)


def bench_m2d_windows(window=120, pre=30, total_frames=604,
                      recording_batch=1, int8=None, step_cache=None):
    """M2D: 120-frame windows with 30-frame overlap, per-frame 163-d music
    features, no pre-encoder (configs/stmogen/m2d_finedance_0125b.py)."""
    from motioncraft_tpu.apis import flagship_m2d_cfg, make_text_batch

    music = np.random.RandomState(0).randn(total_frames, 163).astype(np.float32)

    def make_window_batch(start, end):
        batch = make_text_batch(["a person is dancing"], max_seq_len=window)
        batch["c"] = music[start:end][None]
        return batch

    return _bench_windowed("m2d", flagship_m2d_cfg(window=window),
                           make_window_batch, window, pre, total_frames,
                           recording_batch, int8, step_cache)


if __name__ == "__main__":
    main()
