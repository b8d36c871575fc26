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

import jax
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

    t0 = time.time()
    for i in range(iters):
        out = sample_jit(variables, batch, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(out)
    dt = time.time() - t0

    motions_per_min = B * iters / dt * 60.0
    n_chips = len(jax.devices())
    per_chip = motions_per_min / max(1, n_chips) if n_chips > 1 else motions_per_min
    result = {
        "metric": "t2m_ddim50_throughput",
        "value": round(motions_per_min, 2),
        "unit": "motions/min",
        "vs_baseline": round(per_chip / BASELINE_PER_CHIP, 3),
        "batch": B,
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
    if not args.no_s2g and not args.quick:
        int8 = args.dtype if args.dtype in ("int8", "int8w") else None
        sc = args.step_cache if args.step_cache > 1 else None
        if args.step_cache_table:
            # calibrated tables are T2M-layer-shaped and don't apply to the
            # S2G windowed sampler — stamp the S2G rows' true provenance so
            # the mixed configuration is explicit in the JSON
            result["s2g_step_cache"] = None
            result["s2g_note"] = ("s2g rows run WITHOUT the step-cache "
                                  "table (table is T2M-calibrated)")
        try:
            result["s2g_windows_per_min"] = round(
                bench_s2g_windows(int8=int8, step_cache=sc), 2)
        except Exception as e:  # secondary metric must never kill the bench
            print(f"bench: s2g secondary metric failed: {e}", file=sys.stderr)
        try:
            # lockstep-batched recordings (windowed_sample_batch, R=8):
            # window w of independent recordings shares one DDIM scan
            result["s2g_windows_per_min_batched8"] = round(
                bench_s2g_windows(recording_batch=8, int8=int8,
                                  step_cache=sc), 2)
        except Exception as e:
            print(f"bench: batched s2g metric failed: {e}", file=sys.stderr)
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


def bench_s2g_windows(window=64, pre=4, total_frames=604, sr=16000, fps=30,
                      recording_batch=1, int8=None, step_cache=None):
    """Long-form S2G throughput: RePaint-outpainted 64-frame windows over
    synthetic recordings (the reference protocol's hot loop,
    tools/s2g_test.py:120-260).  recording_batch=1 is the sequential
    protocol; >1 runs independent recordings in lockstep through one DDIM
    scan per window (windowed_sample_batch).  Steady-state windows/min."""
    from motioncraft_tpu.apis import flagship_s2g_cfg, make_text_batch
    from motioncraft_tpu.apis.windowed import (num_windows, windowed_sample,
                                               windowed_sample_batch)
    from motioncraft_tpu.diffusion.sampling import RepaintConfig
    from motioncraft_tpu.registry import build_architecture

    arch = build_architecture(flagship_s2g_cfg(window=window))
    spf = sr // fps
    rng_np = np.random.RandomState(0)
    audio = rng_np.randn(total_frames * spf, 2).astype(np.float32)

    def make_window_batch(start, end):
        batch = make_text_batch(["a person is doing a speech"], max_seq_len=window)
        batch["c"] = audio[start * spf:end * spf][None]  # numpy: no eager RPC
        return batch

    from motioncraft_tpu.apis import bf16_cast_variables
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
    print(f"bench: s2g R={R} compile+first recording {time.time() - t0:.1f}s",
          file=sys.stderr)
    n_rec = 3
    t0 = time.time()
    for i in range(n_rec):
        run(jax.random.PRNGKey(2 + i))
    dt = time.time() - t0
    n_win = num_windows(total_frames, window, pre) * n_rec * R
    print(f"bench: s2g R={R} {n_win} windows in {dt:.1f}s", file=sys.stderr)
    return n_win / dt * 60.0


if __name__ == "__main__":
    main()
