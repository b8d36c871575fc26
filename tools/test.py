"""T2M evaluation entry point (reference tools/test.py:19-128).

config -> test dataset (+evaluator model, 20 shuffled replications) -> batched
DDIM sampling -> dataset.evaluate -> metric table.  RePaint CLI knobs mirror
the reference argparse (tools/test.py:40-55) and feed RepaintConfig.

Usage:
  python tools/test.py configs/stmogen/t2m_motionx_0_125b.py work_dir \
      --checkpoint outputs/t2m_0_125b/params.npz [--torch-checkpoint x.pth]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def step_cache_arg(v):
    """0 = off; N >= 2 = reuse period.  1 and negatives are rejected rather
    than silently treated as off (N=1 would be exact either way, but a
    silent no-op confuses calibration comparisons)."""
    n = int(v)
    if n != 0 and n < 2:
        raise argparse.ArgumentTypeError(
            "--step-cache must be 0 (off) or an integer >= 2")
    return n


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a motion model")
    p.add_argument("config")
    p.add_argument("work_dir", nargs="?", default="outputs/eval")
    p.add_argument("--checkpoint", default=None, help=".npz params snapshot")
    p.add_argument("--torch-checkpoint", default=None, help="released .pth")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit", type=int, default=None,
                   help="evaluate only the first N results (smoke runs)")
    p.add_argument("--int8", nargs="?", const="w8a8", default=None,
                   choices=["w8a8", "w8"],
                   help="int8 denoiser weights on the audited hot path "
                        "(ops/quant.py; combine with --bf16 for bf16 "
                        "activations).  Bare --int8 = w8a8 (dynamic "
                        "activation quant onto the int8 MXU); '--int8 w8' = "
                        "weight-only (int8 weights dequantized into the "
                        "float dots).  NOTE: because the mode is optional, "
                        "a bare --int8 placed immediately before a "
                        "positional swallows it — put --int8 after the "
                        "positionals, or use the unambiguous --int8-mode")
    p.add_argument("--int8-mode", default=None, choices=["w8a8", "w8"],
                   help="position-safe alternative to '--int8 [mode]': "
                        "implies --int8 with the given mode")
    p.add_argument("--step-cache", type=step_cache_arg, default=0, metavar="N",
                   help="SmoothCache-style layer-residual reuse: recompute "
                        "each decoder layer every N-th DDIM step and replay "
                        "its cached residual otherwise (diffusion/stepcache"
                        ".py). 0 = off (exact, default); approximate like "
                        "--int8 and stamped into metrics.json")
    p.add_argument("--step-cache-table", default=None, metavar="PATH",
                   help="calibrated per-(step, layer) reuse table from "
                        "tools/calibrate_step_cache.py (.npz or .json, e.g. "
                        "artifacts/step_cache_flagship.json); mutually "
                        "exclusive with --step-cache N")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 denoiser compute (params cast + compute_dtype; "
                        "diffusion schedule and metric math stay f32)")
    # repaint/ddim knobs (reference tools/test.py:40-55)
    p.add_argument("--no_repaint", action="store_true")
    p.add_argument("--no_resample", action="store_true")
    p.add_argument("--addBlend", action="store_true", default=True)
    p.add_argument("--same_overlap_noisy", action="store_true")
    p.add_argument("--overlap_len", type=int, default=4)
    p.add_argument("--jump_n_sample", type=int, default=2)
    p.add_argument("--jump_length", type=int, default=3)
    p.add_argument("--dispatch-batches", type=int, default=1, metavar="K",
                   help="group K loader batches into one device dispatch "
                        "(lax.map inside the jit) — bit-identical "
                        "predictions, amortizes per-dispatch runtime "
                        "overhead (a ~2.6x protocol-eval win through a "
                        "remote-runtime TPU tunnel)")
    p.add_argument("--dump-samples", default=None, metavar="PATH",
                   help="save the generated motions (loader order, pre-"
                        "evaluation) to PATH.npz — same seed across runs "
                        "makes dumps elementwise comparable, which is how "
                        "tools/measure_approx_drift.py computes the sample-"
                        "space error of approximate modes")
    p.add_argument("--dump-samples-limit", type=int, default=1024,
                   help="cap the number of dumped motions (file size)")
    p.add_argument("--cfg-options", nargs="*", default=None)
    args = p.parse_args()
    if args.int8_mode:  # unambiguous form wins
        args.int8 = args.int8_mode
    return args


def main():
    args = parse_args()
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from motioncraft_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()  # remote-AOT tunnel compiles cost minutes; cache them
    import jax.numpy as jnp
    import motioncraft_tpu.models  # noqa: F401
    import motioncraft_tpu.data  # noqa: F401  (register DATASETS/PIPELINES)
    from motioncraft_tpu.config import Config, cfg_options_from_args
    from motioncraft_tpu.data import build_dataloader
    from motioncraft_tpu.registry import DATASETS, build_architecture
    from motioncraft_tpu.diffusion.sampling import RepaintConfig

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(cfg_options_from_args(args.cfg_options))
    os.makedirs(args.work_dir, exist_ok=True)
    # the protocol's replication shuffles and the Diversity evaluator draw
    # from the global numpy RNG — seed it so two runs with the same --seed
    # are metric-comparable (the drift harness relies on this; reference
    # tools/test.py seeds via set_random_seed the same way)
    np.random.seed(args.seed)

    arch = build_architecture(cfg.model)
    arch.repaint_cfg = RepaintConfig(
        overlap_len=args.overlap_len, add_blend=args.addBlend,
        same_overlap_noisy=args.same_overlap_noisy, no_repaint=args.no_repaint,
        no_resample=args.no_resample, jump_length=args.jump_length,
        jump_n_sample=args.jump_n_sample)

    dataset = DATASETS.build(cfg.data["test"])
    bs = args.batch_size or cfg.data["samples_per_gpu"]
    dist = jax.process_count() > 1
    # multi-host: interleaved per-rank slice + round_up (equal batch counts
    # keep the hosts' jit dispatch in lockstep); merged back in order below
    loader = build_dataloader(dataset, samples_per_gpu=bs, shuffle=False,
                              round_up=dist, dist=dist,
                              workers_per_gpu=cfg.data.get("workers_per_gpu", 0))
    loader.drop_last = False

    variables = None
    if arch.inference_type != "gt":
        batch0 = next(iter(loader))
        batch0 = {k: jnp.asarray(v) for k, v in batch0.items()
                  if isinstance(v, np.ndarray) and np.issubdtype(v.dtype, np.number)}
        variables = arch.init(jax.random.PRNGKey(args.seed), batch0)
        from motioncraft_tpu.utils.checkpoint import load_eval_variables
        variables = load_eval_variables(
            cfg.model, variables, checkpoint=args.checkpoint,
            torch_checkpoint=args.torch_checkpoint)
        if args.bf16:
            from motioncraft_tpu.apis import bf16_cast_variables
            variables = bf16_cast_variables(variables)
        if args.int8:
            from motioncraft_tpu.apis import int8_quantize_variables
            variables = int8_quantize_variables(
                variables, weight_only=args.int8 == "w8")
            from motioncraft_tpu.ops.quant import count_quantized
            _n, _e = count_quantized(variables)
            print(f"int8 ({args.int8}): quantized {_n} weights "
                  f"({_e / 1e6:.1f}M params)")
    cdt = jnp.bfloat16 if args.bf16 else None
    step_cache = None
    if args.step_cache_table is not None:
        if args.step_cache > 1:
            raise SystemExit("--step-cache and --step-cache-table are "
                             "mutually exclusive")
        from motioncraft_tpu.diffusion import StepCacheConfig, load_flags
        table = load_flags(args.step_cache_table)
        step_cache = StepCacheConfig(flags=table)
        print(f"step-cache table {args.step_cache_table}: "
              f"{table.shape[0]} steps x {table.shape[1]} layers, "
              f"reuse fraction {table.mean():.1%}")
    elif args.step_cache > 1:
        from motioncraft_tpu.diffusion import StepCacheConfig
        step_cache = StepCacheConfig(reuse_every=args.step_cache)

    from motioncraft_tpu.apis.test import multi_host_test, single_device_test
    t0 = time.time()
    if dist:
        results = multi_host_test(arch, variables, loader, seed=args.seed,
                                  limit=args.limit, compute_dtype=cdt,
                                  step_cache=step_cache,
                                  dispatch_batches=args.dispatch_batches,
                                  logger=lambda m: print("  " + m, flush=True))
        if jax.process_index() != 0:
            return
    else:
        results = single_device_test(arch, variables, loader, seed=args.seed,
                                     limit=args.limit, compute_dtype=cdt,
                                     step_cache=step_cache,
                                     dispatch_batches=args.dispatch_batches,
                                     logger=lambda m: print("  " + m, flush=True))
    print(f"sampled {len(results)} results in {time.time() - t0:.1f}s")
    if args.dump_samples:
        n = min(len(results), args.dump_samples_limit)
        os.makedirs(os.path.dirname(os.path.abspath(args.dump_samples)),
                    exist_ok=True)
        np.savez_compressed(
            args.dump_samples,
            pred_motion=np.stack([np.asarray(r["pred_motion"], np.float32)
                                  for r in results[:n]]),
            motion_length=np.stack(
                [np.asarray(r["motion_length"]).reshape(-1)[:1]
                 for r in results[:n]]).reshape(-1))
        print(f"dumped {n} samples -> {args.dump_samples}")
    metrics = dataset.evaluate(results[:args.limit] if args.limit else results,
                               args.work_dir)
    for k, v in metrics.items():
        print(f"{k}: {float(v):.4f}")
    out = {k: float(v) for k, v in metrics.items()}
    # honesty flags: non-protocol runs must say so in their artifacts
    from motioncraft_tpu.models.tokenizer import find_bpe_asset
    ev = getattr(dataset, "evaluator_model", None)
    flags = {
        "untrained_evaluator": not getattr(ev, "pretrained_loaded", False),
        "hash_tokenizer": find_bpe_asset() is None,
        "int8_weights": args.int8 or False,  # False | "w8a8" | "w8"
        "step_cache": int(args.step_cache),
        "step_cache_table": args.step_cache_table,
    }
    _approx_keys = ("int8_weights", "step_cache", "step_cache_table")
    out["protocol"] = not any(
        v for k, v in flags.items() if k not in _approx_keys)
    out["flags"] = flags
    if not out["protocol"]:
        print("WARNING: run is NOT protocol-comparable:", flags)
    elif any(flags[k] for k in _approx_keys):
        # protocol stays true (evaluator/tokenizer semantics are intact) but
        # the sampler output is approximate — say so loudly, not only in the
        # flags dict
        print("NOTE: approximate sampling mode "
              f"(int8_weights={flags['int8_weights']}, "
              f"step_cache={flags['step_cache']}, "
              f"step_cache_table={flags['step_cache_table']}); metric deltas "
              "vs the exact bf16 run are expected — compare against an exact "
              "run before quoting numbers")
    with open(os.path.join(args.work_dir, "metrics.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
