"""Music-to-dance evaluation harness (reference tools/m2d_test.py:91-405).

Per FineDance test track: windowed generation (120-frame windows, 30-frame
overlap), de-normalize, FID whole-body & hands + Diversity via the SMPL-X
contrastive evaluator.

Usage:
  python tools/m2d_test.py configs/stmogen/m2d_finedance_0125b.py \
      --checkpoint outputs/m2d/params.npz
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--torch-checkpoint", default=None,
                   help="released merged base+control .pth")
    p.add_argument("--work-dir", default="outputs/m2d_eval")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--no_repaint", action="store_true")
    p.add_argument("--step-cache", type=int, default=0, metavar="N",
                   help="SmoothCache-style layer-residual reuse across DDIM "
                        "steps (diffusion/stepcache.py); 0 = off (exact), "
                        "N>=2 = reuse period.  Approximate like --int8")
    p.add_argument("--int8", nargs="?", const="w8a8", default=None,
                   choices=["w8a8", "w8"],
                   help="int8 denoiser weights (ops/quant.py); combine with "
                        "--bf16 for bf16 activations.  Bare --int8 = w8a8 "
                        "(dynamic activation quant onto the int8 MXU); "
                        "'--int8 w8' = weight-only (int8 weights dequantized "
                        "into the float dots).  Put bare --int8 after the "
                        "positionals or use --int8-mode")
    p.add_argument("--int8-mode", default=None, choices=["w8a8", "w8"],
                   help="position-safe alternative to '--int8 [mode]': "
                        "implies --int8 with the given mode")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 denoiser compute in the windowed sampler "
                        "(params cast + compute_dtype; metrics math stays f32)")
    p.add_argument("--recording-batch", type=int, default=1,
                   help="process this many tracks in lockstep through one "
                        "DDIM scan per window (TPU batching; 1 = the "
                        "reference's sequential protocol)")
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
    from motioncraft_tpu.apis.windowed import denormalize, windowed_sample
    from motioncraft_tpu.config import Config, cfg_options_from_args
    from motioncraft_tpu.diffusion.sampling import RepaintConfig
    from motioncraft_tpu.eval import build_evaluator_model
    from motioncraft_tpu.eval.metrics import (calculate_activation_statistics,
                                              calculate_diversity,
                                              calculate_frechet_distance)
    from motioncraft_tpu.models.tokenizer import tokenize
    from motioncraft_tpu.registry import DATASETS, build_architecture

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(cfg_options_from_args(args.cfg_options))
    os.makedirs(args.work_dir, exist_ok=True)

    win_cfg = cfg.get("windowed", {})
    window = win_cfg.get("window", 120)
    pre = win_cfg.get("pre_frames", 30)

    arch = build_architecture(cfg.model)
    arch.repaint_cfg = RepaintConfig(overlap_len=pre, no_repaint=args.no_repaint)

    test_cfg = dict(cfg.data["test"])
    test_cfg.pop("eval_cfg", None)
    test_cfg["test_mode"] = False
    dataset = DATASETS.build(test_cfg)
    norm = dataset.pipeline.transforms[0]  # Normalize
    mean, std = np.asarray(norm.mean), np.asarray(norm.std)

    rng = jax.random.PRNGKey(args.seed)
    preds, gts = [], []
    t0 = time.time()
    infos = dataset.data_infos[: args.limit]
    if not infos:
        print("no FineDance test tracks found")
        return

    def make_mwb(info):
        music = info["c"]
        text = info["text"][0]

        def make_window_batch(start, end):
            seg = music[start:end]
            if len(seg) < end - start:
                seg = np.pad(seg, ((0, end - start - len(seg)), (0, 0)))
            # numpy (not jnp): eager device arrays cost one blocking RPC
            # each on a remote-runtime TPU; jit transfers these at dispatch
            return {"motion": np.zeros((1, window, 322), np.float32),
                    "motion_mask": np.ones((1, window), np.float32),
                    "motion_length": np.full((1, 1), window, np.int32),
                    "text_ids": tokenize([text]),
                    "c": (seg - 0.0).astype(np.float32)[None]}

        return make_window_batch

    variables = arch.init(jax.random.PRNGKey(args.seed),
                          make_mwb(infos[0])(0, window))
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
    sc_cfg = None
    if args.step_cache > 1:
        from motioncraft_tpu.diffusion import StepCacheConfig
        sc_cfg = StepCacheConfig(reuse_every=args.step_cache)
    elif args.step_cache not in (0, 1):
        raise SystemExit("--step-cache must be 0 (off) or >= 2")
    kw = dict(window=window, pre_frames=pre, use_repaint=not args.no_repaint,
              repaint=arch.repaint_cfg, compute_dtype=cdt, step_cache=sc_cfg)
    R = max(1, args.recording_batch)
    norm_preds = {}
    if R > 1:
        from motioncraft_tpu.apis.windowed import windowed_sample_batch
        for g0 in range(0, len(infos), R):
            group = infos[g0:g0 + R]
            rng, sub = jax.random.split(rng)
            outs = windowed_sample_batch(
                arch, variables, [make_mwb(i) for i in group],
                [len(i["motion"]) for i in group], rng=sub, **kw)
            for i, o in enumerate(outs):
                norm_preds[g0 + i] = o
    for ri, info in enumerate(infos):
        motion = info["motion"]
        T = len(motion)
        if ri in norm_preds:
            norm_pred = norm_preds.pop(ri)
        else:
            rng, sub = jax.random.split(rng)
            norm_pred = windowed_sample(arch, variables, make_mwb(info),
                                        total_frames=T, rng=sub, **kw)
        pred = denormalize(norm_pred, mean, std)
        preds.append(pred)
        gts.append(motion[: len(pred)])
        print(f"[{ri + 1}/{len(infos)}] {info.get('name')} T={T} "
              f"({time.time() - t0:.1f}s)", flush=True)

    # FID / Diversity in evaluator embedding space over fixed-length chunks
    ev = build_evaluator_model(cfg.data.get("eval_model") or dict(
        type="T2MContrastiveModel_SMPLX",
        motion_encoder=dict(nfeats=322, vae=True, num_layers=4),
        text_encoder=dict(num_layers=4)))

    def hands_only(s):
        """Reference hands-FID masking (s2g_test.py:346-360): keep global
        orient, both hands, and translation; zero body/jaw/face."""
        m = np.zeros_like(s)
        m[:, 0:3] = s[:, 0:3]
        m[:, 66:156] = s[:, 66:156]
        m[:, 309:312] = s[:, 309:312]
        return m

    chunk_size = min(150, min(len(p) for p in preds))

    def chunk_embed(seqs, mask_fn=None, size=None):
        size = size or chunk_size
        chunks = []
        for s in seqs:
            s = mask_fn(s) if mask_fn is not None else s
            for i in range(0, len(s) - size + 1, size):
                chunks.append(s[i:i + size])
        arr = np.stack(chunks)
        return np.asarray(ev.encode_motion(arr, np.full(len(arr), size)))

    metrics = {}
    for name, mask_fn in (("whole", None), ("hands", hands_only)):
        pe = chunk_embed(preds, mask_fn)
        ge = chunk_embed(gts, mask_fn)
        mu_p, cov_p = calculate_activation_statistics(pe)
        mu_g, cov_g = calculate_activation_statistics(ge)
        metrics[f"FID_{name}"] = float(calculate_frechet_distance(mu_g, cov_g, mu_p, cov_p))
    n_div = min(len(pe) - 1, 300)
    if n_div > 1:
        metrics["Diversity"] = float(calculate_diversity(pe, n_div))
    # honesty flags: non-protocol runs must say so in their artifacts
    from motioncraft_tpu.models.tokenizer import find_bpe_asset
    flags = {
        "untrained_evaluator": not getattr(ev, "pretrained_loaded", False),
        "hash_tokenizer": find_bpe_asset() is None,
        "int8_weights": args.int8 or False,  # False|"w8a8"|"w8"
        "step_cache": int(args.step_cache),
    }
    metrics["protocol"] = not any(
        v for k, v in flags.items() if k not in ("int8_weights", "step_cache"))
    if flags["int8_weights"] or flags["step_cache"]:
        print("NOTE: approximate sampling mode (int8/step-cache); compare "
              "against an exact run before quoting numbers")
    metrics["flags"] = flags
    if not metrics["protocol"]:
        print("WARNING: run is NOT protocol-comparable:", flags)
    print(json.dumps(metrics, indent=2))
    with open(os.path.join(args.work_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
