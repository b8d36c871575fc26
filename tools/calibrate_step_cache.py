"""Calibrate a step-cache reuse table for a trained checkpoint.

SmoothCache's offline calibration (diffusion/stepcache.py): run one exact
DDIM probe over a few real batches, record each decoder layer's relative L1
residual change per step, and threshold it into a per-(step, layer) reuse
table.  The table is saved as .npz and can be fed to evaluation via
``StepCacheConfig(flags=...)`` (or inspected to pick a uniform
``--step-cache N`` for tools/test.py).

Usage:
  python tools/calibrate_step_cache.py <config> out.npz \
      [--checkpoint ckpt.npz | --torch-checkpoint model.pth] \
      [--threshold 0.15] [--max-consecutive 3] [--batches 2] [--bf16]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("out", help="output .npz (errors + flags)")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--torch-checkpoint", default=None)
    p.add_argument("--threshold", type=float, default=0.15,
                   help="reuse a layer when its previous step's relative L1 "
                        "residual change is below this")
    p.add_argument("--max-consecutive", type=int, default=3)
    p.add_argument("--tail", type=int, default=2)
    p.add_argument("--batches", type=int, default=2,
                   help="probe batches to average errors over")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--perturb", type=float, default=0.0, metavar="SCALE",
                   help="add SCALE*N(0,1) to every float param before probing."
                        " REQUIRED for random-init mechanics runs: the DiT "
                        "blocks' output projections are zero-initialised, so "
                        "an untouched random-init model has exactly-zero "
                        "layer residuals and a vacuous (all-zero) error "
                        "profile. Leave at 0 for trained checkpoints.")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--note", default=None,
                   help="free-form provenance note recorded in the --json "
                        "artifact (e.g. what the probed checkpoint was "
                        "trained on)")
    p.add_argument("--json", default=None, metavar="PATH",
                   help="also write a human-readable JSON artifact (error "
                        "profile + flag table + threshold + provenance), e.g. "
                        "artifacts/step_cache_flagship.json")
    p.add_argument("--cfg-options", nargs="*", default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import motioncraft_tpu.data  # noqa: F401
    import motioncraft_tpu.models  # noqa: F401
    from motioncraft_tpu.config import Config, cfg_options_from_args
    from motioncraft_tpu.data import build_dataloader
    from motioncraft_tpu.diffusion import StepCacheConfig, flags_from_errors
    from motioncraft_tpu.registry import DATASETS, build_architecture
    from motioncraft_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(cfg_options_from_args(args.cfg_options))
    arch = build_architecture(cfg.model)
    if not getattr(arch.model, "supports_step_cache", False):
        raise SystemExit(f"{type(arch.model).__name__} has no step-cache support")

    dataset = DATASETS.build(cfg.data["test"])
    bs = args.batch_size or cfg.data["samples_per_gpu"]
    loader = build_dataloader(dataset, samples_per_gpu=bs, shuffle=False,
                              workers_per_gpu=0)

    it = iter(loader)
    batch0 = next(it)
    num = lambda b: {k: jnp.asarray(v) for k, v in b.items()
                     if isinstance(v, np.ndarray) and np.issubdtype(v.dtype, np.number)}
    variables = arch.init(jax.random.PRNGKey(args.seed), num(batch0))
    from motioncraft_tpu.utils.checkpoint import load_eval_variables
    variables = load_eval_variables(cfg.model, variables,
                                    checkpoint=args.checkpoint,
                                    torch_checkpoint=args.torch_checkpoint)
    if args.perturb:
        # break the zero-init output heads so a random-init probe measures
        # real residual dynamics (mirrors tests/test_step_cache.py's fixture)
        leaves, treedef = jax.tree_util.tree_flatten(variables)
        ks = jax.random.split(jax.random.PRNGKey(args.seed + 7), len(leaves))
        leaves = [l + args.perturb * jax.random.normal(k, l.shape, l.dtype)
                  if jnp.issubdtype(l.dtype, jnp.floating) else l
                  for l, k in zip(leaves, ks)]
        variables = jax.tree_util.tree_unflatten(treedef, leaves)
    cdt = None
    if args.bf16:
        from motioncraft_tpu.apis import bf16_cast_variables
        variables = bf16_cast_variables(variables)
        cdt = jnp.bfloat16

    probe = StepCacheConfig(collect_errors=True)
    probe_jit = jax.jit(lambda v, b, r: arch.sample(
        v, b, r, compute_dtype=cdt, step_cache=probe)[1])

    errs, batch, rng = [], batch0, jax.random.PRNGKey(args.seed + 1)
    for i in range(args.batches):
        if i > 0:
            try:
                batch = next(it)
            except StopIteration:
                break
        nb = {k: v for k, v in batch.items()
              if isinstance(v, np.ndarray) and np.issubdtype(v.dtype, np.number)}
        errs.append(np.asarray(probe_jit(variables, nb,
                                         jax.random.fold_in(rng, i))))
        print(f"probe batch {i + 1}/{args.batches} done", file=sys.stderr)
    errors = np.mean(errs, axis=0)
    if not (errors[1:] > 0).any():
        raise SystemExit(
            "vacuous error profile: every layer residual is identically zero "
            "from step 1 on. This is the zero-init signature — the DiT "
            "blocks' output projections start at exactly zero, so a "
            "random-init model has no residual dynamics to calibrate "
            "against. Pass --perturb 0.05 for a mechanics run, or "
            "--checkpoint/--torch-checkpoint for a deployable table.")

    flags = flags_from_errors(errors, threshold=args.threshold,
                              max_consecutive=args.max_consecutive,
                              tail=args.tail)
    saved = flags.mean()
    np.savez(args.out, errors=errors, flags=flags,
             threshold=args.threshold, max_consecutive=args.max_consecutive)
    if args.json:
        import json
        artifact = {
            "config": os.path.relpath(args.config),
            "platform": jax.devices()[0].platform,
            "threshold": args.threshold,
            "max_consecutive": args.max_consecutive,
            "tail": args.tail,
            "batches": len(errs),
            "batch_size": bs,
            "seed": args.seed,
            "bf16": bool(args.bf16),
            # honesty flag: with no checkpoint the probe runs on random-init
            # weights, which validates the calibration *mechanics*; re-run
            # with --checkpoint/--torch-checkpoint for a deployable table
            "random_weights": args.checkpoint is None
                              and args.torch_checkpoint is None,
            "perturb": args.perturb,
            "checkpoint": args.checkpoint or args.torch_checkpoint,
            "note": args.note,
            "steps": int(errors.shape[0]),
            "layers": int(errors.shape[1]),
            "reuse_fraction": float(saved),
            "per_step_mean_error": [round(float(x), 6)
                                    for x in errors.mean(axis=1)],
            "errors": [[round(float(x), 6) for x in row] for row in errors],
            "flags": flags.astype(int).tolist(),
        }
        with open(args.json, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"json artifact -> {args.json}")
    print(f"steps={errors.shape[0]} layers={errors.shape[1]} "
          f"reuse fraction={saved:.1%} (≈{saved:.1%} of decoder-layer "
          f"compute skipped)\nsaved -> {args.out}")
    with np.printoptions(precision=3, suppress=True):
        print("per-step mean error:", errors.mean(axis=1))


if __name__ == "__main__":
    main()
