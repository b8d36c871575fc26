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
import numpy as np

BASELINE_PER_CHIP = 1000.0 / 8.0  # motions/min per chip from the v5e-8 target


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--quick", action="store_true", help="small model + batch smoke run")
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="bf16",
                    help="denoiser compute dtype (diffusion math stays f32)")
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
    if args.dtype == "bf16":
        compute_dtype = jnp.bfloat16
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
            variables)

    sample_jit = jax.jit(lambda v, b, r: arch.sample(v, b, r,
                                                     compute_dtype=compute_dtype))

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
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
