"""In-jit loop-slope profile of the flagship CFG-doubled denoiser forward.

Measures the single denoiser forward (the body of the DDIM scan) at the
bench shape, plus a breakdown toggle that zeroes out chosen sublayers to
attribute time.  All timings are (n=21 vs n=1) fori_loop slopes fetching one
scalar — per-dispatch timing through the remote tunnel is meaningless.

Usage: python tools/profile_forward.py [--batch 64] [--t 196]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from motioncraft_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp


def loop_slope(step, n1=1, n2=21):
    ts = {}
    for n in (n1, n2):
        f = jax.jit(lambda c, n=n: jax.lax.fori_loop(0, n, lambda i, cc: step(cc), c))
        jax.block_until_ready(f(jnp.float32(0.0)))
        t0 = time.time()
        jax.block_until_ready(f(jnp.float32(0.0)))
        ts[n] = time.time() - t0
    return (ts[n2] - ts[n1]) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t", type=int, default=196)
    ap.add_argument("--layers", type=int, default=4,
                    help="layer-count sweep separates per-layer cost from "
                         "the pose/embed/CFG plumbing intercept")
    args = ap.parse_args()

    from motioncraft_tpu.apis import build_flagship, flagship_t2m_cfg, make_text_batch

    cfg = flagship_t2m_cfg(num_layers=args.layers)
    arch = build_flagship(cfg)
    B, T = args.batch, args.t
    texts = [f"a person performs action number {i}" for i in range(B)]
    batch = make_text_batch(texts, max_seq_len=T)
    variables = arch.init(jax.random.PRNGKey(0), batch)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
        variables)

    enc = jax.jit(lambda v: arch.encode_text(v, batch["text_ids"]))(variables)
    xf_proj, xf_out = enc if isinstance(enc, tuple) else (None, enc)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 322), jnp.bfloat16)
    motion_mask = batch["motion_mask"].astype(jnp.float32)
    motion_length = batch["motion_length"]

    def fwd(carry):
        t = jnp.full((B,), 500, jnp.int32) - carry.astype(jnp.int32) % 7
        out = arch.model.apply(
            variables, x + carry.astype(x.dtype), t, motion_mask=motion_mask,
            motion_length=motion_length, xf_out=xf_out, xf_proj=xf_proj,
            num_intervals=1, mode="test")
        return carry + out.astype(jnp.float32).mean()

    dt = loop_slope(fwd) * 1e3
    print(f"CFG forward B={B} T={T} layers={args.layers}: {dt:8.3f} ms  "
          f"({B / (dt / 1e3) * 60 / 50:.0f} motions/min at DDIM-50 if "
          f"forward-bound)", flush=True)


if __name__ == "__main__":
    main()
