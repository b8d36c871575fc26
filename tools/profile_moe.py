"""MoE dispatch microbenchmark at flagship shapes (in-jit loop slope).

Per-dispatch timing through the remote tunnel is meaningless (~30 ms
dispatch overhead); instead each measurement jits a fori_loop of n
iterations returning one scalar and reports (t(n2) - t(n1)) / (n2 - n1).

Usage: python tools/profile_moe.py [--mode ragged|slots] [--n 301056]
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
    """step: carry(f32 scalar) -> carry.  Returns per-iteration seconds."""
    ts = {}
    for n in (n1, n2):
        f = jax.jit(lambda c, n=n: jax.lax.fori_loop(0, n, lambda i, cc: step(cc), c))
        jax.block_until_ready(f(jnp.float32(0.0)))  # compile + warm
        t0 = time.time()
        jax.block_until_ready(f(jnp.float32(0.0)))
        ts[n] = time.time() - t0
    return (ts[n2] - ts[n1]) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=301056)   # 128 x 196 x 12 tokens
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--experts", type=int, default=16)
    ap.add_argument("--topk", type=int, default=2)
    ap.add_argument("--mode", default="ragged", choices=["ragged", "slots", "ragged_fused"])
    args = ap.parse_args()

    from motioncraft_tpu.models.moe import MoELayer

    N, D = args.n, args.d
    x = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.bfloat16)
    layer = MoELayer(args.experts, args.topk, D, args.hidden,
                     dispatch_mode=args.mode)
    params = layer.init(jax.random.PRNGKey(1), x)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

    def step(carry):
        # perturb input by carry so the loop body can't be hoisted
        y, _ = layer.apply(params, x + carry.astype(x.dtype))
        return carry + y.astype(jnp.float32).mean()

    dt = loop_slope(step)
    print(f"mode={args.mode} N={N} D={D} hidden={args.hidden} "
          f"E={args.experts} K={args.topk}: {dt * 1e3:.3f} ms/call")


if __name__ == "__main__":
    main()
