"""Decompose the MoE inference dispatch cost stage by stage (in-jit slopes).

Reimplements MoELayer's eval path inline with a stage cutoff; each stage
returns a data-dependent scalar so XLA can't DCE the work.  Run on the real
TPU: python tools/profile_moe_stages.py
"""

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
import numpy as np
from flax import linen as nn

N, D, HID, E, K = 301056, 128, 512, 16, 2
CAPACITY = K * int(1.5 * ((N + E - 1) // E))


def loop_slope(step, n1=1, n2=21):
    ts = {}
    for n in (n1, n2):
        f = jax.jit(lambda c, n=n: jax.lax.fori_loop(0, n, lambda i, cc: step(cc), c))
        jax.block_until_ready(f(jnp.float32(0.0)))
        t0 = time.time()
        jax.block_until_ready(f(jnp.float32(0.0)))
        ts[n] = time.time() - t0
    return (ts[n2] - ts[n1]) / (n2 - n1)


def moe_stages(x, params, stage, topk_impl="lax"):
    from motioncraft_tpu.ops.pallas_moe import moe_positions
    proj_w, proj_b, sim, temp, w1, b1, w2, b2 = params
    # gate (cosine top)
    p = (x.astype(jnp.float32) @ proj_w + proj_b)
    p = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-12)
    s = sim / (jnp.linalg.norm(sim, axis=0, keepdims=True) + 1e-12)
    logits = (p @ s) * jnp.exp(jnp.clip(temp, max=np.log(100.0)))
    scores = jax.nn.softmax(logits, axis=1)
    if topk_impl == "lax":
        topk_scores, topk_idx = jax.lax.top_k(scores, K)
    else:  # iterated argmax (K small)
        ss = scores
        vals, idxs = [], []
        for _ in range(K):
            i = jnp.argmax(ss, axis=1)
            vals.append(jnp.take_along_axis(ss, i[:, None], axis=1)[:, 0])
            idxs.append(i)
            ss = jnp.where(jax.nn.one_hot(i, E, dtype=bool), -jnp.inf, ss)
        topk_scores = jnp.stack(vals, 1)
        topk_idx = jnp.stack(idxs, 1).astype(jnp.int32)
    gates = topk_scores / (topk_scores.sum(1, keepdims=True) + 1e-9)
    if stage == 1:
        return gates.sum() + topk_idx.sum().astype(jnp.float32)
    flat_idx = topk_idx.T.reshape(-1)
    pos_flat = moe_positions(flat_idx, E)
    positions = pos_flat.reshape(K, N).T
    valid = positions < CAPACITY
    gates = gates * valid.astype(gates.dtype)
    counts = jnp.sum(jax.nn.one_hot(flat_idx, E, dtype=jnp.int32), axis=0)
    fill = jnp.minimum(counts, CAPACITY)
    offset = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(fill)[:-1]])
    M = N * K
    rank = offset[topk_idx] + positions
    rank_flat = jnp.where(valid.reshape(-1), rank.reshape(-1), M)
    token_ids = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, K)).reshape(-1)
    token_for_rank = jnp.zeros((M + 1,), jnp.int32).at[rank_flat].set(token_ids)
    group_sizes = fill.at[E - 1].add(M - fill.sum())
    if stage == 2:
        return gates.sum() + token_for_rank.sum().astype(jnp.float32)
    xs = x[token_for_rank[:M]]
    if stage == 3:
        return gates.sum() + xs.astype(jnp.float32).sum()
    h = jax.lax.ragged_dot(xs, w1, group_sizes)
    b1_rows = jnp.repeat(b1, group_sizes, axis=0, total_repeat_length=M)
    h = nn.gelu(h + b1_rows, approximate=False)
    if stage == 4:
        return gates.sum() + h.astype(jnp.float32).mean()
    ye = jax.lax.ragged_dot(h.astype(x.dtype), w2, group_sizes)
    b2_rows = jnp.repeat(b2, group_sizes, axis=0, total_repeat_length=M)
    ye_flat = jnp.concatenate([ye + b2_rows, jnp.zeros((1, D), x.dtype)], axis=0)
    if stage == 5:
        return gates.sum() + ye_flat.astype(jnp.float32).mean()
    y = jnp.einsum("nk,nkd->nd", gates.astype(x.dtype), ye_flat[jnp.where(valid, rank, M)])
    return y.astype(jnp.float32).mean()


def main():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 9)
    x = jax.random.normal(ks[0], (N, D), jnp.bfloat16)
    params = (
        jax.random.normal(ks[1], (D, 256), jnp.float32) * 0.05,
        jnp.zeros((256,), jnp.float32),
        jax.random.normal(ks[2], (256, E), jnp.float32) * 0.005,
        jnp.full((1,), np.log(2.0), jnp.float32),
        jax.random.normal(ks[3], (E, D, HID), jnp.bfloat16) * 0.05,
        jnp.zeros((E, HID), jnp.bfloat16),
        jax.random.normal(ks[4], (E, HID, D), jnp.bfloat16) * 0.05,
        jnp.zeros((E, D), jnp.bfloat16),
    )
    names = {1: "gate+topk", 2: "+positions/rank", 3: "+xs gather",
             4: "+ragged1+gelu", 5: "+ragged2", 6: "full"}
    prev = 0.0
    for stage in (1, 2, 3, 4, 5, 6):
        def step(c, stage=stage):
            return c + moe_stages(x + c.astype(x.dtype), params, stage)
        dt = loop_slope(step) * 1e3
        print(f"stage {stage} ({names[stage]}): {dt:8.3f} ms  (+{dt - prev:6.3f})",
              flush=True)
        prev = dt
    # A/B: iterated-argmax top-k
    def step_a(c):
        return c + moe_stages(x + c.astype(x.dtype), params, 1, topk_impl="argmax")
    print(f"stage 1 argmax-topk: {loop_slope(step_a) * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
