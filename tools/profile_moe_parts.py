"""Isolated-op timings for the MoE dispatch pieces (in-jit loop slopes).

Indices are precomputed realistic dispatch indices; the measured op's data
input is perturbed by the loop carry so it can't be hoisted.
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
M = N * K


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
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, D), jnp.bfloat16)
    # realistic dispatch indices
    topk_idx = jnp.asarray(rng.randint(0, E, (N, K)), jnp.int32)
    token_for_rank = jnp.asarray(rng.permutation(np.repeat(np.arange(N), K))[:M],
                                 jnp.int32)
    ranks = jnp.asarray(rng.randint(0, M, (N, K)), jnp.int32)
    gates = jnp.asarray(np.abs(rng.rand(N, K)), jnp.bfloat16)
    gate_rows = jnp.asarray(np.abs(rng.rand(M, 1)), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(E, D, HID) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(np.zeros((E, HID)), jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(E, HID, D) * 0.05, jnp.bfloat16)
    group = np.full(E, M // E, np.int32)
    group_sizes = jnp.asarray(group)
    xs = jnp.asarray(rng.randn(M, D), jnp.bfloat16)
    ye_flat = jnp.asarray(rng.randn(M + 1, D), jnp.bfloat16)
    b2 = jnp.asarray(rng.randn(E, D) * 0.05, jnp.bfloat16)

    only = sys.argv[1] if len(sys.argv) > 1 else ""

    def meas(name, step):
        if only and only not in name:
            return
        dt = loop_slope(step) * 1e3
        print(f"{name:28s}: {dt:8.3f} ms", flush=True)

    def pert(a, c):
        return a + c.astype(a.dtype)

    meas("gather xs = x[idx]", lambda c: c + pert(x, c)[token_for_rank].astype(
        jnp.float32).mean())
    meas("scatter [M] set", lambda c: c + jnp.zeros((M + 1,), jnp.bfloat16).at[
        (ranks.reshape(-1) + c.astype(jnp.int32))].set(
            gates.reshape(-1)).astype(jnp.float32).mean())
    meas("scatter [M] set unique", lambda c: c + jnp.zeros((M + 1,), jnp.bfloat16).at[
        (ranks.reshape(-1) + c.astype(jnp.int32))].set(
            gates.reshape(-1), unique_indices=True, mode="drop").astype(
                jnp.float32).mean())
    meas("scatter [M] int unique", lambda c: c + jnp.zeros((M + 1,), jnp.int32).at[
        (ranks.reshape(-1) + c.astype(jnp.int32))].set(
            token_for_rank, unique_indices=True, mode="drop").astype(
                jnp.float32).mean())
    meas("scatter rows [M,D] unique", lambda c: c + jnp.zeros((M + 1, D), jnp.bfloat16).at[
        (ranks.reshape(-1) + c.astype(jnp.int32))].set(
            pert(xs, c), unique_indices=True, mode="drop").astype(
                jnp.float32).mean())
    meas("gather [M] scalar", lambda c: c + pert(gate_rows[:, 0], c)[
        token_for_rank].astype(jnp.float32).mean())
    meas("ragged_dot pair + gelu", lambda c: c + _ragged_pair(
        pert(xs, c), w1, b1, w2, group_sizes, gate_rows))
    from motioncraft_tpu.ops.pallas_moe_ffn import BLOCK, grouped_ffn
    nblocks = M // BLOCK
    block_expert = jnp.asarray(np.repeat(np.arange(E), nblocks // E)[:nblocks],
                               jnp.int32)
    meas("fused grouped_ffn kernel", lambda c: c + grouped_ffn(
        block_expert, pert(xs, c), w1, b1, w2).astype(jnp.float32).mean())
    meas("combine old (nkd gather+einsum)", lambda c: c + jnp.einsum(
        "nk,nkd->nd", gates, pert(ye_flat, c)[ranks]).astype(jnp.float32).mean())

    def combine_new(c):
        ge = jnp.einsum("nk,nke->ne", gates.astype(jnp.float32),
                        jax.nn.one_hot(topk_idx, E, dtype=jnp.float32))
        y = (gates[:, 0, None] * pert(ye_flat, c)[ranks[:, 0]]
             + gates[:, 1, None] * pert(ye_flat, c)[ranks[:, 1]]
             + ge.astype(jnp.bfloat16) @ b2)
        return c + y.astype(jnp.float32).mean()

    meas("combine new (gated gathers)", combine_new)

    # --- realistic eval-time ranks: k-major arrival order makes rank rows
    # MONOTONE within each expert segment (piecewise-sequential gathers);
    # random ranks above are the worst case
    flat_idx = np.asarray(topk_idx).T.reshape(-1)
    counts = np.bincount(flat_idx, minlength=E)
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.zeros(M, np.int64)
    seen = np.zeros(E, np.int64)
    for i, e in enumerate(flat_idx):
        pos[i] = seen[e]
        seen[e] += 1
    real_ranks = jnp.asarray((offs[flat_idx] + pos).reshape(K, N).T, jnp.int32)

    def combine_real(c):
        y = (gates[:, 0, None] * pert(ye_flat, c)[real_ranks[:, 0]]
             + gates[:, 1, None] * pert(ye_flat, c)[real_ranks[:, 1]])
        return c + y.astype(jnp.float32).mean()

    meas("combine gathers (real ranks)", combine_real)

    def combine_real_nkd(c):
        y = jnp.einsum("nk,nkd->nd", gates, pert(ye_flat, c)[real_ranks])
        return c + y.astype(jnp.float32).mean()

    meas("combine nkd (real ranks)", combine_real_nkd)

    # inverse formulation: scatter expert-sorted rows back to token order
    # (one [M] scatter-add of gated rows instead of two [N] gathers);
    # duplicate token ids across k forbid unique_indices here
    tok_flat = jnp.asarray(np.argsort(offs[flat_idx] + pos, kind="stable"),
                           jnp.int32)  # placeholder token order per rank row

    def combine_scatter(c):
        rows = pert(ye_flat, c)[:M] * gate_rows
        y = jnp.zeros((N, D), jnp.bfloat16).at[token_for_rank].add(rows)
        return c + y.astype(jnp.float32).mean()

    meas("combine scatter-add [M->N]", combine_scatter)
    from motioncraft_tpu.ops.pallas_moe import moe_positions
    meas("positions cumsum", lambda c: c + moe_positions(
        (topk_idx.T.reshape(-1) + c.astype(jnp.int32)) % E, E).astype(
            jnp.float32).mean())


def _ragged_pair(xs, w1, b1, w2, group_sizes, gate_rows):
    h = jax.lax.ragged_dot(xs, w1, group_sizes)
    b1_rows = jnp.repeat(b1, group_sizes, axis=0, total_repeat_length=M)
    h = nn.gelu(h + b1_rows, approximate=False)
    h = h * gate_rows
    ye = jax.lax.ragged_dot(h.astype(xs.dtype), w2, group_sizes)
    return ye.astype(jnp.float32).mean()


if __name__ == "__main__":
    main()
