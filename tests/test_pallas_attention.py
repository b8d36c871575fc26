"""Pallas fused linear attention vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from motioncraft_tpu.ops.pallas_attention import (_reference,
                                                  fused_linear_attention)


def test_fused_matches_reference(rng):
    B, T, N, H, d = 2, 13, 21, 3, 16  # deliberately unaligned
    q = jnp.asarray(rng.randn(B, T, H, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, N, H, d), jnp.float32)
    # mask out the last 5 keys like the callers do
    k = k.at[:, -5:].add(-1e6)
    v = jnp.asarray(rng.randn(B, N, H, d), jnp.float32)
    v = v.at[:, -5:].set(0.0)
    want = np.asarray(_reference(q, k, v))
    got = np.asarray(fused_linear_attention(q, k, v, True))  # interpret mode
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_gradients_flow(rng):
    B, T, N, H, d = 1, 8, 8, 2, 8
    q = jnp.asarray(rng.randn(B, T, H, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, N, H, d), jnp.float32)
    g1 = jax.grad(lambda a: fused_linear_attention(a, k, v, True).sum())(q)
    g2 = jax.grad(lambda a: _reference(a, k, v).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=1e-5)
