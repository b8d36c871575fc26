"""Stage-cutoff loop-slope profile of one STMA layer at flagship shapes.

Reimplements STMA's eval path inline with a stage cutoff (each stage returns
a data-dependent scalar so XLA can't DCE the work), using real initialized
params.  Run on the TPU: python tools/profile_stma.py [stage ...]
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

B, T, H, L = 128, 196, 12, 128  # CFG-doubled flagship
TXT = 77


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
    from motioncraft_tpu.models.attentions import STMA

    stma = STMA(latent_dim=L, text_latent_dim=256, num_heads=H, num_text_heads=1,
                num_experts=16, topk=2, gate_noise=1.0, ffn_dim=512,
                time_embed_dim=2048, max_seq_len=T, max_text_seq_len=TXT,
                dropout=0.0, dynamic_body=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, H * L), jnp.bfloat16)
    xf = jax.random.normal(rng, (B, TXT, 256), jnp.bfloat16)
    emb = jax.random.normal(rng, (B, 2048), jnp.bfloat16)
    mask = jnp.ones((B, T, 1), jnp.bfloat16)
    cond = jnp.concatenate([jnp.ones((B // 2, 1, 1)), jnp.zeros((B // 2, 1, 1))])
    params = stma.init(jax.random.PRNGKey(1), x, xf=xf, emb=emb, src_mask=mask,
                       cond_type=cond)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
        params)

    def full(c):
        y = stma.apply(params, x + c.astype(x.dtype), xf=xf, emb=emb,
                       src_mask=mask, cond_type=cond)
        return c + y.astype(jnp.float32).mean()

    from motioncraft_tpu.models.moe import MOE
    moe = MOE(16, 2, L, L * 4, 4 * L, H, T, "cosine_top", 1.0, name="motion_moe")
    mparams = {"params": params["params"]["motion_moe"]}

    def motion_moe_only(c):
        xh = (x + c.astype(x.dtype)).reshape(B, T, H, L)
        y, _ = moe.apply(mparams, xh)
        return c + y.astype(jnp.float32).mean()

    tmoe = MOE(16, 2, 256, 256 * 4, 2 * L, 1, TXT, "cosine_top", 1.0,
               name="text_moe")
    tparams = {"params": params["params"]["text_moe"]}

    def text_moe_only(c):
        tf = (xf + c.astype(xf.dtype)).reshape(B, TXT, 1, 256)
        y, _ = tmoe.apply(tparams, tf)
        return c + y.astype(jnp.float32).mean()

    for name, fn in (("full STMA", full), ("motion MOE wrapper", motion_moe_only),
                     ("text MOE wrapper", text_moe_only)):
        print(f"{name:22s}: {loop_slope(fn) * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
