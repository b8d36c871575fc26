"""In-jit loop-slope profile of the S2G ControlNet denoiser forward vs batch.

The lockstep recording batching (apis/windowed.py windowed_sample_batch)
assumed the per-window DDIM step is overhead-bound at R=1, so R=8 should be
nearly free.  Measured instead: step time grows ~linearly with R.  This tool
attributes the growth: loop-slopes the CFG-doubled denoiser forward (the
scan body) at R in {1,2,4,8}, with sublayer zero-out toggles.

Usage: JAX_PLATFORMS=... python tools/profile_s2g.py [--window 64]
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
import numpy as np


def loop_slope(step, state, n1=1, n2=21):
    """step(carry, state) -> carry; `state` passed as a jit ARGUMENT so the
    param tree is not embedded in the serialized HLO (remote-compile tunnels
    cap the request body)."""
    ts = {}
    for n in (n1, n2):
        f = jax.jit(lambda c, s, n=n: jax.lax.fori_loop(
            0, n, lambda i, cc: step(cc, s), c))
        jax.block_until_ready(f(jnp.float32(0.0), state))
        t0 = time.time()
        jax.block_until_ready(f(jnp.float32(0.0), state))
        ts[n] = time.time() - t0
    return (ts[n2] - ts[n1]) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=64)
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--rs", type=str, default="1,2,4,8")
    args = ap.parse_args()

    from motioncraft_tpu.apis import flagship_s2g_cfg, make_text_batch
    from motioncraft_tpu.registry import build_architecture

    kw = {} if args.layers is None else dict(num_layers=args.layers)
    cfg = flagship_s2g_cfg(window=args.window, **kw)
    arch = build_architecture(cfg)
    W = args.window
    spf = 16000 // 30
    rng_np = np.random.RandomState(0)

    def window_batch(R):
        batch = make_text_batch(["a person is doing a speech"] * R, max_seq_len=W)
        batch["c"] = jnp.asarray(rng_np.randn(R, W * spf, 2).astype(np.float32))
        return batch

    variables = arch.init(jax.random.PRNGKey(0), window_batch(1))
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
        variables)

    for R in [int(r) for r in args.rs.split(",")]:
        batch = window_batch(R)
        enc = jax.jit(lambda v: arch.encode_text(v, batch["text_ids"]))(variables)
        xf_proj, xf_out = enc if isinstance(enc, tuple) else (None, enc)
        xf_out = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), xf_out)
        c_enc = jax.jit(
            lambda v, c: arch.model.apply(v, c, W, method="encode_condition")
        )(variables, batch["c"]).astype(jnp.bfloat16)
        motion_mask = batch["motion_mask"].astype(jnp.float32)
        motion_length = batch["motion_length"]
        x = jax.random.normal(jax.random.PRNGKey(1), (R, W, 322), jnp.bfloat16)
        state = dict(variables=variables, x=x, xf_out=xf_out, xf_proj=xf_proj,
                     c_enc=c_enc, motion_mask=motion_mask,
                     motion_length=motion_length)

        def fwd(carry, s):
            t = jnp.full((R,), 500, jnp.int32) - carry.astype(jnp.int32) % 7
            out = arch.model.apply(
                s["variables"], s["x"] + carry.astype(x.dtype), t,
                motion_mask=s["motion_mask"], motion_length=s["motion_length"],
                xf_out=s["xf_out"], xf_proj=s["xf_proj"],
                c=None, c_enc=s["c_enc"], mode="test")
            return carry + out.astype(jnp.float32).mean()

        dt = loop_slope(fwd, state) * 1e3
        print(f"S2G CFG forward R={R:2d} W={W}: {dt:8.3f} ms/step "
              f"({dt / R:6.3f} ms per recording)", flush=True)


if __name__ == "__main__":
    main()
