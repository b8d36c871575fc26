"""Loop-slope profile of the flagship training step (fwd+bwd+Adam).

Measures the jitted (state, batch, rng) -> (state, logs) step at the
reference recipe shape (B x 196 x 322, cond-dropout, MoE aux losses) and
prints steps/s + samples/s.  Optionally with the bf16 mixed-precision hook.

Usage: python tools/profile_train.py [--batch 64] [--fp16]
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


def bench_feed(batch_size: int, T: int, workers: int, n_batches: int = 40):
    """Host input-pipeline throughput (samples/s): dataset read -> collate
    -> tokenize -> device_put, sync vs prefetch-threaded loader.  This is the
    feed side the in-jit train-step slope excludes; it must exceed the step
    rate (e.g. ~1.5k samples/s for a v5e-8 at B=32/chip) or the loader is the
    bottleneck."""
    from motioncraft_tpu.data.loader import DataLoader
    from motioncraft_tpu.parallel import create_mesh, shard_batch

    rng = np.random.RandomState(0)
    # pre-generated pool: real datasets read cached npz rows, they don't
    # synthesize 250 KB of randn per sample (that would dominate the measure)
    pool = [rng.randn(T, 322).astype(np.float32) for _ in range(256)]
    mask = np.ones((T,), np.float32)

    class SynthDataset:
        def __len__(self):
            return batch_size * n_batches

        def __getitem__(self, i):
            return {"motion": pool[i % len(pool)],
                    "motion_mask": mask,
                    "motion_length": T,
                    "motion_metas": {"text": f"a person does action {i}"}}

    mesh = create_mesh()
    for nw in sorted({0, workers}):
        loader = DataLoader(SynthDataset(), batch_size, shuffle=False,
                            num_workers=nw)
        n = 0
        t0 = time.time()
        for b in loader:
            b = {k: v for k, v in b.items()
                 if hasattr(v, "dtype") and np.issubdtype(np.asarray(v).dtype,
                                                          np.number)}
            out = shard_batch(b, mesh)
            n += batch_size
        jax.block_until_ready(out["motion"])
        dt = time.time() - t0
        print(f"feed B={batch_size} T={T} workers={nw}: "
              f"{n / dt:.1f} samples/s ({dt / (n / batch_size) * 1e3:.1f} ms/batch)",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t", type=int, default=196)
    ap.add_argument("--fp16", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize decoder blocks (jax.checkpoint)")
    ap.add_argument("--feed", action="store_true",
                    help="measure host input-pipeline samples/s and exit")
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()

    if args.feed:
        bench_feed(args.batch, args.t, args.workers)
        return

    from motioncraft_tpu.apis import build_flagship, flagship_t2m_cfg, make_text_batch
    from motioncraft_tpu.apis.train import make_train_step
    from motioncraft_tpu.parallel import create_train_state

    B, T = args.batch, args.t
    cfg = flagship_t2m_cfg()
    if args.remat:
        cfg["model"]["remat"] = True
    arch = build_flagship(cfg)
    rng_np = np.random.RandomState(0)
    batch = make_text_batch([f"a person does action {i}" for i in range(B)],
                            max_seq_len=T,
                            motion=rng_np.randn(B, T, 322).astype(np.float32) * 0.1)
    variables = arch.init(jax.random.PRNGKey(0), batch)
    state = create_train_state(variables["params"], {"type": "Adam", "lr": 2e-4})
    step = make_train_step(arch, fp16={"dtype": "bfloat16"} if args.fp16 else None)

    # in-jit loop slope: per-dispatch timing through the remote tunnel is
    # meaningless (~30 ms dispatch overhead per call)
    def body(i, carry):
        st, r = carry
        r, sub = jax.random.split(r)
        st, _ = step(st, batch, sub)
        return (st, r)

    ts = {}
    for n in (1, 6):
        run = jax.jit(lambda st, r, n=n: jax.lax.fori_loop(0, n, body, (st, r)))
        t0 = time.time()
        out = run(state, jax.random.PRNGKey(1))
        jax.block_until_ready(jax.tree_util.tree_leaves(out[0].params)[0])
        if n == 1:
            print(f"compile+first step {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        out = run(state, jax.random.PRNGKey(1))
        jax.block_until_ready(jax.tree_util.tree_leaves(out[0].params)[0])
        ts[n] = time.time() - t0
    dt = (ts[6] - ts[1]) / 5
    print(f"train step B={B} T={T} fp16={args.fp16} remat={args.remat}: {dt * 1e3:.1f} ms/step, "
          f"{B / dt:.1f} samples/s", flush=True)


if __name__ == "__main__":
    main()
