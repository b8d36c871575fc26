"""Training API: jittable train step + data-parallel training loop.

Equivalent of the reference's ``train_model`` (mogen/apis/train.py:35-160):
dataloaders -> (DDP wrap -> runner -> hooks) becomes (mesh -> pjit train step
-> python epoch loop with checkpoint/eval hooks).  Gradient all-reduce is
emitted by XLA from the batch sharding; there is no explicit DDP wrapper.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import (TrainState, batch_sharding, build_lr_schedule, create_mesh,
                        create_train_state, replicated, shard_batch)


def set_random_seed(seed: int) -> jax.Array:
    """Explicit PRNG threading replaces the reference's global seeding
    (apis/train.py:17-32)."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def device_prefetch(batch_iter, mesh, depth: int = 2):
    """Overlap host collate + ``device_put`` with device compute: a feeder
    thread filters each batch to its numeric arrays and shards it onto the
    mesh, keeping up to ``depth`` device-resident batches queued while the
    train step runs.  TPU equivalent of the reference's worker-process
    loader + CUDA-stream prefetcher (datasets/builder.py:92-102)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    sentinel = object()
    errors = []

    def feeder():
        try:
            for batch in batch_iter:
                batch = {k: v for k, v in batch.items()
                         if hasattr(v, "dtype")
                         and np.issubdtype(np.asarray(v).dtype, np.number)}
                q.put(shard_batch(batch, mesh))
        except BaseException as e:  # surfaced on the consumer side
            errors.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            t.join()
            if errors:
                raise errors[0]
            return
        yield item


def make_train_step(arch, fp16: Optional[dict] = None,
                    grad_accum: int = 1) -> Callable:
    """Pure (state, batch, rng) -> (state, logs) step for jit/pjit.

    ``fp16`` mirrors the reference's mmcv Fp16OptimizerHook option
    (mogen/apis/train.py:119-128): when set, the forward/backward runs in
    half precision against a float32 master copy of the params.  On TPU the
    half type is bfloat16 (``dtype`` key, default 'bfloat16'), whose range
    makes the hook's loss scaling unnecessary — a static ``loss_scale`` is
    still honored for parity when requested.

    ``grad_accum`` > 1 splits the batch into that many microbatches and runs
    them through a ``lax.scan``, accumulating f32 gradients before the single
    optimizer update (mmcv's ``cumulative_iters``, done the XLA way: peak
    activation memory drops to ~1/N while the MXU still sees the per-micro
    matmul shapes).  This is how the reference recipe's global batch 128
    fits a 16 GB v5e chip without remat.  The per-sample log vectors keep
    input order, so the loss-aware sampler feedback is unaffected.
    """
    compute_dtype = None
    loss_scale = 1.0
    if fp16 is not None:
        compute_dtype = jnp.dtype(fp16.get("dtype", "bfloat16"))
        ls = fp16.get("loss_scale", 1.0)
        loss_scale = float(ls) if not isinstance(ls, str) else 1.0

    def grads_and_logs(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        def loss_fn(params):
            if compute_dtype is not None:
                params = jax.tree_util.tree_map(
                    lambda p: p.astype(compute_dtype)
                    if jnp.issubdtype(p.dtype, jnp.floating) else p, params)
            variables = {"params": params}
            if state.extra_variables:
                variables.update(state.extra_variables)
            loss, logs = arch.loss(variables, batch, rng)
            return jnp.asarray(loss, jnp.float32) * loss_scale, logs

        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if loss_scale != 1.0:
            grads = jax.tree_util.tree_map(lambda g: g / loss_scale, grads)
        return grads, logs

    def finish(state, grads, scalars, logs):
        new_state = state.apply_gradients(grads)
        # per-sample vectors for the loss-aware timestep sampler
        scalars["_timesteps"] = logs.get("timesteps")
        scalars["_loss_batch"] = logs.get("recon_loss_batch")
        return new_state, scalars

    def train_step(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        grads, logs = grads_and_logs(state, batch, rng)
        scalars = {k: v for k, v in logs.items()
                   if hasattr(v, "ndim") and v.ndim == 0}
        return finish(state, grads, scalars, logs)

    def train_step_accum(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        N = grad_accum
        sizes = {v.shape[0] for v in batch.values() if hasattr(v, "shape") and v.ndim}
        B = max(sizes)
        if B % N:
            raise ValueError(f"grad_accum={N} must divide the batch size {B}")
        micro = jax.tree_util.tree_map(
            lambda v: v.reshape((N, B // N) + v.shape[1:])
            if hasattr(v, "shape") and v.ndim and v.shape[0] == B else
            jnp.broadcast_to(v, (N,) + jnp.shape(v)), batch)
        rngs = jax.random.split(rng, N)

        def body(acc, mb_rng):
            mb, r = mb_rng
            grads, logs = grads_and_logs(state, mb, r)
            acc = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(jnp.float32), acc, grads)
            scalars = {k: jnp.asarray(v, jnp.float32) for k, v in logs.items()
                       if hasattr(v, "ndim") and v.ndim == 0}
            vectors = {"_timesteps": logs.get("timesteps"),
                       "_loss_batch": logs.get("recon_loss_batch")}
            return acc, (scalars, vectors)

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
        acc, (scalars, vectors) = jax.lax.scan(body, zeros, (micro, rngs))
        grads = jax.tree_util.tree_map(lambda g: g / N, acc)
        scalars = {k: jnp.mean(v) for k, v in scalars.items()}
        # scan stacked [N, B/N] in input order; flatten back to [B]
        logs = {k: (v.reshape((B,) + v.shape[2:]) if v is not None else None)
                for k, v in vectors.items()}
        return finish(state, grads, scalars,
                      {"timesteps": logs["_timesteps"],
                       "recon_loss_batch": logs["_loss_batch"]})

    return train_step_accum if grad_accum > 1 else train_step


def train_model(arch,
                dataloader: Iterable[Dict[str, Any]],
                *,
                optimizer_cfg: Optional[dict] = None,
                lr_config: Optional[dict] = None,
                grad_clip: Optional[dict] = None,
                max_epochs: int = 1,
                steps_per_epoch: Optional[int] = None,
                seed: int = 0,
                mesh=None,
                log_interval: int = 50,
                logger=None,
                checkpoint_fn: Optional[Callable] = None,
                eval_fn: Optional[Callable] = None,
                init_state: Optional[TrainState] = None,
                frozen_prefixes=("text_enc/clip",),
                resume_dir: Optional[str] = None,
                variables_transform: Optional[Callable] = None,
                fp16: Optional[dict] = None,
                grad_accum: int = 1):
    """Config-driven loop: Adam + step decay, per-epoch checkpoint/eval hooks
    (reference recipe at configs/stmogen/...0_125b.py:13-24)."""
    rng = set_random_seed(seed)
    mesh = mesh or create_mesh()
    first = next(iter(dataloader))

    if init_state is None:
        rng, init_rng = jax.random.split(rng)
        with jax.set_mesh(mesh):  # expert-axis constraints fire during init
            variables = arch.init(init_rng, first)
        if variables_transform is not None:
            variables = variables_transform(variables)
        schedule = build_lr_schedule((optimizer_cfg or {}).get("lr", 2e-4), lr_config,
                                     steps_per_epoch or 1)
        state = create_train_state(variables["params"], optimizer_cfg or {"type": "Adam"},
                                   schedule, grad_clip, frozen_prefixes,
                                   extra_variables={k: v for k, v in variables.items()
                                                    if k != "params"} or None)
    else:
        state = init_state

    start_epoch = 0
    if resume_dir is not None:
        from ..utils.checkpoint import latest_step, load_checkpoint
        step = latest_step(resume_dir)
        if step is not None:
            state = load_checkpoint(resume_dir, state, step)
            start_epoch = step + 1
            log = logger or (lambda m: print(m, flush=True))
            log(f"resumed from {resume_dir} at epoch {step}")

    # the per-step rng is fold_in of a traced step index INSIDE the jit: an
    # eager jax.random.split per step is a blocking RPC on remote-runtime
    # TPUs (see apis/windowed.py for the measured cost of eager carries)
    base_step = make_train_step(arch, fp16=fp16, grad_accum=grad_accum)
    from ..parallel import TENSOR_AXIS
    if TENSOR_AXIS in mesh.axis_names and mesh.shape[TENSOR_AXIS] > 1:
        # tensor-parallel weight layout (parallel/tp.py): params + adam
        # moments stay sharded across steps; the batch stays on 'data'
        from ..parallel import tree_shardings
        state_sh = tree_shardings(state, mesh)
        state = jax.device_put(state, state_sh)
    else:
        state_sh = replicated(mesh)
    step_fn = jax.jit(lambda s, b, r, i: base_step(s, b, jax.random.fold_in(r, i)),
                      in_shardings=(state_sh, batch_sharding(mesh),
                                    replicated(mesh), replicated(mesh)),
                      out_shardings=(state_sh, replicated(mesh)))

    log = logger or (lambda msg: print(msg, flush=True))
    global_step = 0
    with jax.set_mesh(mesh):
        for epoch in range(start_epoch, max_epochs):
            t0 = time.time()
            # one eager fold per EPOCH keeps resumed runs on fresh streams;
            # the per-step fold happens inside the jit (no per-step RPC)
            epoch_rng = jax.random.fold_in(rng, epoch)
            for step_in_epoch, batch in enumerate(
                    device_prefetch(iter(dataloader), mesh)):
                state, logs = step_fn(state, batch, epoch_rng,
                                      np.int32(step_in_epoch))
                # loss-second-moment sampler sync (gaussian_diffusion.py:76-115)
                if (hasattr(arch, "sampler")
                        and hasattr(arch.sampler, "update_with_local_losses")
                        and logs.get("_timesteps") is not None):
                    arch.sampler.update_with_local_losses(
                        logs["_timesteps"], logs["_loss_batch"])
                global_step += 1
                if global_step % log_interval == 0:
                    scal = {k: float(v) for k, v in logs.items()
                            if not k.startswith("_") and v is not None}
                    log(f"epoch {epoch} step {global_step}: "
                        + " ".join(f"{k}={v:.5f}" for k, v in sorted(scal.items())))
            log(f"epoch {epoch} done in {time.time() - t0:.1f}s")
            if checkpoint_fn is not None:
                checkpoint_fn(state, epoch)
            if eval_fn is not None:
                eval_fn(state, epoch)
    return state
