"""Gradient accumulation (make_train_step(grad_accum=N)): N microbatches
through a lax.scan, one optimizer update — mmcv's ``cumulative_iters``
equivalent, done the XLA way (~1/N activation memory; the reference's
global-batch-128 recipe on a 16 GB chip).  Tests prove the accumulated step
equals the hand-averaged per-microbatch gradients, keeps the per-sample log
vectors in input order for the loss-aware sampler, and runs identically
under the 8-device data-parallel mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motioncraft_tpu.apis import build_flagship, make_text_batch, tiny_t2m_cfg
from motioncraft_tpu.apis.train import make_train_step
from motioncraft_tpu.parallel import create_train_state


@pytest.fixture(scope="module")
def setup():
    arch = build_flagship(tiny_t2m_cfg(max_seq_len=16))
    batch = make_text_batch(["a person walks", "a person waves",
                             "a person jumps", "a person sits"],
                            max_seq_len=16)
    variables = arch.init(jax.random.PRNGKey(0), batch)
    state = create_train_state(variables["params"], {"type": "Adam", "lr": 1e-4},
                               extra_variables={k: v for k, v in variables.items()
                                                if k != "params"} or None)
    return arch, state, batch


def _manual_micro_grads(arch, state, batch, rng, n):
    """Per-microbatch grads/logs exactly as the accum path computes them:
    row-major batch split, rng split into N."""
    B = batch["motion"].shape[0]
    rngs = jax.random.split(rng, n)
    out = []
    for i in range(n):
        mb = {k: v[i * (B // n):(i + 1) * (B // n)] for k, v in batch.items()}

        def loss_fn(params):
            variables = {"params": params}
            if state.extra_variables:
                variables.update(state.extra_variables)
            loss, logs = arch.loss(variables, mb, rngs[i])
            return jnp.asarray(loss, jnp.float32), logs

        out.append(jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(state.params))
    return out


def test_grad_accum_matches_manual_average(setup):
    arch, state, batch = setup
    rng = jax.random.PRNGKey(7)
    new_state, logs = jax.jit(make_train_step(arch, grad_accum=2))(
        state, batch, rng)

    micro = _manual_micro_grads(arch, state, batch, rng, 2)
    avg = jax.tree_util.tree_map(
        lambda a, b: (a.astype(jnp.float32) + b.astype(jnp.float32)) / 2,
        micro[0][1], micro[1][1])
    ref_state = state.apply_gradients(avg)

    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), new_state.params,
        ref_state.params)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-6

    # scalar logs are the mean over microbatches
    mean_loss = float((micro[0][0][0] + micro[1][0][0]) / 2)
    np.testing.assert_allclose(float(logs["loss"]), mean_loss, rtol=1e-5)

    # per-sample vectors flatten back to input order (loss-aware sampler)
    ts = np.concatenate([np.asarray(m[0][1]["timesteps"]) for m in micro])
    np.testing.assert_array_equal(np.asarray(logs["_timesteps"]), ts)
    lb = np.concatenate([np.asarray(m[0][1]["recon_loss_batch"]) for m in micro])
    np.testing.assert_allclose(np.asarray(logs["_loss_batch"]), lb, rtol=1e-5)


def test_grad_accum_divisibility_error(setup):
    arch, state, batch = setup
    with pytest.raises(ValueError, match="grad_accum"):
        jax.jit(make_train_step(arch, grad_accum=3))(
            state, batch, jax.random.PRNGKey(0))


@pytest.mark.slow
def test_grad_accum_fp16_runs(setup):
    """bf16 forward/backward composes with accumulation (accumulator is f32)."""
    arch, state, batch = setup
    new_state, logs = jax.jit(make_train_step(
        arch, fp16=dict(dtype="bfloat16", loss_scale=8.0), grad_accum=2))(
        state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(logs["loss"]))
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(new_state.params)
               if jnp.issubdtype(l.dtype, jnp.floating))


@pytest.mark.slow
def test_grad_accum_data_parallel_matches_single(setup):
    """Accumulated step under the 8-device data mesh == single-device."""
    from motioncraft_tpu.parallel import (batch_sharding, create_mesh,
                                          replicated, shard_batch)
    arch, state, batch = setup
    rng = jax.random.PRNGKey(9)
    ref_state, ref_logs = jax.jit(make_train_step(arch, grad_accum=2))(
        state, batch, rng)

    mesh = create_mesh()
    step = jax.jit(make_train_step(arch, grad_accum=2),
                   in_shardings=(replicated(mesh), batch_sharding(mesh),
                                 replicated(mesh)),
                   out_shardings=(replicated(mesh), replicated(mesh)))
    with jax.set_mesh(mesh):
        sh_state, sh_logs = step(state, shard_batch(batch, mesh), rng)
    np.testing.assert_allclose(float(sh_logs["loss"]), float(ref_logs["loss"]),
                               rtol=1e-5, atol=1e-6)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), ref_state.params,
        sh_state.params)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-5
