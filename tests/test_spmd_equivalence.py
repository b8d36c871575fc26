"""SPMD numeric equivalence: the sharded paths must compute the SAME numbers
as the unsharded ones (the reference's DDP is numerics-equivalent by
construction; our pjit/mesh equivalent must prove it).

Covers: expert-sharded MoELayer vs unsharded, 8-device data-parallel train
step vs single device (loss AND updated params), and the sharded CFG sampler
vs single device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from motioncraft_tpu.apis import build_flagship, make_text_batch, tiny_t2m_cfg
from motioncraft_tpu.apis.train import make_train_step
from motioncraft_tpu.parallel import (batch_sharding, create_mesh,
                                      create_train_state, replicated, shard_batch)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device virtual CPU mesh")


def tree_max_abs_diff(a, b):
    leaves = jax.tree_util.tree_map(
        lambda x, y: float(jnp.max(jnp.abs(jnp.asarray(x, jnp.float32)
                                           - jnp.asarray(y, jnp.float32))))
        if hasattr(x, "dtype") else 0.0, a, b)
    return max(jax.tree_util.tree_leaves(leaves) or [0.0])


class TestMoEExpertSharding:
    def test_sharded_matches_unsharded(self):
        from motioncraft_tpu.models.moe import MoELayer

        N, D, E = 64, 16, 8
        x = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
        unsharded = MoELayer(num_experts=E, topk=2, model_dim=D, hidden_dim=32,
                             gate_noise=0.0)
        sharded = MoELayer(num_experts=E, topk=2, model_dim=D, hidden_dim=32,
                           gate_noise=0.0, expert_axis="expert")
        params = unsharded.init(jax.random.PRNGKey(1), x)

        ref, ref_aux = unsharded.apply(params, x, train=True)
        mesh = create_mesh(8)  # (data 4, expert 2)
        with jax.set_mesh(mesh):
            out, aux = jax.jit(
                lambda p, v: sharded.apply(p, v, train=True),
                in_shardings=(replicated(mesh),
                              jax.sharding.NamedSharding(mesh, P())),
            )(jax.device_get(params), np.asarray(x))
        assert float(jnp.max(jnp.abs(ref - out))) < 1e-5
        assert abs(float(ref_aux) - float(aux)) < 1e-5

    def test_sharded_matches_unsharded_eval(self):
        from motioncraft_tpu.models.moe import MoELayer

        N, D, E = 64, 16, 8
        x = jax.random.normal(jax.random.PRNGKey(2), (N, D), jnp.float32)
        unsharded = MoELayer(num_experts=E, topk=2, model_dim=D, hidden_dim=32,
                             gate_noise=0.0)
        sharded = MoELayer(num_experts=E, topk=2, model_dim=D, hidden_dim=32,
                           gate_noise=0.0, expert_axis="expert")
        params = unsharded.init(jax.random.PRNGKey(3), x)
        ref, _ = unsharded.apply(params, x, train=False)
        mesh = create_mesh(8)
        with jax.set_mesh(mesh):
            out, _ = jax.jit(lambda p, v: sharded.apply(p, v, train=False),
                             in_shardings=(replicated(mesh),
                                           jax.sharding.NamedSharding(mesh, P())),
                             )(jax.device_get(params), np.asarray(x))
        assert float(jnp.max(jnp.abs(ref - out))) < 1e-5


class TestDataParallelTrainStep:
    def _setup(self):
        arch = build_flagship(tiny_t2m_cfg(expert_axis="expert"))
        batch = make_text_batch([f"sample {i}" for i in range(8)],
                                max_seq_len=16)
        with jax.set_mesh(create_mesh(8)):  # constraint needs a mesh context
            variables = arch.init(jax.random.PRNGKey(0), batch)
            state = create_train_state(variables["params"],
                                       {"type": "Adam", "lr": 2e-4})
        return arch, batch, jax.device_get(state)

    def test_loss_and_update_match_single_device(self):
        arch, batch, state0 = self._setup()
        rng = jax.random.PRNGKey(1)
        step = make_train_step(arch)

        mesh8 = create_mesh(8)
        with jax.set_mesh(mesh8):
            s8, logs8 = jax.jit(step,
                                in_shardings=(replicated(mesh8),
                                              batch_sharding(mesh8),
                                              replicated(mesh8)),
                                out_shardings=(replicated(mesh8),
                                               replicated(mesh8)))(
                state0, shard_batch(dict(batch), mesh8), rng)
            loss8 = float(logs8["loss"])
            s8 = jax.device_get(s8)

        mesh1 = create_mesh(1)
        with jax.set_mesh(mesh1):
            s1, logs1 = jax.jit(step,
                                in_shardings=(replicated(mesh1),
                                              batch_sharding(mesh1),
                                              replicated(mesh1)),
                                out_shardings=(replicated(mesh1),
                                               replicated(mesh1)))(
                state0, shard_batch(dict(batch), mesh1), rng)
            loss1 = float(logs1["loss"])
            s1 = jax.device_get(s1)

        assert abs(loss8 - loss1) < 1e-5 * max(1.0, abs(loss1))
        assert tree_max_abs_diff(s8.params, s1.params) < 1e-5

    @pytest.mark.slow
    def test_sharded_sampler_matches_single_device(self):
        arch, batch, state0 = self._setup()
        rng = jax.random.PRNGKey(2)
        jb = {k: v for k, v in batch.items()
              if hasattr(v, "dtype") and np.issubdtype(np.asarray(v).dtype,
                                                       np.number)}
        mesh8 = create_mesh(8)
        with jax.set_mesh(mesh8):
            out8 = jax.jit(lambda v, b, r: arch.sample(v, b, r),
                           in_shardings=(replicated(mesh8),
                                         batch_sharding(mesh8),
                                         replicated(mesh8)))(
                {"params": state0.params}, shard_batch(dict(jb), mesh8), rng)
            out8 = np.asarray(out8)
        mesh1 = create_mesh(1)
        with jax.set_mesh(mesh1):
            out1 = jax.jit(lambda v, b, r: arch.sample(v, b, r),
                           in_shardings=(replicated(mesh1),
                                         batch_sharding(mesh1),
                                         replicated(mesh1)))(
                {"params": state0.params}, shard_batch(dict(jb), mesh1), rng)
            out1 = np.asarray(out1)
        # a 4-step DDIM chain compounds reduction-order noise; still tight
        assert np.max(np.abs(out8 - out1)) < 1e-4
