"""Tensor-parallel + sequence-parallel numeric equivalence.

The (data, expert, tensor) mesh shards MoE expert hidden dims, SFFN stacks,
and text-encoder FFNs Megatron-style (parallel/tp.py); GSPMD guarantees the
collectives, these tests prove the *numbers* match the single-device step —
same bar as tests/test_spmd_equivalence.py set for dp/ep.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from motioncraft_tpu.apis import build_flagship, make_text_batch, tiny_t2m_cfg
from motioncraft_tpu.apis.train import make_train_step
from motioncraft_tpu.parallel import (batch_sharding, create_mesh,
                                      create_train_state, replicated,
                                      shard_batch, shard_batch_sp,
                                      tree_shardings)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device virtual CPU mesh")


def tp_mesh():
    return create_mesh(8, axes=("data", "expert", "tensor"))  # (2, 2, 2)


def tree_max_abs_diff(a, b):
    leaves = jax.tree_util.tree_map(
        lambda x, y: float(jnp.max(jnp.abs(jnp.asarray(x, jnp.float32)
                                           - jnp.asarray(y, jnp.float32))))
        if hasattr(x, "dtype") else 0.0, a, b)
    return max(jax.tree_util.tree_leaves(leaves) or [0.0])


class TestSpecRules:
    def test_rules_on_real_param_tree(self, tiny_arch_state):
        _, _, state0 = tiny_arch_state
        mesh = tp_mesh()
        sh = tree_shardings(state0.params, mesh)
        flat = {"/".join(str(getattr(k, "key", k)) for k in path): s.spec
                for path, s in jax.tree_util.tree_leaves_with_path(sh)}

        def lookup(suffix):
            hits = [v for k, v in flat.items() if k.endswith(suffix)]
            assert hits, f"no param path ends with {suffix}"
            return hits[0]

        assert lookup("motion_moe/model/expert_w1") == P("expert", None, "tensor")
        assert lookup("motion_moe/model/expert_w2") == P("expert", "tensor", None)
        assert lookup("motion_moe/model/expert_b1") == P("expert", "tensor")
        assert lookup("ffn/w1") == P(None, None, "tensor")
        assert lookup("ffn/w2") == P(None, "tensor", None)
        assert lookup("ffn/b1") == P(None, "tensor")
        assert lookup("textTransEncoder_0/linear1/kernel") == P(None, "tensor")
        assert lookup("textTransEncoder_0/linear2/kernel") == P("tensor", None)
        assert lookup("clip/resblock_0/mlp_fc/kernel") == P(None, "tensor")
        assert lookup("clip/token_embedding/embedding") == P("tensor", None)
        # non-FFN leaves stay replicated
        assert lookup("ca_block/norm/scale") == P()
        assert lookup("body_weight") == P()

    def test_non_divisible_dims_replicate(self):
        mesh = tp_mesh()
        from motioncraft_tpu.parallel.tp import leaf_spec

        class K:  # fake DictKey
            def __init__(self, key):
                self.key = key

        odd = jnp.zeros((16, 7, 33))  # f=33 not divisible by tensor=2
        spec = leaf_spec((K("model"), K("expert_w1")), odd, mesh)
        assert spec == P("expert", None, None)

    def test_optimizer_moments_match_param_specs(self, tiny_arch_state):
        _, _, state0 = tiny_arch_state
        mesh = tp_mesh()
        sh = tree_shardings(state0, mesh)
        specs = [s.spec for path, s in jax.tree_util.tree_leaves_with_path(sh)
                 if any("expert_w1" in str(getattr(k, "key", k)) for k in path)]
        # params + adam mu + nu for each of the 2*2 expert_w1 leaves
        assert len(specs) >= 3
        assert all(s == P("expert", None, "tensor") for s in specs)


@pytest.fixture(scope="module")
def tiny_arch_state():
    arch = build_flagship(tiny_t2m_cfg(expert_axis="expert"))
    batch = make_text_batch([f"sample {i}" for i in range(8)], max_seq_len=16)
    with jax.set_mesh(create_mesh(8)):
        variables = arch.init(jax.random.PRNGKey(0), batch)
        state = create_train_state(variables["params"], {"type": "Adam", "lr": 2e-4})
    return arch, batch, jax.device_get(state)


@pytest.fixture(scope="module")
def single_device_ref(tiny_arch_state):
    """Single-device train-step reference at PRNGKey(1), shared by the tp and
    sp parity tests (one trace + run instead of two)."""
    arch, batch, state0 = tiny_arch_state
    step = make_train_step(arch)
    mesh1 = create_mesh(1)
    with jax.set_mesh(mesh1):
        s1, logs1 = jax.jit(step,
                            in_shardings=(replicated(mesh1),
                                          batch_sharding(mesh1),
                                          replicated(mesh1)),
                            out_shardings=(replicated(mesh1),
                                           replicated(mesh1)))(
            state0, shard_batch(dict(batch), mesh1), jax.random.PRNGKey(1))
        return jax.device_get(s1), float(logs1["loss"])


class TestTensorParallelTrainStep:
    def test_tp_loss_and_update_match_single_device(self, tiny_arch_state,
                                                    single_device_ref):
        arch, batch, state0 = tiny_arch_state
        rng = jax.random.PRNGKey(1)
        step = make_train_step(arch)
        mesh = tp_mesh()
        with jax.set_mesh(mesh):
            s_tp, logs = jax.jit(step,
                                 in_shardings=(tree_shardings(state0, mesh),
                                               batch_sharding(mesh),
                                               replicated(mesh)))(
                state0, shard_batch(dict(batch), mesh), rng)
            loss_tp = float(logs["loss"])
            s_tp = jax.device_get(s_tp)
        s1, loss1 = single_device_ref
        assert abs(loss_tp - loss1) < 1e-5 * max(1.0, abs(loss1))
        # tensor-sharded matmuls reorder the f32 contraction; adam's
        # m/(sqrt(v)+eps) amplifies the ~1e-7 grad noise at step 1
        assert tree_max_abs_diff(s_tp.params, s1.params) < 5e-5

    def test_tp_weights_actually_sharded(self, tiny_arch_state):
        arch, batch, state0 = tiny_arch_state
        mesh = tp_mesh()
        with jax.set_mesh(mesh):
            placed = jax.device_put(state0, tree_shardings(state0, mesh))
        w1 = placed.params["block_0"]["ca_block"]["motion_moe"]["model"]["expert_w1"]
        # (E, d, f) over expert=2 x tensor=2: each shard holds E/2 x d x f/2
        shard_shapes = {s.data.shape for s in w1.addressable_shards}
        E, d, f = w1.shape
        assert shard_shapes == {(E // 2, d, f // 2)}

    def test_sequence_parallel_batch_matches(self, tiny_arch_state,
                                              single_device_ref):
        arch, batch, state0 = tiny_arch_state
        rng = jax.random.PRNGKey(1)  # shared single_device_ref key
        step = make_train_step(arch)
        mesh = tp_mesh()
        with jax.set_mesh(mesh):
            sp_batch = shard_batch_sp(
                {k: v for k, v in batch.items() if hasattr(v, "dtype")}, mesh)
            # motion [B, 16, 322]: T sharded over tensor
            assert sp_batch["motion"].sharding.spec == P("data", "tensor")
            s_sp, logs = jax.jit(step)(
                jax.device_put(state0, tree_shardings(state0, mesh)),
                sp_batch, rng)
            loss_sp = float(logs["loss"])
            s_sp = jax.device_get(s_sp)
        s1, loss1 = single_device_ref
        assert abs(loss_sp - loss1) < 1e-5 * max(1.0, abs(loss1))
        assert tree_max_abs_diff(s_sp.params, s1.params) < 5e-5
