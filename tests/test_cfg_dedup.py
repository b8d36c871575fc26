"""Exact-path sampling levers: CFG layer-0 dedup + text-branch hoist.

The CFG test forward doubles the batch into identical cond/uncond halves
(reference transformer.py get_precompute_condition -> forward_test pattern,
mogen/models/transformers/stmogen.py); divergence between the halves enters
only through ``text_cond_type`` inside layer 0's linear attention.  Two
exact-algebra levers exploit this (models/attentions.py STMA,
models/stmogen.py):

- ``cfg_layer0_dedup``: layer 0's motion MoE + body graph compute once on
  the first half and tile.
- ``text_hoist``: EVERY layer's text MoE depends only on xf (no x/emb/
  timestep), so architecture.sample precomputes it once per call
  (precompute_text_feats) instead of per DDIM step per CFG half.

These tests pin that each lever (and their default-on combination) is
output-identical to the plain path for the plain stack, the step-cached
stack, and the ControlNet branch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import motioncraft_tpu.models  # noqa: F401  (register)
from motioncraft_tpu.apis import build_flagship, make_text_batch, tiny_t2m_cfg
from motioncraft_tpu.diffusion import StepCacheConfig

pytestmark = pytest.mark.slow  # jitted sampling compiles

OFF = {"cfg_layer0_dedup": False, "text_hoist": False}
LEVERS = {
    "both (default)": {},
    "dedup only": {"text_hoist": False},
    "hoist only": {"cfg_layer0_dedup": False},
}


def _arch(overrides):
    cfg = tiny_t2m_cfg()
    cfg["model"] = dict(cfg["model"], **overrides)
    return build_flagship(cfg)


@pytest.fixture(scope="module")
def base():
    arch_off = _arch(OFF)
    batch = make_text_batch(["a person walks forward", "someone waves hello"],
                            max_seq_len=16)
    variables = arch_off.init(jax.random.PRNGKey(0), batch)
    return arch_off, variables, batch


@pytest.mark.parametrize("name", list(LEVERS))
def test_sample_identical_plain_stack(base, name):
    arch_off, variables, batch = base
    rng = jax.random.PRNGKey(1)
    s_off = jax.jit(lambda v, b, r: arch_off.sample(v, b, r))(variables, batch, rng)
    arch_on = _arch(LEVERS[name])
    s_on = jax.jit(lambda v, b, r: arch_on.sample(v, b, r))(variables, batch, rng)
    # same params, same rng: the levers are exact algebra (modulo MoE
    # capacity reordering, which must not trigger at these shapes)
    np.testing.assert_allclose(np.asarray(s_on), np.asarray(s_off),
                               rtol=1e-5, atol=1e-5)


def test_sample_identical_step_cached(base):
    arch_off, variables, batch = base
    rng = jax.random.PRNGKey(2)
    sc = StepCacheConfig(reuse_every=2, warmup=1, tail=1)
    s_off = jax.jit(lambda v, b, r: arch_off.sample(v, b, r, step_cache=sc))(
        variables, batch, rng)
    arch_on = _arch({})  # both levers on (default)
    s_on = jax.jit(lambda v, b, r: arch_on.sample(v, b, r, step_cache=sc))(
        variables, batch, rng)
    np.testing.assert_allclose(np.asarray(s_on), np.asarray(s_off),
                               rtol=1e-5, atol=1e-5)


def test_train_loss_unaffected(base):
    """Both levers are inference-only: the train path never dedups or
    hoists, so the toggles must not change the loss."""
    arch_off, variables, batch = base
    rng = jax.random.PRNGKey(3)
    arch_on = _arch({})
    l_on, _ = jax.jit(arch_on.loss)(variables, batch, rng)
    l_off, _ = jax.jit(arch_off.loss)(variables, batch, rng)
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=0, atol=0)


def test_controlnet_sample_identical():
    from motioncraft_tpu.registry import build_architecture

    def ctrl_cfg(levers):
        base = tiny_t2m_cfg()
        model = dict(base["model"], **levers)
        cfg = dict(base)
        cfg["model"] = dict(
            type="ControlT2MHalf", base_model=model, copy_blocks_num=1,
            control_cond_feats=2,
            condition_encode_cfg=dict(dataset_name="beats2",
                                      condition_pre_encode=True,
                                      condition_pre_encode_type="wav",
                                      condition_latent_dim=16,
                                      control_cond_feats=2,
                                      condition_cfg=True))
        return cfg

    arch_on = build_architecture(ctrl_cfg({}))
    arch_off = build_architecture(ctrl_cfg(OFF))
    T = 16
    batch = make_text_batch(["someone is speaking"], max_seq_len=T)
    rng_np = np.random.RandomState(0)
    batch["c"] = np.asarray(rng_np.randn(1, T * (16000 // 30), 2), np.float32)
    variables = arch_off.init(jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(4)
    s_off = jax.jit(lambda v, b, r: arch_off.sample(v, b, r))(variables, batch, rng)
    s_on = jax.jit(lambda v, b, r: arch_on.sample(v, b, r))(variables, batch, rng)
    np.testing.assert_allclose(np.asarray(s_on), np.asarray(s_off),
                               rtol=1e-5, atol=1e-5)
