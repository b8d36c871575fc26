"""Int8 W8A8 serving path (ops/quant.py, QDense, MoELayer/SFFN int8 branches).

The reference has no quantized path; this is a TPU-native serving feature
(halves HBM weight-streaming bytes for the tiny-batch long-form protocol and
maps to the MXU's 2x-peak int8 path).  Tests prove: (a) QDense is
bit-identical to nn.Dense for float kernels, (b) per-layer int8 error is at
the expected W8A8 level, (c) the full quantized STMoGen forward and DDIM
sample stay close to the float reference end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from motioncraft_tpu.models.blocks import SFFN, QDense
from motioncraft_tpu.models.moe import MoELayer
from motioncraft_tpu.ops.quant import (count_quantized, qdot, qeinsum,
                                       quantize_variables, quantize_weight)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48)) * 0.2
    wq, s = quantize_weight(w, 0)
    assert wq.dtype == jnp.int8 and s.shape == (1, 48)
    assert _rel(wq.astype(jnp.float32) * s, w) < 0.006  # 8-bit grid


def test_qdot_accuracy():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (5, 9, 96))
    w = jax.random.normal(k2, (96, 32)) * 0.1
    wq, s = quantize_weight(w, 0)
    assert _rel(qdot(x, wq, s), x @ w) < 0.02


def test_qdense_float_path_bit_identical():
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 11, 40))
    ref, q = nn.Dense(24), QDense(24)
    v = ref.init(jax.random.PRNGKey(3), x)
    assert np.array_equal(np.asarray(ref.apply(v, x)), np.asarray(q.apply(v, x)))


def test_qdense_int8_kernel():
    x = jax.random.normal(jax.random.PRNGKey(4), (6, 80))
    q = QDense(56)
    v = q.init(jax.random.PRNGKey(5), x)
    y_ref = q.apply(v, x)
    wq, s = quantize_weight(v["params"]["kernel"], 0)
    vi = {"params": {"kernel": wq, "bias": v["params"]["bias"]},
          "quant": {"kernel_scale": s}}
    y = q.apply(vi, x)
    assert y.dtype == x.dtype and _rel(y, y_ref) < 0.03
    # bf16 activations stay bf16
    assert q.apply(vi, x.astype(jnp.bfloat16)).dtype == jnp.bfloat16


def test_sffn_int8_matches_float():
    B, T, H, d, f = 2, 7, 4, 16, 32
    x = jax.random.normal(jax.random.PRNGKey(6), (B, T, H * d))
    emb = jax.random.normal(jax.random.PRNGKey(7), (B, 64))
    mod = SFFN(latent_dim=d, ffn_dim=f, num_heads=H, time_embed_dim=64)
    v = mod.init(jax.random.PRNGKey(8), x, emb)
    y_ref = mod.apply(v, x, emb)
    vq = quantize_variables(v, min_elems=0,
                            predicate=lambda p, l: p.endswith(("/w1", "/w2")))
    n, _ = count_quantized(vq)
    assert n == 2
    y = mod.apply(vq, x, emb)
    assert _rel(y, y_ref) < 0.05


def test_moe_layer_int8_matches_float():
    N, D, F, E = 64, 32, 64, 4
    x = jax.random.normal(jax.random.PRNGKey(9), (N, D))
    mod = MoELayer(num_experts=E, topk=2, model_dim=D, hidden_dim=F,
                   gate_type="cosine_top", dispatch_mode="slots")
    v = mod.init(jax.random.PRNGKey(10), x)
    y_ref, _ = mod.apply(v, x)
    vq = quantize_variables(
        v, min_elems=0,
        predicate=lambda p, l: p.endswith(("expert_w1", "expert_w2")))
    n, _ = count_quantized(vq)
    assert n == 2
    y, _ = mod.apply(vq, x)
    assert _rel(y, y_ref) < 0.05


def test_moe_layer_int8_forces_slot_path():
    """dispatch_mode='ragged' must still work with int8 weights (the int8
    branch reroutes to the slot einsum pair — lax.ragged_dot is float-only)."""
    N, D, F, E = 32, 16, 32, 4
    x = jax.random.normal(jax.random.PRNGKey(11), (N, D))
    mod = MoELayer(num_experts=E, topk=2, model_dim=D, hidden_dim=F,
                   gate_type="linear_top", dispatch_mode="ragged")
    v = mod.init(jax.random.PRNGKey(12), x)
    y_ref, _ = mod.apply(v, x)
    vq = quantize_variables(
        v, min_elems=0,
        predicate=lambda p, l: p.endswith(("expert_w1", "expert_w2")))
    y, _ = mod.apply(vq, x)
    assert np.isfinite(np.asarray(y)).all()
    assert _rel(y, y_ref) < 0.05


@pytest.fixture(scope="module")
def tiny_arch_and_vars():
    from motioncraft_tpu.apis import make_text_batch, tiny_t2m_cfg
    from motioncraft_tpu.registry import build_architecture

    arch = build_architecture(tiny_t2m_cfg(max_seq_len=16))
    batch = make_text_batch(["a person walks", "a person jumps"], max_seq_len=16)
    v = arch.init(jax.random.PRNGKey(0), batch)
    # perturb away from the zero-init output heads so the comparison is
    # non-trivial (a zero-output denoiser would match at any precision)
    leaves, treedef = jax.tree_util.tree_flatten(v)
    ks = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [l + 0.03 * jax.random.normal(k, l.shape, l.dtype)
              if jnp.issubdtype(l.dtype, jnp.floating) else l
              for l, k in zip(leaves, ks)]
    return arch, batch, jax.tree_util.tree_unflatten(treedef, leaves)


def test_quantize_variables_selection(tiny_arch_and_vars):
    arch, batch, v = tiny_arch_and_vars
    vq = quantize_variables(v, min_elems=0)
    n, elems = count_quantized(vq)
    assert n >= 40  # per-layer: moe experts+proj, qkv, stylization, sffn
    flat = jax.tree_util.tree_flatten_with_path(vq["params"])[0]
    for path, leaf in flat:
        p = "/" + "/".join(str(getattr(k, "key", k)) for k in path)
        if "text_enc" in p or "/gate/" in p:
            assert leaf.dtype != jnp.int8, p
    # idempotent + input untouched
    n2, _ = count_quantized(quantize_variables(vq, min_elems=0))
    assert n2 == n
    assert count_quantized(v)[0] == 0


def test_quantize_excludes_gnn_scope():
    """pose_encoder_cfg.body_graph=True mounts an STGCN at /joint_embed/gnn
    whose plain nn.Dense layers are NOT int8-aware — the default filter must
    skip everything under /gnn/ while still taking the direct PoseEncoder
    kernels."""
    big = jnp.ones((64, 64), jnp.float32)
    v = {"params": {"model": {"joint_embed": {
        "joint_0": {"kernel": big, "bias": jnp.zeros((64,))},
        "gnn": {"block_0": {"conv": {"kernel": big}}},
    }}}}
    vq = quantize_variables(v, min_elems=0)
    p = vq["params"]["model"]["joint_embed"]
    assert p["joint_0"]["kernel"].dtype == jnp.int8
    assert p["gnn"]["block_0"]["conv"]["kernel"].dtype == jnp.float32


def test_quantize_widening_pass_merges_scales():
    """A second, wider quantize_variables pass must keep the first pass's
    scales (the 'quant' collection merges, not overwrites)."""
    big = jnp.ones((32, 32), jnp.float32) * 0.5
    v = {"params": {"model": {
        "ffn": {"linear1": {"kernel": big}},
        "other": {"dense": {"kernel": big * 2}},
    }}}
    v1 = quantize_variables(v, min_elems=0)  # default include: only /ffn/
    assert count_quantized(v1)[0] == 1
    v2 = quantize_variables(v1, min_elems=0,
                            predicate=lambda p, l: "/other/" in p)
    assert count_quantized(v2)[0] == 2
    q = v2["quant"]["model"]
    assert "kernel_scale" in q["ffn"]["linear1"]   # pass-1 scale survived
    assert "kernel_scale" in q["other"]["dense"]


def test_stmogen_int8_forward_and_sample(tiny_arch_and_vars):
    arch, batch, v = tiny_arch_and_vars
    vq = quantize_variables(v, min_elems=0)
    xf = arch.encode_text(v, batch["text_ids"])
    t = jnp.full((2,), 500, jnp.int32)
    m = jax.random.normal(jax.random.PRNGKey(2), batch["motion"].shape)

    def fwd(vv):
        return arch.model.apply(vv, m, t, motion_mask=batch["motion_mask"],
                                motion_length=batch["motion_length"],
                                xf_out=xf, mode="test")

    y_f, y_q = fwd(v), fwd(vq)
    assert _rel(y_q, y_f) < 0.08
    cos = float(jnp.vdot(y_f.ravel(), y_q.ravel())
                / (jnp.linalg.norm(y_f) * jnp.linalg.norm(y_q)))
    assert cos > 0.995

    s_f = arch.sample(v, batch, jax.random.PRNGKey(3))
    s_q = arch.sample(vq, batch, jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(s_q)).all()
    assert _rel(s_q, s_f) < 0.05  # full DDIM chain stays on the float track


def test_quantize_after_bf16_cast(tiny_arch_and_vars):
    from motioncraft_tpu.apis import bf16_cast_variables
    arch, batch, v = tiny_arch_and_vars
    vq = quantize_variables(bf16_cast_variables(v), min_elems=0)
    n, _ = count_quantized(vq)
    assert n >= 40
    # scales stay f32 even when weights were bf16
    for leaf in jax.tree_util.tree_leaves(vq["quant"]):
        assert leaf.dtype == jnp.float32
    s = arch.sample(vq, batch, jax.random.PRNGKey(4),
                    compute_dtype=jnp.bfloat16)
    assert np.isfinite(np.asarray(s, np.float32)).all()


# ---- W8 weight-only mode (round 4): same int8 storage, scales recorded as
# <name>_wscale, consumers dequantize into the float dots (no activation
# quantization; error is weight rounding only, strictly below W8A8's) ------


def test_qdense_weight_only_exact_dequant():
    """W8 QDense == nn.Dense on the dequantized weight, bit for bit."""
    x = jax.random.normal(jax.random.PRNGKey(20), (6, 80))
    q = QDense(56)
    v = q.init(jax.random.PRNGKey(21), x)
    wq, s = quantize_weight(v["params"]["kernel"], 0)
    vw = {"params": {"kernel": wq, "bias": v["params"]["bias"]},
          "quant": {"kernel_wscale": s}}
    y_w = q.apply(vw, x)
    wdq = (wq.astype(jnp.float32) * s).astype(x.dtype)
    y_ref = q.apply({"params": {"kernel": wdq, "bias": v["params"]["bias"]}}, x)
    assert np.array_equal(np.asarray(y_w), np.asarray(y_ref))
    # bf16 activations stay bf16
    assert q.apply(vw, x.astype(jnp.bfloat16)).dtype == jnp.bfloat16


def test_qdense_weight_only_beats_w8a8():
    """No activation quantization -> W8 error is below the W8A8 error."""
    x = jax.random.normal(jax.random.PRNGKey(22), (16, 96))
    q = QDense(64, use_bias=False)
    v = q.init(jax.random.PRNGKey(23), x)
    y_f = q.apply(v, x)
    wq, s = quantize_weight(v["params"]["kernel"], 0)
    y_w8 = q.apply({"params": {"kernel": wq}, "quant": {"kernel_wscale": s}}, x)
    y_a8 = q.apply({"params": {"kernel": wq}, "quant": {"kernel_scale": s}}, x)
    assert _rel(y_w8, y_f) < 0.01
    assert _rel(y_w8, y_f) <= _rel(y_a8, y_f) + 1e-6


def test_quantize_variables_weight_only_leaf_names():
    big = jnp.ones((32, 32), jnp.float32) * 0.5
    v = {"params": {"model": {"ffn": {"linear1": {"kernel": big}}}}}
    vw = quantize_variables(v, min_elems=0, weight_only=True)
    q = vw["quant"]["model"]["ffn"]["linear1"]
    assert "kernel_wscale" in q and "kernel_scale" not in q
    assert vw["params"]["model"]["ffn"]["linear1"]["kernel"].dtype == jnp.int8


def test_sffn_weight_only_matches_float():
    B, T, H, d, f = 2, 7, 4, 16, 32
    x = jax.random.normal(jax.random.PRNGKey(24), (B, T, H * d))
    emb = jax.random.normal(jax.random.PRNGKey(25), (B, 64))
    mod = SFFN(latent_dim=d, ffn_dim=f, num_heads=H, time_embed_dim=64)
    v = mod.init(jax.random.PRNGKey(26), x, emb)
    y_ref = mod.apply(v, x, emb)
    vw = quantize_variables(v, min_elems=0, weight_only=True,
                            predicate=lambda p, l: p.endswith(("/w1", "/w2")))
    assert count_quantized(vw)[0] == 2
    assert _rel(mod.apply(vw, x, emb), y_ref) < 0.02


def test_moe_weight_only_keeps_ragged_path():
    """Unlike W8A8 (slot-path reroute), weight-only dequantizes into the
    normal float dispatch — ragged mode must run and match the float ref."""
    N, D, F, E = 32, 16, 32, 4
    x = jax.random.normal(jax.random.PRNGKey(27), (N, D))
    mod = MoELayer(num_experts=E, topk=2, model_dim=D, hidden_dim=F,
                   gate_type="linear_top", dispatch_mode="ragged")
    v = mod.init(jax.random.PRNGKey(28), x)
    y_ref, _ = mod.apply(v, x)
    vw = quantize_variables(
        v, min_elems=0, weight_only=True,
        predicate=lambda p, l: p.endswith(("expert_w1", "expert_w2")))
    y, _ = mod.apply(vw, x)
    assert np.isfinite(np.asarray(y)).all()
    assert _rel(y, y_ref) < 0.02


def test_stmogen_weight_only_forward_and_sample(tiny_arch_and_vars):
    arch, batch, v = tiny_arch_and_vars
    vw = quantize_variables(v, min_elems=0, weight_only=True)
    assert count_quantized(vw)[0] >= 40
    xf = arch.encode_text(v, batch["text_ids"])
    t = jnp.full((2,), 500, jnp.int32)
    m = jax.random.normal(jax.random.PRNGKey(29), batch["motion"].shape)

    def fwd(vv):
        return arch.model.apply(vv, m, t, motion_mask=batch["motion_mask"],
                                motion_length=batch["motion_length"],
                                xf_out=xf, mode="test")

    y_f, y_w = fwd(v), fwd(vw)
    # tighter than the W8A8 bounds in test_stmogen_int8_forward_and_sample:
    # weight rounding is the only error source
    assert _rel(y_w, y_f) < 0.03
    s_f = arch.sample(v, batch, jax.random.PRNGKey(30))
    s_w = arch.sample(vw, batch, jax.random.PRNGKey(30))
    assert np.isfinite(np.asarray(s_w)).all()
    assert _rel(s_w, s_f) < 0.02


def test_weight_only_composes_with_step_cache(tiny_arch_and_vars):
    """The two serving levers stack: W8 weights only change the dots, so the
    step-cache residual replay path must run unchanged on top."""
    from motioncraft_tpu.diffusion import StepCacheConfig
    arch, batch, v = tiny_arch_and_vars
    vw = quantize_variables(v, min_elems=0, weight_only=True)
    s_exact = arch.sample(vw, batch, jax.random.PRNGKey(31))
    s_cached = arch.sample(vw, batch, jax.random.PRNGKey(31),
                           step_cache=StepCacheConfig(reuse_every=2))
    assert np.isfinite(np.asarray(s_cached)).all()
    # cached-on-quantized stays in the same neighbourhood as exact-quantized
    assert _rel(s_cached, s_exact) < 0.35
