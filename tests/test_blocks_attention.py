"""Tests for shared blocks, MoE, and attention families."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.core import unfreeze

from motioncraft_tpu.models.attentions import (STMA, SAMI, BaseCrossAttention,
                                               BaseMixedAttention, BaseSelfAttention,
                                               EfficientCrossAttention,
                                               EfficientMixedAttention,
                                               EfficientSelfAttention, fold_patch_mask)
from motioncraft_tpu.models.blocks import (FFN, SFFN, PatchEmbed1D, StylizationBlock,
                                           WavEncoder, timestep_embedding, unpatchify)
from motioncraft_tpu.models.moe import MOE, MoELayer


class TestBlocks:
    def test_timestep_embedding_golden(self):
        t = jnp.array([0.0, 17.0, 999.0])
        dim = 8
        got = np.asarray(timestep_embedding(t, dim))
        half = dim // 2
        freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
        args = np.asarray(t)[:, None] * freqs[None]
        want = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
        np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5)

    def test_stylization_block_zero_at_init(self, rng):
        m = StylizationBlock(latent_dim=16, time_embed_dim=32)
        h = jnp.asarray(rng.randn(2, 5, 16), jnp.float32)
        emb = jnp.asarray(rng.randn(2, 32), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), h, emb)
        out = m.apply(params, h, emb)
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_ffn_identity_at_init(self, rng):
        m = FFN(latent_dim=16, ffn_dim=32, time_embed_dim=8)
        x = jnp.asarray(rng.randn(2, 5, 16), jnp.float32)
        emb = jnp.asarray(rng.randn(2, 8), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x, emb)
        np.testing.assert_allclose(np.asarray(m.apply(params, x, emb)), np.asarray(x))

    def test_sffn_residual_and_shape(self, rng):
        m = SFFN(latent_dim=8, ffn_dim=16, num_heads=3, time_embed_dim=8)
        x = jnp.asarray(rng.randn(2, 5, 24), jnp.float32)
        emb = jnp.asarray(rng.randn(2, 8), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x, emb)
        out = m.apply(params, x, emb)
        assert out.shape == x.shape
        # stylization out proj is zero-init -> identity at init
        np.testing.assert_allclose(np.asarray(out), np.asarray(x))

    def test_patch_embed_roundtrip_shapes(self, rng):
        m = PatchEmbed1D(patch_size=4, embed_dim=16)
        x = jnp.asarray(rng.randn(2, 20, 6), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == (2, 5, 16)
        # non-divisible length pads up
        out2 = m.apply(params, x[:, :18])
        assert out2.shape == (2, 5, 16)
        y = unpatchify(jnp.asarray(rng.randn(2, 5, 12), jnp.float32), 4)
        assert y.shape == (2, 20, 3)

    def test_wav_encoder_downsamples_to_30fps(self, rng):
        m = WavEncoder(out_dim=32)
        # 1 second of 16 kHz audio -> ~30 frames
        wav = jnp.asarray(rng.randn(1, 16000), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), wav)
        out = m.apply(params, wav)
        assert out.ndim == 3 and out.shape[-1] == 32
        assert 25 <= out.shape[1] <= 40, out.shape


class TestMoE:
    def test_moe_layer_shapes_and_capacity(self, rng):
        m = MoELayer(num_experts=4, topk=2, model_dim=8, hidden_dim=16, gate_noise=0.0)
        x = jnp.asarray(rng.randn(32, 8), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        y, aux = m.apply(params, x)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()
        assert np.isfinite(float(aux))

    def test_moe_train_with_noise_needs_rng(self, rng):
        m = MoELayer(num_experts=4, topk=2, model_dim=8, hidden_dim=16, gate_noise=1.0)
        x = jnp.asarray(rng.randn(16, 8), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        y, aux = m.apply(params, x, train=True, rngs={"gate_noise": jax.random.PRNGKey(1)},
                         mutable=["losses"])[0] if False else m.apply(
            params, x, train=True, rngs={"gate_noise": jax.random.PRNGKey(1)})
        assert y.shape == x.shape

    def test_moe_capacity_drops_tokens(self, rng):
        """Force all tokens to one expert: most must be dropped (output ~0)."""
        m = MoELayer(num_experts=4, topk=1, model_dim=8, hidden_dim=16,
                     gate_type="top", gate_noise=0.0, capacity_factor=0.5)
        x = jnp.asarray(np.ones((32, 8)), jnp.float32)  # identical tokens
        params = m.init(jax.random.PRNGKey(0), x)
        y, _ = m.apply(params, x)
        # capacity = 1*int(0.5*8)=4 -> 28 of 32 tokens get zero output
        zero_rows = np.sum(np.abs(np.asarray(y)).sum(-1) < 1e-9)
        assert zero_rows == 28, zero_rows

    def test_moe_wrapper_projects(self, rng):
        m = MOE(num_experts=4, topk=2, input_dim=8, ffn_dim=16, output_dim=24,
                num_heads=3, max_seq_len=10, gate_noise=0.0)
        x = jnp.asarray(rng.randn(2, 7, 3, 8), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        y, aux = m.apply(params, x)
        assert y.shape == (2, 7, 3, 24)


def _mk_mask(B, T, valid):
    m = np.zeros((B, T, 1), np.float32)
    m[:, :valid] = 1
    return jnp.asarray(m)


class TestAttention:
    def test_efficient_self_mask_invariance(self, rng):
        """Masked-out frames must not change valid-frame outputs."""
        m = EfficientSelfAttention(latent_dim=16, num_heads=4, time_embed_dim=8)
        x = np.asarray(rng.randn(1, 10, 16), np.float32)
        emb = jnp.asarray(rng.randn(1, 8), jnp.float32)
        mask = _mk_mask(1, 10, 6)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), src_mask=mask, emb=emb)
        out1 = m.apply(params, jnp.asarray(x), src_mask=mask, emb=emb)
        x2 = x.copy()
        x2[:, 6:] = 123.0  # garbage in masked region
        out2 = m.apply(params, jnp.asarray(x2), src_mask=mask, emb=emb)
        np.testing.assert_allclose(np.asarray(out1)[:, :6], np.asarray(out2)[:, :6],
                                   rtol=1e-4, atol=1e-5)

    def test_efficient_cross_cond_dropout_zeroes_text(self, rng):
        m = EfficientCrossAttention(latent_dim=16, text_latent_dim=12, num_heads=4,
                                    time_embed_dim=8)
        x = jnp.asarray(rng.randn(2, 10, 16), jnp.float32)
        xf = jnp.asarray(rng.randn(2, 7, 12), jnp.float32)
        emb = jnp.asarray(rng.randn(2, 8), jnp.float32)
        cond = jnp.zeros((2, 1, 1))  # cond_type % 10 == 0 -> text off
        params = m.init(jax.random.PRNGKey(0), x, xf=xf, emb=emb, cond_type=cond)
        out_off = m.apply(params, x, xf=xf, emb=emb, cond_type=cond)
        out_off2 = m.apply(params, x, xf=xf * 100, emb=emb, cond_type=cond)
        np.testing.assert_allclose(np.asarray(out_off), np.asarray(out_off2), rtol=1e-4,
                                   atol=1e-5)

    def test_base_self_is_softmax_attention(self, rng):
        m = BaseSelfAttention(latent_dim=8, num_heads=2, time_embed_dim=8)
        x = jnp.asarray(rng.randn(1, 5, 8), jnp.float32)
        emb = jnp.asarray(rng.randn(1, 8), jnp.float32)
        mask = _mk_mask(1, 5, 5)
        params = m.init(jax.random.PRNGKey(0), x, emb=emb, src_mask=mask)
        out = m.apply(params, x, emb=emb, src_mask=mask)
        assert out.shape == x.shape

    def test_base_mixed_and_cross_shapes(self, rng):
        for cls in (BaseMixedAttention, BaseCrossAttention, EfficientMixedAttention):
            m = cls(latent_dim=8, text_latent_dim=12, num_heads=2, time_embed_dim=8)
            x = jnp.asarray(rng.randn(2, 5, 8), jnp.float32)
            xf = jnp.asarray(rng.randn(2, 3, 12), jnp.float32)
            emb = jnp.asarray(rng.randn(2, 8), jnp.float32)
            mask = _mk_mask(2, 5, 4)
            cond = jnp.ones((2, 1, 1))
            params = m.init(jax.random.PRNGKey(0), x, xf=xf, emb=emb, src_mask=mask,
                            cond_type=cond)
            out = m.apply(params, x, xf=xf, emb=emb, src_mask=mask, cond_type=cond)
            assert out.shape == x.shape

    def test_fold_patch_mask(self):
        m = jnp.asarray(np.array([1, 1, 1, 1, 1, 1, 1, 0]).reshape(1, 8, 1), jnp.float32)
        folded = fold_patch_mask(m, 4)
        np.testing.assert_array_equal(np.asarray(folded).squeeze(), [1, 0])

    def test_stma_forward_and_aux(self, rng):
        m = STMA(latent_dim=8, text_latent_dim=12, num_heads=3, num_text_heads=1,
                 num_experts=4, topk=2, gate_noise=0.0, ffn_dim=16, time_embed_dim=8,
                 max_seq_len=16, max_text_seq_len=7, temporal_comb=False,
                 dynamic_body=True)
        B, T, D = 2, 10, 24
        x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
        xf = jnp.asarray(rng.randn(B, 7, 12), jnp.float32)
        emb = jnp.asarray(rng.randn(B, 8), jnp.float32)
        mask = _mk_mask(B, T, 8)
        cond = jnp.ones((B, 1, 1))
        ml = jnp.full((B, 1), 8)
        import functools
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x, xf=xf, emb=emb,
                                 src_mask=mask, cond_type=cond, motion_length=ml)
        out = jax.jit(m.apply)(params, x, xf=xf, emb=emb, src_mask=mask,
                               cond_type=cond, motion_length=ml)
        assert out.shape == (B, T, D)
        # train mode sows aux loss
        out, state = jax.jit(functools.partial(m.apply, train=True,
                                               mutable=["losses"]))(
            params, x, xf=xf, emb=emb, src_mask=mask, cond_type=cond,
            motion_length=ml)
        assert "aux_loss" in state["losses"]

    def test_sami_forward_intervals(self, rng):
        m = SAMI(latent_dim=8, text_latent_dim=12, num_heads=3, num_text_heads=1,
                 num_experts=4, topk=2, gate_noise=0.0, ffn_dim=16, time_embed_dim=8,
                 max_seq_len=16, max_text_seq_len=7, temporal_comb=False)
        B, T, D = 4, 10, 24
        x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
        xf = jnp.asarray(rng.randn(B, 7, 12), jnp.float32)
        emb = jnp.asarray(rng.randn(B, 8), jnp.float32)
        mask = _mk_mask(B, T, 10)
        cond = jnp.ones((B, 1, 1))
        ml = jnp.full((B, 1), 10)
        import functools
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x, xf=xf, emb=emb,
                                 src_mask=mask, cond_type=cond, motion_length=ml)
        for ni in (1, 2):
            out = jax.jit(functools.partial(m.apply, num_intervals=ni))(
                params, x, xf=xf, emb=emb, src_mask=mask, cond_type=cond,
                motion_length=ml)
            assert out.shape == (B, T, D) and np.isfinite(np.asarray(out)).all()


def test_moe_positions_pallas_parity():
    """The Pallas scan kernel and the flat XLA cumsum agree exactly."""
    import numpy as np
    from motioncraft_tpu.ops.pallas_moe import _positions_pallas, _positions_xla
    rng = np.random.RandomState(0)
    for M, E, R in ((10000, 16, 2048), (1000, 4, 256)):
        idx = jnp.asarray(rng.randint(0, E, (M,)), jnp.int32)
        want_pos, want_counts = _positions_xla(idx, E)
        got = np.asarray(_positions_pallas(idx, E, block_rows=R, interpret=True))
        assert (got == np.asarray(want_pos)).all()
        assert (np.asarray(want_counts)
                == np.bincount(np.asarray(idx), minlength=E)).all()


def test_fused_expert_ffn_parity():
    """Pallas fused expert FFN == XLA einsum pair (values and custom-vjp grads)."""
    import numpy as np
    from motioncraft_tpu.ops.pallas_ffn import (_ffn_forward, _ffn_reference,
                                                fused_expert_ffn)
    rng = np.random.RandomState(0)
    E, C, D, F = 4, 300, 128, 512
    xe = jnp.asarray(rng.randn(E, C, D), jnp.float32)
    w1 = jnp.asarray(rng.randn(E, D, F) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(E, F) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(E, F, D) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(E, D) * 0.1, jnp.float32)
    got = np.asarray(_ffn_forward(xe, w1, b1, w2, b2, block_c=256, interpret=True))
    want = np.asarray(_ffn_reference(xe, w1, b1, w2, b2))
    np.testing.assert_allclose(got, want, atol=1e-5)
    g = jax.grad(lambda w: fused_expert_ffn(xe, w, b1, w2, b2, True).sum())(w1)
    gr = jax.grad(lambda w: _ffn_reference(xe, w, b1, w2, b2).sum())(w1)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=1e-5)


def test_efficient_self_attention_merged_lanes_parity():
    """merged_lanes computes identical outputs to the head-split path."""
    import numpy as np
    from motioncraft_tpu.models.attentions import EfficientSelfAttention
    rng = np.random.RandomState(0)
    B, T, D, H = 4, 12, 128, 8
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    mask = jnp.asarray((rng.rand(B, T, 1) > 0.2).astype(np.float32))
    split = EfficientSelfAttention(D, H, 0.0, time_embed_dim=None)
    merged = EfficientSelfAttention(D, H, 0.0, time_embed_dim=None, merged_lanes=True)
    p = split.init(jax.random.PRNGKey(0), x, src_mask=mask)
    a = np.asarray(split.apply(p, x, src_mask=mask))
    b = np.asarray(merged.apply(p, x, src_mask=mask))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


def test_moe_ragged_dispatch_parity():
    """The rank-compact ragged_dot dispatch equals the slot-buffer path
    (dispatch_mode is a module attribute, not a trace-time env read)."""
    import numpy as np
    from motioncraft_tpu.models.moe import MoELayer
    rng = np.random.RandomState(0)
    N, D, E, K = 3000, 32, 8, 2
    x = jnp.asarray(rng.randn(N, D), jnp.float32)
    p = MoELayer(E, K, D, D * 2, dispatch_mode="slots").init(jax.random.PRNGKey(0), x)
    y_slots, _ = MoELayer(E, K, D, D * 2, dispatch_mode="slots").apply(p, x)
    y_ragged, _ = MoELayer(E, K, D, D * 2, dispatch_mode="ragged").apply(p, x)
    np.testing.assert_allclose(np.asarray(y_slots), np.asarray(y_ragged),
                               atol=2e-5, rtol=2e-5)


def test_moe_fused_grouped_ffn_parity():
    """Pallas grouped-FFN kernel (interpret mode) == jnp reference, and the
    full ragged_fused dispatch == the slots path."""
    import numpy as np
    from motioncraft_tpu.ops.pallas_moe_ffn import (BLOCK, grouped_ffn,
                                                    grouped_ffn_reference)
    rng = np.random.RandomState(0)
    E, D, HID = 4, 128, 256
    m_pad = 4 * BLOCK
    xs = jnp.asarray(rng.randn(m_pad, D), jnp.float32)
    w1 = jnp.asarray(rng.randn(E, D, HID) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(E, HID) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(E, HID, D) * 0.05, jnp.float32)
    block_expert = jnp.asarray([0, 1, 1, 3], jnp.int32)
    out = grouped_ffn(block_expert, xs, w1, b1, w2, interpret=True)
    ref = grouped_ffn_reference(np.asarray(block_expert), xs, w1, b1, w2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_moe_ragged_fused_dispatch_parity(monkeypatch):
    """ragged_fused end-to-end equals the slot-buffer path (interpret)."""
    import numpy as np
    import jax.experimental.pallas as _pl  # noqa: F401
    from motioncraft_tpu.ops import pallas_moe_ffn
    # force interpret mode on CPU
    orig = pallas_moe_ffn.grouped_ffn
    monkeypatch.setattr(
        pallas_moe_ffn, "grouped_ffn",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    from motioncraft_tpu.models.moe import MoELayer
    rng = np.random.RandomState(0)
    N, D, E, K = 3000, 128, 8, 2
    x = jnp.asarray(rng.randn(N, D), jnp.float32)
    p = MoELayer(E, K, D, D * 2, dispatch_mode="slots").init(jax.random.PRNGKey(0), x)
    y_slots, _ = MoELayer(E, K, D, D * 2, dispatch_mode="slots").apply(p, x)
    y_fused, _ = MoELayer(E, K, D, D * 2, dispatch_mode="ragged_fused").apply(p, x)
    np.testing.assert_allclose(np.asarray(y_slots), np.asarray(y_fused),
                               atol=3e-5, rtol=3e-5)


def test_sffn_head_ffn_kernel_parity():
    """Pallas per-head FFN kernel (interpret) == jnp einsum reference,
    including the non-BLOCK-aligned row tail."""
    import numpy as np
    from motioncraft_tpu.ops.pallas_sffn import (head_ffn, head_ffn_reference)
    rng = np.random.RandomState(0)
    H, d, f = 3, 128, 256
    for n in (512, 700):  # aligned and padded row counts
        x = jnp.asarray(rng.randn(n, H * d), jnp.float32)
        w1 = jnp.asarray(rng.randn(H, d, f) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.randn(H, f) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.randn(H, f, d) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.randn(H, d) * 0.1, jnp.float32)
        out = head_ffn(x, w1, b1, w2, b2, interpret=True)
        ref = head_ffn_reference(x, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)


def test_stma_linear_attention_kernel_parity():
    """Fused STMA attention kernel (interpret) == the XLA concat/softmax
    reference, with partial masks and both CFG halves (text on/off)."""
    import numpy as np
    from motioncraft_tpu.ops.pallas_stma_attention import (
        stma_linear_attention, stma_linear_attention_reference)
    rng = np.random.RandomState(0)
    B, T, H, d, TXT = 4, 21, 3, 128, 7
    motion_feat = jnp.asarray(rng.randn(B, T, H, 4 * d), jnp.float32)
    text_feat = jnp.asarray(rng.randn(B, TXT, 2 * d), jnp.float32)
    mask = np.ones((B, T, 1), np.float32)
    mask[1, 10:] = 0
    mask[3, 4:] = 0
    tcond = np.array([1, 1, 0, 0], np.float32).reshape(B, 1, 1)
    out = stma_linear_attention(motion_feat, text_feat, jnp.asarray(mask),
                                jnp.asarray(tcond), interpret=True)
    ref = stma_linear_attention_reference(motion_feat, text_feat,
                                          jnp.asarray(mask), jnp.asarray(tcond))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow  # opt-in (non-default) kernel, interpret-mode Pallas is slow on CPU
def test_stma_module_kernel_parity(monkeypatch):
    """STMA with the fused attention kernel (forced, interpreted) equals the
    XLA concat path end-to-end."""
    import numpy as np
    from motioncraft_tpu.models import attentions
    from motioncraft_tpu.ops import pallas_stma_attention as psa
    B, T, H, L = 2, 9, 3, 128
    stma = STMA(latent_dim=L, text_latent_dim=32, num_heads=H, num_text_heads=1,
                num_experts=4, topk=2, gate_noise=0.0, ffn_dim=32,
                time_embed_dim=16, max_seq_len=T, max_text_seq_len=5,
                dropout=0.0, dynamic_body=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, H * L), jnp.float32)
    xf = jnp.asarray(rng.randn(B, 5, 32), jnp.float32)
    emb = jnp.asarray(rng.randn(B, 16), jnp.float32)
    mask = jnp.asarray(np.concatenate([np.ones((B, 6, 1)), np.zeros((B, 3, 1))], 1),
                       jnp.float32)
    cond = jnp.asarray(np.array([1.0, 0.0]).reshape(B, 1, 1))
    params = stma.init(jax.random.PRNGKey(0), x, xf=xf, emb=emb, src_mask=mask,
                       cond_type=cond)
    y_xla = stma.apply(params, x, xf=xf, emb=emb, src_mask=mask, cond_type=cond)
    monkeypatch.setattr(attentions, "_ENV_STMA_KERNEL", "1")
    orig = psa.stma_linear_attention
    monkeypatch.setattr(psa, "stma_linear_attention",
                        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    y_fused = stma.apply(params, x, xf=xf, emb=emb, src_mask=mask, cond_type=cond)
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_fused),
                               atol=3e-5, rtol=3e-5)
