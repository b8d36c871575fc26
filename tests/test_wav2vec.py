"""Native Wav2Vec2 (models/wav2vec.py) parity vs HF torch Wav2Vec2Model.

Covers the capability the reference vendors via EMAGE
(EMAGE_2024/models/utils/wav2vec.py:72-146): conv feature extractor, 49 fps
linear interpolation, feature projection, conv-positional post-norm encoder —
converted from a torch checkpoint (utils/torch_convert.convert_wav2vec2) to
<=1e-4, plus the ControlNet ``condition_pre_encode_type='wav2vec'`` wiring.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from motioncraft_tpu.models.wav2vec import (Wav2Vec2Module,  # noqa: E402
                                            linear_interpolate)
from motioncraft_tpu.utils.torch_convert import convert_wav2vec2  # noqa: E402

pytestmark = pytest.mark.parity

TINY = dict(conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2)


@pytest.fixture(scope="module")
def torch_model():
    cfg = transformers.Wav2Vec2Config(
        vocab_size=32, hidden_size=TINY["hidden_size"],
        num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"],
        intermediate_size=TINY["intermediate_size"],
        conv_dim=list(TINY["conv_dim"]), conv_kernel=list(TINY["conv_kernel"]),
        conv_stride=list(TINY["conv_stride"]),
        num_conv_pos_embeddings=TINY["num_conv_pos_embeddings"],
        num_conv_pos_embedding_groups=TINY["num_conv_pos_embedding_groups"],
        feat_extract_norm="group", do_stable_layer_norm=False,
        apply_spec_augment=False, hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, activation_dropout=0.0, layerdrop=0.0)
    torch.manual_seed(0)
    model = transformers.Wav2Vec2Model(cfg).eval()
    return model


def _flax_params(torch_model):
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    return {"params": convert_wav2vec2(sd, num_layers=TINY["num_layers"],
                                       num_conv_layers=len(TINY["conv_dim"]))}


def test_forward_parity(torch_model):
    rng = np.random.RandomState(0)
    wav = rng.randn(2, 3200).astype(np.float32)
    with torch.no_grad():
        want = torch_model(torch.from_numpy(wav)).last_hidden_state.numpy()
    mod = Wav2Vec2Module(**TINY)
    got = np.asarray(mod.apply(_flax_params(torch_model), jnp.asarray(wav)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_linear_interpolate_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 49, 8).astype(np.float32)
    for out_len in (15, 49, 100):
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x).transpose(1, 2), size=out_len,
            mode="linear", align_corners=True).transpose(1, 2).numpy()
        got = np.asarray(linear_interpolate(jnp.asarray(x), out_len))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_controlnet_wav2vec_condition_path():
    """ControlT2MHalf with condition_pre_encode_type='wav2vec' runs the full
    test forward (sampling-path denoiser call) with aligned frames."""
    import motioncraft_tpu.models  # noqa: F401
    from motioncraft_tpu.apis import make_text_batch, tiny_t2m_cfg
    from motioncraft_tpu.registry import build_architecture

    base = tiny_t2m_cfg()
    cfg = dict(base)
    cfg["model"] = dict(
        type="ControlT2MHalf", base_model=base["model"], copy_blocks_num=1,
        control_cond_feats=2,
        condition_encode_cfg=dict(dataset_name="beats2",
                                  condition_pre_encode=True,
                                  condition_pre_encode_type="wav2vec",
                                  condition_latent_dim=16,
                                  control_cond_feats=2,
                                  condition_cfg=True,
                                  wav2vec_cfg=TINY))
    arch = build_architecture(cfg)
    T = 16
    batch = make_text_batch(["someone is speaking"], max_seq_len=T)
    rng_np = np.random.RandomState(2)
    batch["c"] = np.asarray(rng_np.randn(1, T * (16000 // 30), 2), np.float32)
    variables = arch.init(jax.random.PRNGKey(0), batch)
    sample = jax.jit(lambda v, b, r: arch.sample(v, b, r))(
        variables, batch, jax.random.PRNGKey(1))
    assert sample.shape == (1, T, 322)
    assert np.isfinite(np.asarray(sample)).all()
