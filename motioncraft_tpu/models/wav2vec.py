"""Native flax Wav2Vec2 audio encoder.

The reference's vendored EMAGE stack wraps HuggingFace Wav2Vec2 for audio
features (EMAGE_2024/models/utils/wav2vec.py:72-146: conv feature extractor
-> 49 fps linear interpolation to the motion frame rate -> feature
projection -> transformer encoder), and the ControlNet ConditionEncoder
schema reserves ``condition_pre_encode_type`` for wav2vec-family
pre-encoding (reference controlnet.py:90-105 implements only 'wav' and
raises otherwise).  This module implements the full Wav2Vec2 topology
natively in flax — same precedent as the native CLIP text tower
(models/text_encoder.py) and native DistilBERT (eval/models.py) — with a
torch-checkpoint converter in utils/torch_convert.py (parity ≤1e-4,
tests/test_wav2vec.py).

Inference semantics only (the condition path never trains the audio tower;
EMAGE freezes it too): no spec-augment masking, no dropout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..registry import SUBMODULES


def linear_interpolate(x: jnp.ndarray, output_len: int) -> jnp.ndarray:
    """[B, T, C] -> [B, output_len, C], torch F.interpolate(mode='linear',
    align_corners=True) semantics (EMAGE wav2vec.py:64-70)."""
    T = x.shape[1]
    if T == output_len:
        return x
    if T == 1:
        return jnp.broadcast_to(x, (x.shape[0], output_len, x.shape[2]))
    # Shapes are static under jit, so compute the sample coordinates in
    # float64 on the host (torch computes them in double) and embed them
    # as constants; only the final lerp runs in the array dtype.
    pos = np.arange(output_len, dtype=np.float64) * (T - 1) / (output_len - 1)
    lo_np = np.clip(np.floor(pos).astype(np.int32), 0, T - 2)
    lo = jnp.asarray(lo_np)
    w = jnp.asarray((pos - lo_np)[None, :, None], dtype=x.dtype)
    a = jnp.take(x, lo, axis=1)
    b = jnp.take(x, lo + 1, axis=1)
    return a * (1.0 - w) + b * w


class Wav2Vec2FeatureExtractor(nn.Module):
    """Strided conv stack over the raw 16 kHz waveform ('group' norm layout:
    GroupNorm after conv 0 only — the base-960h architecture)."""

    conv_dim: Sequence[int] = (512,) * 7
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)

    @nn.compact
    def __call__(self, wav):
        x = wav[:, :, None]  # [B, S, 1]
        for i, (c, k, s) in enumerate(zip(self.conv_dim, self.conv_kernel,
                                          self.conv_stride)):
            x = nn.Conv(c, (k,), strides=(s,), padding="VALID", use_bias=False,
                        name=f"conv_{i}")(x)
            if i == 0:
                x = nn.GroupNorm(num_groups=c, epsilon=1e-5, name="group_norm")(x)
            x = nn.gelu(x, approximate=False)
        return x  # [B, T49, conv_dim[-1]]


class Wav2Vec2Attention(nn.Module):
    hidden_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        H = self.num_heads
        hd = D // H
        q = nn.Dense(D, name="q_proj")(x) * (hd ** -0.5)
        k = nn.Dense(D, name="k_proj")(x)
        v = nn.Dense(D, name="v_proj")(x)
        q, k, v = (a.reshape(B, T, H, hd) for a in (q, k, v))
        attn = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", q, k), axis=-1)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, D)
        return nn.Dense(D, name="out_proj")(y)


class Wav2Vec2EncoderLayer(nn.Module):
    """Post-norm transformer layer (do_stable_layer_norm=False, the base
    architecture): x = ln(x + attn(x)); x = final_ln(x + ff(x))."""

    hidden_size: int
    num_heads: int
    intermediate_size: int

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(
            x + Wav2Vec2Attention(self.hidden_size, self.num_heads,
                                  name="attention")(x))
        h = nn.Dense(self.intermediate_size, name="intermediate_dense")(x)
        h = nn.Dense(self.hidden_size, name="output_dense")(
            nn.gelu(h, approximate=False))
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x + h)


class Wav2Vec2Module(nn.Module):
    """Full Wav2Vec2 ('group'-norm base layout): feature extractor ->
    optional EMAGE fps interpolation -> feature projection -> conv
    positional embedding + post-norm encoder stack."""

    conv_dim: Sequence[int] = (512,) * 7
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16

    @nn.compact
    def __call__(self, wav, output_len: Optional[int] = None):
        """wav: [B, samples] raw 16 kHz.  ``output_len``: interpolate the
        ~49 fps conv features to this many frames BEFORE projection (the
        EMAGE alignment to the motion frame count, wav2vec.py:100-101)."""
        x = Wav2Vec2FeatureExtractor(self.conv_dim, self.conv_kernel,
                                     self.conv_stride,
                                     name="feature_extractor")(wav)
        if output_len is not None:
            x = linear_interpolate(x, output_len)
        x = nn.LayerNorm(epsilon=1e-5, name="fp_layer_norm")(x)
        x = nn.Dense(self.hidden_size, name="fp_projection")(x)

        # convolutional positional embedding (grouped, half padding; even
        # kernels emit one extra frame that torch trims on the right)
        pad = self.num_conv_pos_embeddings // 2
        pos = nn.Conv(self.hidden_size, (self.num_conv_pos_embeddings,),
                      padding=[(pad, pad)],
                      feature_group_count=self.num_conv_pos_embedding_groups,
                      name="pos_conv")(x)
        if self.num_conv_pos_embeddings % 2 == 0:
            pos = pos[:, :-1]
        x = x + nn.gelu(pos, approximate=False)
        x = nn.LayerNorm(epsilon=1e-5, name="encoder_layer_norm")(x)
        for i in range(self.num_layers):
            x = Wav2Vec2EncoderLayer(self.hidden_size, self.num_heads,
                                     self.intermediate_size,
                                     name=f"layer_{i}")(x)
        return x  # [B, T, hidden]


class Wav2Vec2Conditioner(nn.Module):
    """ControlNet condition pre-encoder (``condition_pre_encode_type=
    'wav2vec'``): native Wav2Vec2 over the raw-waveform lane, interpolated
    to the motion frame count, projected to the condition latent dim."""

    out_dim: int
    wav2vec_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, c, seq_len: int, train: bool = False):
        # c: [B, samples, F] — lane 0 is the raw/amplitude waveform
        # (data/beat2.py onset+amplitude layout), or [B, samples]
        wav = c[..., 0] if c.ndim == 3 else c
        feats = Wav2Vec2Module(**(self.wav2vec_cfg or {}), name="wav2vec")(
            wav, output_len=seq_len)
        return nn.Dense(self.out_dim, name="proj")(feats)


@SUBMODULES.register_module()
class Wav2Vec2Encoder:
    """Host-side wrapper: 16 kHz waveform -> [B, T', 768] via a PRETRAINED
    HF FlaxWav2Vec2 (weights must be available locally; data-prep use).  The
    in-graph path is Wav2Vec2Module/Wav2Vec2Conditioner above."""

    def __init__(self, modelpath: str = "facebook/wav2vec2-base-960h",
                 local_only: bool = True, layer: Optional[int] = None):
        from transformers import FlaxWav2Vec2Model
        self.layer = layer
        self.model = FlaxWav2Vec2Model.from_pretrained(
            modelpath, local_files_only=local_only)

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        out = self.model(jnp.asarray(wav, jnp.float32),
                         output_hidden_states=self.layer is not None)
        if self.layer is not None:
            return np.asarray(out.hidden_states[self.layer])
        return np.asarray(out.last_hidden_state)
