"""Shared neural blocks (flax.linen).

TPU-native re-implementations of the reference building blocks:
  - StylizationBlock: AdaLN-style time conditioning, zero-init out
    (/root/reference/mogen/models/utils/stylization_block.py:14-40)
  - timestep_embedding (/root/reference/mogen/models/utils/position_encoding.py:42-60)
  - FFN / SFFN (diffusion_transformer.py:15-28, stmogen.py:581-607) — SFFN's
    per-head ModuleList python loop becomes one batched einsum over a
    [heads, d, ffn] weight so the MXU sees a single large contraction.
  - PatchEmbed1D / WavEncoder (blocks.py:53-114)
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# read ONCE at import (trace-time env reads in a forward are a cache-key
# hazard); MOTIONCRAFT_PALLAS_SFFN: "0" disables, "1" forces (interpreted
# off-TPU for tests)
_ENV_SFFN = os.environ.get("MOTIONCRAFT_PALLAS_SFFN")


def _use_pallas_sffn(train: bool, n_rows: int, d: int, f: int) -> bool:
    """Fused per-head FFN kernel at inference on TPU, above a row floor
    (a fresh Mosaic compile costs minutes on remote-AOT runtimes) and only
    at lane-aligned head dims."""
    from ..ops.kernel_gate import pallas_disabled
    if train or _ENV_SFFN == "0" or pallas_disabled():
        return False
    if d % 128 or f % 128:
        return False
    from ..ops.pallas_sffn import BLOCK_N
    if n_rows < 8 * BLOCK_N:
        return False
    return _ENV_SFFN == "1" or jax.default_backend() == "tpu"

# torch-parity LayerNorm: the reference is torch nn.LayerNorm (eps=1e-5);
# flax's default 1e-6 is a small systematic numeric difference that
# checkpoint-conversion parity tests can see.  All model LNs use this.
import functools as _functools
LayerNorm = _functools.partial(nn.LayerNorm, epsilon=1e-5)

zeros_init = nn.initializers.zeros
normal_init = nn.initializers.normal(stddev=1.0)


class QDense(nn.Dense):
    """nn.Dense that runs an int8 path when its kernel has been rewritten to
    int8 by ``ops.quant.quantize_variables``: W8A8 (dynamic activation quant
    onto the int8 MXU) when the scale leaf is ``kernel_scale``, or W8
    weight-only (int8 weights dequantized into the float dot — the scale
    leaf is ``kernel_wscale``).  Bit-identical to nn.Dense for float
    kernels; used at every denoiser hot-path call site so inference weights
    can be served quantized (see ops/quant.py)."""

    @nn.compact
    def __call__(self, inputs):
        kernel = self.param("kernel", self.kernel_init,
                            (jnp.shape(inputs)[-1], self.features),
                            self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        if kernel.dtype == jnp.int8:
            if self.has_variable("quant", "kernel_wscale"):
                # weight-only: dequant fuses into the dot's operand read.
                # Like the W8A8 branch, the output keeps the activation
                # dtype (an f32 bias must not promote bf16 activations).
                from ..ops.quant import dequant
                kernel = dequant(kernel,
                                 self.get_variable("quant", "kernel_wscale"),
                                 self.dtype or inputs.dtype)
                # promote like the float path: if dtype= ever differs from
                # the activation dtype, the dot must not see mixed operands
                inputs = inputs.astype(kernel.dtype)
                y = jax.lax.dot_general(
                    inputs, kernel, (((inputs.ndim - 1,), (0,)), ((), ())),
                    precision=self.precision)
                return y + bias.astype(y.dtype) if bias is not None else y
            from ..ops.quant import qdot
            scale = self.get_variable("quant", "kernel_scale")
            y = qdot(inputs, kernel, scale)
            return y + bias.astype(y.dtype) if bias is not None else y
        inputs, kernel, bias = nn.dtypes.promote_dtype(
            inputs, kernel, bias, dtype=self.dtype)
        y = jax.lax.dot_general(inputs, kernel,
                                (((inputs.ndim - 1,), (0,)), ((), ())),
                                precision=self.precision)
        if bias is not None:
            y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        return y


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding; cos first then sin, as the reference."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


class ZeroDense(nn.Module):
    """Dense with zero-initialised kernel and bias (zero_module semantics)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return QDense(self.features, kernel_init=zeros_init, bias_init=zeros_init,
                        name="linear")(x)


class StylizationBlock(nn.Module):
    """AdaLN conditioning: time-emb -> (scale, shift); zero-init output proj."""

    latent_dim: int
    time_embed_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, h, emb, train: bool = False):
        # emb: [B, time_embed_dim] -> [B, 1, 2*latent]
        emb_out = QDense(2 * self.latent_dim, name="emb_layers")(nn.silu(emb))[:, None, :]
        scale, shift = jnp.split(emb_out, 2, axis=-1)
        h = LayerNorm(name="norm")(h).astype(h.dtype) * (1 + scale) + shift
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = ZeroDense(self.latent_dim, name="out_layers")(h)
        return h


class FFN(nn.Module):
    """Two-layer GELU FFN with zero-init second linear + stylized residual."""

    latent_dim: int
    ffn_dim: int
    dropout: float = 0.0
    time_embed_dim: int = 2048

    @nn.compact
    def __call__(self, x, emb, train: bool = False, **kwargs):
        y = QDense(self.ffn_dim, name="linear1")(x)
        y = nn.Dropout(self.dropout)(nn.gelu(y, approximate=False), deterministic=not train)
        y = ZeroDense(self.latent_dim, name="linear2")(y)
        y = x + StylizationBlock(self.latent_dim, self.time_embed_dim, self.dropout,
                                 name="proj_out")(y, emb, train=train)
        return y


class SFFN(nn.Module):
    """Per-body-part (per-head) FFN over the concatenated head layout.

    The reference loops a ModuleList of per-head Linears (stmogen.py:596-607);
    here both layers are single einsums over a stacked [H, d, f] weight, which
    maps to one MXU matmul instead of H small ones.
    """

    latent_dim: int  # per-head dim
    ffn_dim: int
    num_heads: int
    dropout: float = 0.0
    time_embed_dim: int = 2048

    @nn.compact
    def __call__(self, x, emb, train: bool = False, **kwargs):
        B, T, D = x.shape
        H, d, f = self.num_heads, self.latent_dim, self.ffn_dim
        xh = x.reshape(B, T, H, d)
        w1 = self.param("w1", nn.initializers.lecun_normal(), (H, d, f))
        b1 = self.param("b1", zeros_init, (H, f))
        w2 = self.param("w2", nn.initializers.lecun_normal(), (H, f, d))
        b2 = self.param("b2", zeros_init, (H, d))
        if w1.dtype == jnp.int8 and self.has_variable("quant", "w1_wscale"):
            # W8 weight-only (ops/quant.py).  On the plain-einsum path the
            # convert+scale fuses into the contraction's operand read (HBM
            # streams int8 bytes); when the Pallas head_ffn branch below is
            # taken, the custom call materializes the dequantized weights
            # first, so the HBM-savings claim does NOT hold there — the
            # measured int8w wins come from the QDense layers either way.
            from ..ops.quant import dequant
            w1 = dequant(w1, self.get_variable("quant", "w1_wscale"), x.dtype)
            w2 = dequant(w2, self.get_variable("quant", "w2_wscale"), x.dtype)
        if w1.dtype == jnp.int8:
            # quantized serving path (ops/quant.py): per-(head, out-channel)
            # weight scales, dynamic per-row activation scales, int8 MXU dots
            from ..ops.quant import qeinsum
            # scales stored [H, 1, out]; squeeze the contraction axis so they
            # broadcast against the [B, T, H, out] einsum output
            s1 = self.get_variable("quant", "w1_scale").squeeze(1)  # [H, f]
            s2 = self.get_variable("quant", "w2_scale").squeeze(1)  # [H, d]
            y = qeinsum("bthd,hdf->bthf", xh, w1, s1) + b1.astype(x.dtype)
            y = nn.gelu(y, approximate=False)
            y = qeinsum("bthf,hfd->bthd", y, w2, s2) + b2.astype(x.dtype)
            y = y.reshape(B, T, D)
        elif _use_pallas_sffn(train, B * T, d, f):
            # fused block-diagonal kernel: hidden stays in VMEM instead of a
            # [B, T, H, f] HBM round trip (see ops/pallas_sffn.py)
            from ..ops.pallas_sffn import head_ffn
            # forced-on via MOTIONCRAFT_PALLAS_SFFN=1 off-TPU -> interpreter
            # (Mosaic can't lower on CPU; tests exercise the kernel this way)
            y = head_ffn(x.reshape(B * T, D), w1, b1, w2, b2,
                         interpret=jax.default_backend() != "tpu"
                         ).reshape(B, T, D)
        else:
            y = jnp.einsum("bthd,hdf->bthf", xh, w1) + b1
            y = nn.Dropout(self.dropout)(nn.gelu(y, approximate=False),
                                         deterministic=not train)
            y = jnp.einsum("bthf,hfd->bthd", y, w2) + b2
            y = y.reshape(B, T, D)
        y = x + StylizationBlock(D, self.time_embed_dim, self.dropout,
                                 name="proj_out")(y, emb, train=train)
        return y


class PatchEmbed1D(nn.Module):
    """Temporal patchify: Conv1d(kernel=stride=patch) over [B, T, C]."""

    patch_size: int
    embed_dim: int
    use_norm: bool = False

    @nn.compact
    def __call__(self, x):
        T = x.shape[1]
        pad = (-T) % self.patch_size
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        x = nn.Conv(self.embed_dim, kernel_size=(self.patch_size,),
                    strides=(self.patch_size,), padding="VALID", name="proj")(x)
        if self.use_norm:
            x = LayerNorm(name="norm")(x).astype(x.dtype)
        return x


def unpatchify(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, N_t, T_p*C] -> [B, N_t*T_p, C] (stmogen.py:120-139)."""
    B, Nt, DC = x.shape
    return x.reshape(B, Nt * patch_size, DC // patch_size)


class ConvBasicBlock1D(nn.Module):
    """Residual conv block used by WavEncoder (reference blocks.py:11-51)."""

    planes: int
    ker_size: int = 15
    stride: int = 1
    pad: int = 0
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, L, C]
        shortcut = x
        y = nn.Conv(self.planes, kernel_size=(self.ker_size,), strides=(self.stride,),
                    padding=[(self.pad, self.pad)], name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.leaky_relu(y, negative_slope=0.01)
        y = nn.Conv(self.planes, kernel_size=(self.ker_size,), strides=(1,),
                    padding=[(self.ker_size // 2, self.ker_size // 2)], name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        if self.downsample:
            shortcut = nn.Conv(self.planes, kernel_size=(self.ker_size,),
                               strides=(self.stride,), padding=[(self.pad, self.pad)],
                               name="down_conv")(shortcut)
            shortcut = nn.BatchNorm(use_running_average=not train, name="down_bn")(shortcut)
        y = y + shortcut
        return nn.leaky_relu(y, negative_slope=0.01)


class WavEncoder(nn.Module):
    """Raw-audio conv encoder: 16 kHz samples -> ~30 fps features
    (reference blocks.py:53-71; stride chain 5*6*6*3=540 ≈ 16000/30)."""

    out_dim: int
    audio_in: int = 1

    @nn.compact
    def __call__(self, wav, train: bool = False):
        # wav: [B, L] or [B, L, C]
        if wav.ndim == 2:
            wav = wav[:, :, None]
        d = self.out_dim
        x = ConvBasicBlock1D(d // 4, 15, 5, pad=1600, downsample=True, name="block0")(wav, train)
        x = ConvBasicBlock1D(d // 4, 15, 6, pad=0, downsample=True, name="block1")(x, train)
        x = ConvBasicBlock1D(d // 4, 15, 1, pad=7, name="block2")(x, train)
        x = ConvBasicBlock1D(d // 2, 15, 6, pad=0, downsample=True, name="block3")(x, train)
        x = ConvBasicBlock1D(d // 2, 15, 1, pad=7, name="block4")(x, train)
        x = ConvBasicBlock1D(d, 15, 3, pad=0, downsample=True, name="block5")(x, train)
        return x
