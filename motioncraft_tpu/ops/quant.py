"""Int8 weight quantization (W8A8 dynamic and W8 weight-only) for inference.

Motivation (FIDELITY.md round-3 perf notes): the long-form S2G/M2D protocol
runs the CFG denoiser at tiny batches (B=2 rows per window step), where the
forward is WEIGHT-STREAMING bound — every DDIM step re-reads the full decoder
parameter set from HBM.  Storing the big matmul weights as int8 halves those
bytes, and the int8 x int8 -> int32 `dot_general` maps to the TPU MXU's
native int8 path (2x the bf16 peak on v5e), so the large-batch T2M path is
not hurt either.

Two compute modes over the SAME int8 storage:

- **W8A8 dynamic** (``weight_only=False``, the round-3 path): symmetric
  per-output-channel weight scales (computed once, offline, by
  `quantize_variables`) + symmetric per-row dynamic activation scales
  (computed inside the forward).  Accumulation in int32, rescale in f32,
  output in the activation dtype.  The standard W8A8-dynamic recipe; no
  calibration data needed.  Measured round 4: the per-row activation
  quantize/dequant is VPU work on every dot's critical path and LOSES
  throughput at this model's shapes (FIDELITY.md round-4 table).
- **W8 weight-only** (``weight_only=True``): weights stay int8 in HBM and
  are dequantized to the activation dtype on the fly (`dequant`), feeding
  the NORMAL float dot — no activation quantization at all.  The int8→bf16
  convert-and-scale is a pure elementwise producer XLA fuses into the
  matmul's operand read, so the weight-streaming-bound B=2 long-form floor
  sees ~half the HBM weight bytes with zero extra critical-path work, and
  the quantization error is weight rounding only (strictly smaller than
  W8A8's).  Caveat: when SFFN takes the Pallas head_ffn path on TPU, the
  custom call materializes the dequantized stacked weights first, so the
  fused-read HBM saving does not apply to that one op (the measured int8w
  wins come from the QDense layers).  The mode is encoded STRUCTURALLY: scales are recorded under the
  leaf name ``<name>_wscale`` (vs ``<name>_scale``), so consumers pick the
  branch via ``has_variable`` — a trace-time-static decision.

The reference has no quantized path (pure fp torch); this is a TPU-native
serving feature beyond parity.  It is opt-in: `quantize_variables` rewrites
eligible weights in the params tree to int8 and records their scales in a
parallel 'quant' collection; `QDense` / `MoELayer` / `SFFN` sniff the kernel
dtype at trace time and switch to the int8 compute path.  Checkpoints,
converters, and training are untouched (quantize AFTER loading/casting).
"""

from __future__ import annotations

import re
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

# Leaf names of stacked (3-D) weights that have a bespoke int8 branch in
# their owning module (MoELayer expert FFN, SFFN per-head FFN).  The
# contraction axis for each is axis 1 ([G, d_in, d_out] layout).
_STACKED_LEAVES = ("expert_w1", "expert_w2", "w1", "w2")

# Default path filter for `quantize_variables`: every scope here has been
# audited to read its weights through an int8-aware module (QDense /
# MoELayer / SFFN).  Quantizing a weight that a plain nn.Dense consumes
# would silently compute with UNSCALED int values, so the default is a
# conservative allow-list of the STMoGen/ControlNet denoiser hot path; pass
# `include=` to widen it deliberately.
_DEFAULT_INCLUDE = re.compile(
    r"(/ca_block/|/sa_block/|/ffn/|/time_embed|/joint_embed|/out/"
    r"|/before_proj|/after_proj)")
# never quantize: gate projections (routing quality, fp32 by design), the
# CLIP/finetune text encoder (runs once per batch/window, not per DDIM
# step), the STGCN body-graph stack (mounted at /joint_embed/gnn when
# pose_encoder_cfg.body_graph=True — its plain nn.Dense layers are NOT
# int8-aware), and normalization-adjacent 1-D params (ndim checks).
_DEFAULT_EXCLUDE = re.compile(r"(/gate/|/text_enc|/clip|/wav_enc|/gnn/)")


def quantize_weight(w: jnp.ndarray, contract_axis: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization.

    Returns (w_int8, scale) where ``w ≈ w_int8 * scale`` and ``scale``
    has ``w``'s rank with the contraction axis reduced to 1 (broadcasts
    against the int32 accumulator after the matmul).
    """
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=contract_axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def _quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric per-row (last-axis) activation quantization."""
    x32 = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    ax = jnp.maximum(ax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x32 / ax), -127, 127).astype(jnp.int8)
    return xq, ax


def dequant(wq: jnp.ndarray, wscale: jnp.ndarray, dtype) -> jnp.ndarray:
    """Weight-only dequantization: ``wq * wscale`` cast to the activation
    dtype.  A pure elementwise producer — under jit XLA fuses it into the
    consuming matmul's operand read, so the weight array crossing HBM stays
    int8 (half the bytes of bf16)."""
    return (wq.astype(jnp.float32) * wscale).astype(dtype)


def qdot(x: jnp.ndarray, wq: jnp.ndarray, wscale: jnp.ndarray) -> jnp.ndarray:
    """``x @ dequant(wq)`` via the int8 MXU path.

    x: [..., K] float; wq: [K, N] int8; wscale: [1, N] (or [N]) f32.
    """
    xq, ax = _quantize_rows(x)
    acc = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * ax * wscale.reshape(-1)).astype(x.dtype)


def qeinsum(eq: str, x: jnp.ndarray, wq: jnp.ndarray,
            wscale: jnp.ndarray) -> jnp.ndarray:
    """Quantized einsum for the stacked-FFN layouts ('bthd,hdf->bthf',
    'ecd,edf->ecf', ...).  The contraction axis of ``x`` must be its last
    axis and ``wscale`` must broadcast against the einsum output."""
    xq, ax = _quantize_rows(x)
    acc = jnp.einsum(eq, xq, wq, preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * ax * wscale).astype(x.dtype)


def expert_ffn_q(xe, w1q, s1, b1, w2q, s2, b2):
    """Int8 slot-buffer expert FFN: [E, C, D] -> [E, C, D].

    s1/s2 are the per-(expert, out-channel) scales from
    ``quantize_weight(w, contract_axis=1)`` ([E, 1, F] / [E, 1, D]).
    """
    h = qeinsum("ecd,edf->ecf", xe, w1q, s1) + b1[:, None, :].astype(xe.dtype)
    h = jax.nn.gelu(h, approximate=False)
    y = qeinsum("ecf,efd->ecd", h, w2q, s2) + b2[:, None, :].astype(xe.dtype)
    return y


def _path_str(path) -> str:
    return "/" + "/".join(str(k) for k in path)


def quantize_variables(variables, *, include: Optional[re.Pattern] = None,
                       exclude: Optional[re.Pattern] = None,
                       min_elems: int = 1 << 15,
                       predicate: Optional[Callable[[str, jnp.ndarray], bool]] = None,
                       weight_only: bool = False):
    """Rewrite eligible weights in ``variables['params']`` to int8 and record
    their scales in a parallel ``variables['quant']`` collection.

    Eligible by default: 2-D ``kernel`` leaves (consumed by `QDense`) and
    the stacked expert/SFFN weights, of at least ``min_elems`` elements,
    whose path matches the audited include pattern and not the exclude
    pattern.  ``predicate(path, leaf)`` overrides the path filters entirely
    when given.

    ``weight_only=True`` records scales under ``<name>_wscale`` instead of
    ``<name>_scale``: consumers then dequantize the int8 weight into the
    float dot (W8 mode, no activation quantization) instead of running the
    W8A8 int8-MXU path.  Same storage, same scales — only the compute mode
    differs, selected statically by the scale leaf's name.

    Returns a NEW variables dict; the input is not mutated.  Idempotent
    (int8 leaves are skipped).
    """
    include = include or _DEFAULT_INCLUDE
    exclude = exclude or _DEFAULT_EXCLUDE

    params = variables["params"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    new_leaves = {}
    quant_tree: dict = {}

    def want(path_s: str, name: str, leaf) -> bool:
        if leaf.dtype == jnp.int8 or leaf.size < min_elems:
            return False
        is_kernel = name == "kernel" and leaf.ndim == 2
        is_stacked = name in _STACKED_LEAVES and leaf.ndim == 3
        if not (is_kernel or is_stacked):
            return False
        if predicate is not None:
            return predicate(path_s, leaf)
        return bool(include.search(path_s)) and not exclude.search(path_s)

    n_q = 0
    for path, leaf in flat:
        path_s = _path_str([getattr(k, "key", k) for k in path])
        name = path_s.rsplit("/", 1)[-1]
        if not want(path_s, name, leaf):
            continue
        contract_axis = 0 if leaf.ndim == 2 else 1
        wq, scale = quantize_weight(leaf, contract_axis)
        new_leaves[path_s] = wq
        # scale entry lives at the same module scope, leaf '<name>_scale'
        node = quant_tree
        parts = path_s.strip("/").split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1] + ("_wscale" if weight_only else "_scale")] = scale
        n_q += 1

    if not n_q:
        return dict(variables)

    def rewrite(path, leaf):
        return new_leaves.get(_path_str([getattr(k, "key", k) for k in path]), leaf)

    def merge(old: dict, new: dict) -> dict:
        # widening passes (pass include= to quantize more) must keep the
        # scales the earlier pass recorded for already-int8 leaves
        out = dict(old)
        for k, v in new.items():
            out[k] = merge(out[k], v) if isinstance(out.get(k), dict) else v
        return out

    out = dict(variables)
    out["params"] = jax.tree_util.tree_map_with_path(rewrite, params)
    out["quant"] = merge(dict(variables.get("quant", {})), quant_tree)
    return out


def count_quantized(variables) -> Tuple[int, int]:
    """(number of int8 leaves, int8 parameter count) — for logging/tests."""
    n, elems = 0, 0
    for leaf in jax.tree_util.tree_leaves(variables.get("params", {})):
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.int8:
            n += 1
            elems += leaf.size
    return n, elems
