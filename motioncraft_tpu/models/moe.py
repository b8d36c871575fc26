"""Mixture-of-Experts layer with Tutel-compatible semantics, TPU-native.

The reference uses Tutel's CUDA ``moe_layer`` (cosine_top gate, top-2,
fp32 gate, gate_noise, capacity_factor=1.5, batch_prioritized routing,
non-gshard "load importance" aux loss) — see
/root/reference/mogen/models/attentions/st_attention.py:17-56 and the config
at configs/stmogen/T2M_...0_125b.py:51-54.

Here dispatch is the dense one-hot (GShard-style) einsum formulation: at 16
experts x 128-dim tokens the [N, E, C] combine tensor is tiny, everything is
MXU matmuls, and XLA shards it over an ``expert`` mesh axis for free when the
expert weights carry a sharding annotation.  Batch-prioritized routing is an
argsort by top-1 gate score before slot assignment; capacity overflow drops
tokens exactly as Tutel's capacity_factor does.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# read ONCE at import: a trace-time os.environ read inside a module __call__
# is a hidden cache-key/reproducibility hazard
_ENV_RAGGED = os.environ.get("MOTIONCRAFT_MOE_RAGGED")
_ENV_FUSED = os.environ.get("MOTIONCRAFT_MOE_FUSED")

from ..ops.pallas_ffn import expert_ffn
from ..ops.pallas_moe import moe_positions_counts
from .blocks import QDense, zeros_init


def _normal_cdf(x, sigma):
    return 0.5 * (1.0 + jax.lax.erf(x / (sigma * math.sqrt(2.0))))


def load_importance_loss(scores_wo_noise, topk_noisy_scores, num_experts, gate_noise):
    """Tutel's is_gshard_loss=False aux loss: mean of squared coefficients of
    variation of (soft) importance and (noise-smoothed) load."""
    imp = scores_wo_noise.sum(axis=0)
    l_imp = imp.var() / (imp.mean() ** 2 + 1e-10)
    if gate_noise > 0:
        threshold = topk_noisy_scores[:, -1:]
        prob = _normal_cdf(scores_wo_noise - threshold, gate_noise / num_experts)
        load = prob.sum(axis=0)
        l_load = load.var() / (load.mean() ** 2 + 1e-10)
        return (l_imp + l_load) / 2.0
    return l_imp


class CosineTopGate(nn.Module):
    """Tutel CosineTopKGate: cosine similarity in a learned 256-d projection,
    scaled by a learned clamped temperature."""

    num_experts: int
    proj_dim: int = 256
    init_t: float = 0.5

    @nn.compact
    def __call__(self, x):
        temperature = self.param("temperature",
                                 lambda k: jnp.full((1,), math.log(1.0 / self.init_t)))
        sim_matrix = self.param("sim_matrix",
                                lambda k, s: jax.random.normal(k, s) * 0.005,
                                (self.proj_dim, self.num_experts))
        proj = QDense(self.proj_dim, name="cosine_projector")(x.astype(jnp.float32))
        proj = proj / (jnp.linalg.norm(proj, axis=-1, keepdims=True) + 1e-12)
        sim = sim_matrix / (jnp.linalg.norm(sim_matrix, axis=0, keepdims=True) + 1e-12)
        logit_scale = jnp.exp(jnp.clip(temperature, max=math.log(100.0)))
        return (proj @ sim) * logit_scale


class LinearTopGate(nn.Module):
    num_experts: int

    @nn.compact
    def __call__(self, x):
        return QDense(self.num_experts, use_bias=False, name="wg")(x.astype(jnp.float32))


class MoELayer(nn.Module):
    """Top-k expert FFN layer over flat tokens [N, D] -> [N, D]."""

    num_experts: int
    topk: int
    model_dim: int
    hidden_dim: int
    gate_type: str = "cosine_top"
    gate_noise: float = 1.0
    capacity_factor: float = 1.5
    batch_prioritized: bool = True
    expert_axis: Optional[str] = None  # mesh axis name for expert sharding
    # inference dispatch: 'ragged' (rank-compact lax.ragged_dot), 'ragged_fused'
    # (+ the Pallas grouped-FFN kernel), 'slots' (padded [E, capacity]
    # buffers), or 'auto' (ragged on TPU).  CONFIG IS THE SOURCE OF TRUTH:
    # set dispatch_mode explicitly in model configs to pin a path; the
    # MOTIONCRAFT_MOE_RAGGED / MOTIONCRAFT_MOE_FUSED env vars (read once at
    # import) act only as operator overrides of the 'auto' heuristics, e.g.
    # to disable a kernel on a runtime whose Mosaic AOT service stalls.
    dispatch_mode: str = "auto"

    def _use_ragged(self, train: bool) -> bool:
        if train or self.expert_axis is not None:
            return False
        if self.dispatch_mode == "auto":
            if _ENV_RAGGED == "1":
                return True
            if _ENV_RAGGED == "0":
                return False
            return jax.default_backend() == "tpu"
        return self.dispatch_mode in ("ragged", "ragged_fused")

    def _use_fused_ffn(self) -> bool:
        """Pallas grouped-FFN inside the ragged path — the TPU default
        (16.8 vs 23.9 ms/call for the lax.ragged_dot pair at flagship shapes
        on v5e).  Opt out with MOTIONCRAFT_MOE_FUSED=0 (e.g. on runtimes
        where the Mosaic AOT compile stalls)."""
        from ..ops.kernel_gate import pallas_disabled
        if pallas_disabled():
            return False
        if self.dispatch_mode == "ragged_fused":
            return True
        if self.dispatch_mode == "auto" and _ENV_FUSED != "0":
            return _ENV_FUSED == "1" or jax.default_backend() == "tpu"
        return False

    @nn.compact
    def __call__(self, x, train: bool = False):
        N, D = x.shape
        E, K = self.num_experts, self.topk

        gate = (CosineTopGate(E, name="gate") if self.gate_type == "cosine_top"
                else LinearTopGate(E, name="gate"))
        logits = gate(x)  # fp32 [N, E]

        if train and self.gate_noise > 0:
            noise = jax.random.normal(self.make_rng("gate_noise"), logits.shape, logits.dtype)
            logits_w_noise = logits + self.gate_noise * noise / E
        else:
            logits_w_noise = logits
        scores = jax.nn.softmax(logits_w_noise, axis=1)

        topk_scores, topk_idx = jax.lax.top_k(scores, K)  # [N, K]
        # normalize selected gates (tutel normalize_gate, k>1)
        denom = topk_scores.sum(axis=1, keepdims=True) + 1e-9
        gates = topk_scores / denom  # [N, K]

        # Tutel capacity: top_k * int(capacity_factor * ceil(N / E))
        capacity = K * int(self.capacity_factor * ((N + E - 1) // E))
        capacity = max(1, min(capacity, N))

        # Slot assignment order: by descending top-1 score when
        # batch-prioritized.  The order only decides WHICH tokens drop on
        # capacity overflow, so the (expensive) argsort over all tokens is
        # skipped at inference — arrival order is used instead, matching
        # Tutel's behavior up to the overflow tie-break.
        prioritize = self.batch_prioritized and train
        if prioritize:
            order = jnp.argsort(-topk_scores[:, 0])
            inv_order = jnp.argsort(order)

        # Tutel position computation (rank within the chosen expert, k-major
        # processing order) as ONE flat cumsum over [K*N, E] — the per-k
        # loop formulation is ~70x slower on TPU (see ops/pallas_moe.py)
        idx_for_rank = topk_idx[order] if prioritize else topk_idx
        flat_idx = idx_for_rank.T.reshape(-1)  # k-major [K*N]
        pos_flat, expert_counts = moe_positions_counts(flat_idx, E)
        positions = pos_flat.reshape(K, N).T  # [N, K]
        if prioritize:
            positions = positions[inv_order]

        valid = positions < capacity  # capacity dropping
        gates = gates * valid.astype(gates.dtype)

        # expert FFN weights
        w1 = self.param("expert_w1", nn.initializers.lecun_normal(), (E, D, self.hidden_dim))
        b1 = self.param("expert_b1", zeros_init, (E, self.hidden_dim))
        w2 = self.param("expert_w2", nn.initializers.lecun_normal(), (E, self.hidden_dim, D))
        b2 = self.param("expert_b2", zeros_init, (E, D))
        if self.expert_axis is not None:
            # pin dim0 to the expert axis; leave d/f dims UNCONSTRAINED so a
            # tensor-parallel weight layout (parallel/tp.py: hidden dim over
            # 'tensor') survives instead of being gathered back here
            U = jax.sharding.PartitionSpec.UNCONSTRAINED
            w1 = jax.lax.with_sharding_constraint(
                w1, jax.sharding.PartitionSpec(self.expert_axis, U, U))
            w2 = jax.lax.with_sharding_constraint(
                w2, jax.sharding.PartitionSpec(self.expert_axis, U, U))

        token_ids = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None],
                                     (N, K)).reshape(-1)
        # W8 weight-only expert weights (ops/quant.py): dequantize into the
        # normal float dispatch paths (ragged/fused/slot all work) — the
        # convert+scale fuses into the grouped matmuls' operand reads, so
        # expert weights stream from HBM as int8
        if (w1.dtype == jnp.int8
                and self.has_variable("quant", "expert_w1_wscale")):
            from ..ops.quant import dequant
            w1 = dequant(w1, self.get_variable("quant", "expert_w1_wscale"),
                         x.dtype)
            w2 = dequant(w2, self.get_variable("quant", "expert_w2_wscale"),
                         x.dtype)
        # W8A8 int8 expert weights run through the slot path: lax.ragged_dot
        # has no int8 overload and the Pallas grouped kernel is float-only,
        # but the [E, C, D] einsum pair maps directly onto the MXU's native
        # int8 path
        is_q = w1.dtype == jnp.int8
        if self._use_ragged(train) and not is_q:
            # Rank-compact dispatch (megablocks-style): the kept (token, k)
            # choices occupy M = K*N rows sorted by expert
            # (rank = offset[e] + position).  Same capacity-drop semantics
            # as the slot path.  The FFN runs either as two lax.ragged_dot
            # grouped matmuls, or (fused) as one Pallas kernel over
            # BLOCK-aligned groups that never materializes the hidden
            # activation in HBM.
            # size floor: below ~64 blocks of rows the ragged_dot pair is
            # already sub-ms and a fresh Mosaic kernel compile (minutes on
            # remote-AOT runtimes) buys nothing
            from ..ops.pallas_moe_ffn import BLOCK as _FFN_BLOCK
            fused = self._use_fused_ffn() and (
                self.dispatch_mode == "ragged_fused"  # explicit: no floor
                or N * K >= 64 * _FFN_BLOCK)
            fill = jnp.minimum(expert_counts, capacity)       # [E]
            if fused:
                from ..ops.pallas_moe_ffn import BLOCK, grouped_ffn
                fill_aligned = ((fill + BLOCK - 1) // BLOCK) * BLOCK
                # static BLOCK-multiple bound on sum(fill_aligned)
                M = ((N * K + BLOCK - 1) // BLOCK) * BLOCK + E * BLOCK
            else:
                fill_aligned = fill
                M = N * K
            offset = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                      jnp.cumsum(fill_aligned)[:-1]])
            rank = offset[topk_idx] + positions               # [N, K]
            # Dropped entries get DISTINCT out-of-bounds indices so the
            # scatters can promise unique_indices + mode='drop': XLA then
            # vectorizes the scatter instead of serializing against
            # duplicate writes (6.0 -> ~1 ms per [M] scatter on v5e).
            oob = M + 1 + jnp.arange(N * K, dtype=jnp.int32)
            rank_flat = jnp.where(valid.reshape(-1), rank.reshape(-1), oob)
            token_for_rank = jnp.zeros((M + 1,), jnp.int32).at[rank_flat].set(
                token_ids, unique_indices=True, mode="drop")
            xs = x[token_for_rank[:M]]                        # [M, D] expert-sorted
            # The gate is a per-row SCALAR, so g*(h@w2) == (g*h)@w2 — apply
            # it at combine time as a broadcast multiply fused into the flat
            # row-gathers.  This kills both expensive alternatives: the
            # [N, K, D] gather+einsum combine (~7 ms) and a second [M]
            # scatter to build per-rank gates (~6 ms: TPU scalar scatters of
            # 16-bit values run ~2x slower than int32 ones).
            if fused:
                nb = M // BLOCK
                block_expert = jnp.clip(
                    jnp.searchsorted(jnp.cumsum(fill_aligned),
                                     jnp.arange(nb, dtype=jnp.int32) * BLOCK,
                                     side="right"),
                    0, E - 1).astype(jnp.int32)
                ye = grouped_ffn(block_expert, xs, w1,
                                 b1.astype(jnp.float32), w2,
                                 interpret=jax.default_backend() != "tpu")
            else:
                # pad rows (when drops occur) go to the last group
                group_sizes = fill.at[E - 1].add(M - fill.sum())
                h = jax.lax.ragged_dot(xs, w1, group_sizes)
                b1_rows = jnp.repeat(b1, group_sizes, axis=0, total_repeat_length=M)
                h = nn.gelu(h + b1_rows, approximate=False)
                ye = jax.lax.ragged_dot(h.astype(x.dtype), w2, group_sizes)
            ye_flat = jnp.concatenate([ye, jnp.zeros((1, D), x.dtype)], axis=0)
            r = jnp.where(valid, rank, M)                     # [N, K]
            gk = gates.astype(x.dtype)
            y = gk[:, 0, None] * ye_flat[r[:, 0]]
            for k in range(1, K):
                y = y + gk[:, k, None] * ye_flat[r[:, k]]
            # gate-weighted expert bias: sum_k g_k * b2[e_k] via a one-hot
            # [N, E] @ [E, D] MXU matmul — b2[topk_idx] would materialize an
            # [N, K, D] gather in HBM
            ge = jnp.einsum("nk,nke->ne", gates,
                            jax.nn.one_hot(topk_idx, E, dtype=gates.dtype))
            y = y + ge.astype(x.dtype) @ b2.astype(x.dtype)
        else:
            # Scatter/gather slot-buffer dispatch (the TPU equivalent of
            # Tutel's sparse CUDA dispatch).  One-hot [N, E, C] einsums would
            # be O(N^2) memory at real token counts (N = B*T*H ~ 3e5);
            # instead each (token, k) writes its row into a flat
            # (expert, slot) buffer and gathers it back.  Slots are unique by
            # construction, the extra row is the overflow dump.
            slots = topk_idx * capacity + positions  # [N, K]
            # distinct out-of-bounds indices for dropped tokens -> the
            # scatters are truly unique and mode='drop' discards them, which
            # lets XLA vectorize the scatter (see ragged path)
            oob = E * capacity + 1 + jnp.arange(N * K, dtype=jnp.int32)
            slots_flat = jnp.where(valid.reshape(-1), slots.reshape(-1), oob)
            slots = jnp.where(valid, slots, E * capacity)
            token_for_slot = jnp.zeros((E * capacity + 1,), jnp.int32).at[
                slots_flat].set(token_ids, unique_indices=True, mode="drop")
            slot_filled = jnp.zeros((E * capacity + 1,), jnp.bool_).at[
                slots_flat].set(True, unique_indices=True, mode="drop")
            xe_flat = jnp.where(slot_filled[:-1, None], x[token_for_slot[:-1]], 0)
            xe = xe_flat.reshape(E, capacity, D)
            if is_q:
                from ..ops.quant import expert_ffn_q
                s1 = self.get_variable("quant", "expert_w1_scale")
                s2 = self.get_variable("quant", "expert_w2_scale")
                ye = expert_ffn_q(xe, w1, s1, b1, w2, s2, b2)
            else:
                ye = expert_ffn(xe, w1, b1, w2, b2,
                                use_pallas="never" if self.expert_axis else "auto")
            ye_flat = jnp.concatenate([ye.reshape(E * capacity, D),
                                       jnp.zeros((1, D), x.dtype)], axis=0)
            y = jnp.einsum("nk,nkd->nd", gates.astype(x.dtype), ye_flat[slots])

        # aux loss visible via the 'losses' collection
        scores_wo_noise = jax.nn.softmax(logits, axis=1)
        noisy_sel = jnp.take_along_axis(scores, topk_idx, axis=1)
        l_aux = load_importance_loss(scores_wo_noise, noisy_sel, E,
                                     self.gate_noise if train else 0.0)
        self.sow("losses", "l_aux", l_aux)
        return y, l_aux


class MOE(nn.Module):
    """The reference's MOE wrapper (st_attention.py:17-56): learned positional
    embedding per (seq pos, head), tutel layer, GELU, output projection."""

    num_experts: int
    topk: int
    input_dim: int
    ffn_dim: int
    output_dim: int
    num_heads: int
    max_seq_len: int
    gate_type: str = "cosine_top"
    gate_noise: float = 1.0
    expert_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T, H, D = x.shape
        embedding = self.param("embedding", nn.initializers.normal(1.0),
                               (1, self.max_seq_len, self.num_heads, self.input_dim))
        x = x + embedding[:, :T, :, :]
        flat = x.reshape(-1, D)
        y, l_aux = MoELayer(self.num_experts, self.topk, self.input_dim, self.ffn_dim,
                            gate_type=self.gate_type, gate_noise=self.gate_noise,
                            expert_axis=self.expert_axis, name="model")(flat, train=train)
        y = QDense(self.output_dim, name="proj")(nn.gelu(y, approximate=False))
        return y.reshape(B, T, H, -1), l_aux
