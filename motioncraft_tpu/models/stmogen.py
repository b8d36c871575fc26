"""STMoGenTransformer — MotionCraft's flagship DiT-style denoiser, TPU-native.

Re-designs /root/reference/mogen/models/transformers/stmogen.py:626-761:
  - PoseEncoder/PoseDecoder body-part projections use static gather tables and
    a single inverse-permutation take for the scatter (no in-place writes).
  - The decoder stack is DecoderLayer(STMA + SFFN).
  - Classifier-free guidance at test time is the reference's 2x-batch scheme
    with the timestep-dependent scale w = (1-(1000-t)/1000)*scale + 1
    (stmogen.py:655-659), fully traced so the whole CFG step lives inside the
    sampling scan.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..registry import ATTENTIONS, SUBMODULES
from . import body_layout
from .blocks import (SFFN, PatchEmbed1D, QDense, timestep_embedding,
                     unpatchify, zeros_init)
from .diffusion_transformer import DiffusionTransformerBase


def _maybe_zero(zero: bool):
    return dict(kernel_init=zeros_init, bias_init=zeros_init) if zero else {}


def _sum_named_leaves(tree, key_name: str):
    """Sum every leaf under any dict key == key_name (None when absent) —
    the per-layer counterpart of architecture._collect_loss_leaves."""
    total, found = jnp.float32(0.0), False

    def walk(node):
        nonlocal total, found
        if isinstance(node, dict):
            for k, v in node.items():
                if k == key_name:
                    for leaf in jax.tree_util.tree_leaves(v):
                        total = total + jnp.asarray(leaf, jnp.float32)
                        found = True
                else:
                    walk(v)

    walk(dict(tree))
    return total if found else None


class PoseEncoder(nn.Module):
    """Per-body-part linear (or temporal-patch) embedding + whole-body embed
    (reference stmogen.py:141-378)."""

    dataset_name: str = "human_ml3d"
    latent_dim: int = 64
    input_dim: int = 263
    patch_size: int = 1
    joints: bool = False
    body_graph: bool = False
    gnn_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, motion, train: bool = False):
        feats = []
        if self.joints:
            slices = body_layout.joint_slices(self.dataset_name)
            body = body_layout.joints_body_slice(self.dataset_name)
            for i, sl in enumerate(slices):
                feats.append(QDense(self.latent_dim, name=f"joint_{i}")(
                    jnp.take(motion, jnp.asarray(sl), axis=-1)))
            feats.append(QDense(self.latent_dim, name="body_embed")(
                jnp.take(motion, jnp.asarray(body), axis=-1)))
            parts_num = len(slices) + 1
        else:
            parts = body_layout.part_slices(self.dataset_name)
            body = body_layout.body_slice(self.dataset_name)
            assert len(set(body)) == self.input_dim
            for name, sl in parts.items():
                x_part = jnp.take(motion, jnp.asarray(sl), axis=-1)
                if self.patch_size > 1:
                    feats.append(PatchEmbed1D(self.patch_size, self.latent_dim,
                                              name=f"{name}_embed")(x_part))
                else:
                    feats.append(QDense(self.latent_dim, name=f"{name}_embed")(x_part))
            x_body = jnp.take(motion, jnp.asarray(body), axis=-1)
            if self.patch_size > 1:
                feats.append(PatchEmbed1D(self.patch_size, self.latent_dim,
                                          name="body_embed")(x_body))
            else:
                feats.append(QDense(self.latent_dim, name="body_embed")(x_body))
            parts_num = len(parts) + 1
        feat = jnp.concatenate(feats, axis=-1)
        if self.body_graph:
            from .gnns import STGCN
            B, T, D = feat.shape
            feat = STGCN(**(self.gnn_cfg or {}), name="gnn")(
                feat.reshape(B, T, parts_num, self.latent_dim), train=train).reshape(B, T, D)
        return feat


class PoseDecoder(nn.Module):
    """Per-part linear heads scattered back through an inverse permutation,
    averaged with the whole-body head (reference stmogen.py:381-578)."""

    dataset_name: str = "human_ml3d"
    latent_dim: int = 64
    output_dim: int = 263
    patch_size: int = 1
    joints: bool = False
    zero_init: bool = True  # reference wraps the decoder in zero_module()

    @nn.compact
    def __call__(self, motion):
        B, T = motion.shape[:2]
        D = self.latent_dim
        zero = _maybe_zero(self.zero_init)
        if self.joints:
            slices = body_layout.joint_slices(self.dataset_name)
            flat = sum(slices, [])
        else:
            parts = body_layout.part_slices(self.dataset_name)
            slices = list(parts.values())
            flat = sum(slices, [])
        inv = jnp.asarray(body_layout.inverse_permutation(flat, self.output_dim))

        part_outs = []
        for i, sl in enumerate(slices):
            name = (f"joint_{i}" if self.joints
                    else f"{list(body_layout.part_slices(self.dataset_name))[i]}_out")
            h = motion[:, :, i * D:(i + 1) * D]
            y = QDense(self.patch_size * len(sl), name=name, **zero)(h)
            part_outs.append(unpatchify(y, self.patch_size))
        scattered = jnp.take(jnp.concatenate(part_outs, axis=-1), inv, axis=-1)

        body = QDense(self.patch_size * self.output_dim, name="body_out", **zero)(
            motion[:, :, len(slices) * D:])
        body = unpatchify(body, self.patch_size)
        return (scattered + body) / 2.0


class STMoGenDecoderLayer(nn.Module):
    """ca_block (STMA) + SFFN (reference stmogen.py:610-623).

    The call signature is positional so ``nn.remat(..., static_argnums=
    (7, 8, 9))`` — positions count ``self`` at 0 — can mark the
    python-valued args (num_intervals / train / cfg_dedup) static when
    activation rematerialization is enabled.  ``text_feat`` (position 10) is
    a traced tensor; ``text_only`` is static but is only ever passed through
    the detached non-remat template in precompute_text_feats."""

    ca_block_cfg: Optional[dict] = None
    ffn_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, xf=None, emb=None, src_mask=None, cond_type=None,
                 motion_length=None, num_intervals=1, train=False,
                 cfg_dedup=False, text_feat=None, text_only=False):
        if text_only:
            # precompute mode (stmogen.py precompute_text_feats): return the
            # ca_block's step-invariant text features, skip the FFN
            return ATTENTIONS.build(self.ca_block_cfg, name="ca_block")(
                None, xf=xf, text_only=True)
        if self.ca_block_cfg is not None:
            x = ATTENTIONS.build(self.ca_block_cfg, name="ca_block")(
                x, xf=xf, emb=emb, src_mask=src_mask, cond_type=cond_type,
                motion_length=motion_length, num_intervals=num_intervals,
                train=train, cfg_dedup=cfg_dedup, text_feat=text_feat)
        if self.ffn_cfg is not None:
            cfg = dict(self.ffn_cfg)
            x = SFFN(latent_dim=cfg.pop("latent_dim"), ffn_dim=cfg.pop("ffn_dim"),
                     num_heads=cfg.pop("num_heads"),
                     dropout=cfg.pop("dropout", 0.0),
                     time_embed_dim=cfg.pop("time_embed_dim", 2048),
                     name="ffn")(x, emb, train=train)
        return x


@SUBMODULES.register_module()
class STMoGenTransformer(DiffusionTransformerBase):
    """MotionCraft main model: body-part PoseEncoder/Decoder + STMA/SFFN stack
    (stmogen.py:626-761)."""

    pose_encoder_cfg: Optional[dict] = None
    pose_decoder_cfg: Optional[dict] = None
    patch_size: int = 1
    scale_func_cfg: Optional[dict] = None
    moe_route_loss_weight: float = 1.0
    template_kl_loss_weight: float = 0.0001
    # GPipe the decoder stack over this mesh axis (parallel/pp.py): each
    # stage holds num_layers/S layers, activations ppermute stage-to-stage,
    # `pipeline_microbatches` microbatches fill the schedule.  MoE routing
    # becomes per-microbatch — the reference's own per-rank Tutel semantics.
    pipeline_axis: Optional[str] = None
    pipeline_microbatches: int = 2
    # CFG layer-0 dedup: the cond/uncond halves of the doubled test batch are
    # identical until text_cond_type enters layer 0's linear attention, so
    # layer 0's MOTION MoE + body graph compute on one half and tile
    # (attentions.py STMA cfg_dedup).  Bit-exact unless MoE capacity dropping
    # triggers (tests/test_cfg_dedup.py).  Config-off for strict reference
    # drop semantics.
    cfg_layer0_dedup: bool = True
    # Text-branch hoist: every layer's text MoE (STMA._text_branch) depends
    # only on xf — identical across all DDIM steps — so architecture.sample
    # precomputes it ONCE per sampling call (precompute_text_feats, on the
    # CFG-doubled batch for capacity/drop parity) instead of once per step.
    # Exact: same inputs, same params, same routing as the in-layer compute
    # it replaces (tests/test_cfg_dedup.py).  Config-off to force per-step
    # recompute.
    text_hoist: bool = True

    def setup_io(self):
        self.joint_embed = PoseEncoder(**(self.pose_encoder_cfg or {}),
                                       patch_size=self.patch_size)
        self.out = PoseDecoder(**(self.pose_decoder_cfg or {}),
                               patch_size=self.patch_size)

    def build_temporal_blocks(self):
        if self.pipeline_axis is not None:
            # Stacked storage: ONE nn.vmap-lifted module whose params carry a
            # leading [num_layers] axis, sharded over ``pipe`` by the
            # tree_shardings rules (parallel/tp.py) — each stage holds only
            # its num_layers/S slice, so pipeline parallelism actually
            # relieves weight memory (params, grads AND adam moments), not
            # just activations.  gpipe consumes the stacked tree directly.
            if isinstance(self.ffn_cfg, (list, tuple)):
                raise ValueError("pipeline_axis requires homogeneous layers "
                                 "(per-layer ffn_cfg lists cannot be stacked)")
            stacked_cls = nn.vmap(
                STMoGenDecoderLayer,
                variable_axes={"params": 0, "losses": 0},
                split_rngs={"params": True, "gate_noise": True},
                in_axes=None, out_axes=0, axis_size=self.num_layers)
            return [stacked_cls(ca_block_cfg=self.ca_block_cfg,
                                ffn_cfg=self.ffn_cfg, name="stacked_blocks")]
        layer_cls = (nn.remat(STMoGenDecoderLayer, static_argnums=(7, 8, 9))
                     if self.remat else STMoGenDecoderLayer)
        blocks = []
        for i in range(self.num_layers):
            ffn_cfg = (self.ffn_cfg[i] if isinstance(self.ffn_cfg, (list, tuple))
                       else self.ffn_cfg)
            blocks.append(layer_cls(ca_block_cfg=self.ca_block_cfg,
                                    ffn_cfg=ffn_cfg, name=f"block_{i}"))
        return blocks

    def scale_func(self, timestep):
        """Timestep-dependent CFG weights (stmogen.py:655-659)."""
        scale = (self.scale_func_cfg or {}).get("scale", 6.5)
        w = (1 - (1000 - timestep.astype(jnp.float32)) / 1000) * scale + 1
        return w, 1 - w

    def aux_loss_weights(self) -> Dict[str, float]:
        return {"moe_route_loss": self.moe_route_loss_weight,
                "template_kl_loss": self.template_kl_loss_weight}

    # --------------------------------------------------------- step caching
    supports_step_cache = True

    def make_step_cache(self, B: int, T: int, dtype=jnp.float32) -> jnp.ndarray:
        """Zero-initialised per-layer residual cache for the CFG-doubled test
        forward: [num_layers, 2B, T/patch, latent_dim] (diffusion/stepcache.py).
        Step 0 of any schedule must compute (flags enforce this)."""
        return jnp.zeros((self.num_layers, 2 * B, T // self.patch_size,
                          self.latent_dim), dtype)

    def _run_blocks_cached(self, h, xf, emb, src_mask, cond_type, motion_length,
                           num_intervals, step_cache, cache_flags,
                           first_cfg_dedup=False, text_feats=None):
        """Decoder stack with per-layer residual reuse: layer i either
        recomputes its residual or replays ``step_cache[i]`` under a real
        ``lax.cond`` branch (compute is skipped on TPU, not masked out).
        All-compute flags match the uncached stack bit-for-bit except that
        the layer-0 CFG-dedup concats (``first_cfg_dedup``) may fuse
        differently inside the cond branch (<=2 ulp; tests/test_step_cache.py).
        Inference-only: the test path sows no variables, so bound submodule
        calls inside a cond branch are legal flax."""
        if self.pipeline_axis is not None:
            raise ValueError("step caching is not supported with pipeline_axis")
        new_cache = []
        for i, block in enumerate(self.temporal_decoder_blocks):
            # compute returns the layer output directly (NOT hh + (out - hh))
            # so all-compute flags are bit-identical to the uncached stack
            def compute(hh, block=block, i=i):
                out = block(hh, xf, emb, src_mask, cond_type, motion_length,
                            num_intervals, False, first_cfg_dedup and i == 0,
                            None if text_feats is None else text_feats[i])
                return out, out - hh

            def reuse(hh, i=i):
                r = step_cache[i].astype(hh.dtype)
                return hh + r, r

            if self.is_initializing():
                h, r = compute(h)  # init must trace the params unconditionally
            else:
                h, r = jax.lax.cond(cache_flags[i], reuse, compute, h)
            new_cache.append(r)
        return h, jnp.stack(new_cache)

    def _run_blocks(self, h, xf, emb, src_mask, cond_type, motion_length,
                    num_intervals, train, first_cfg_dedup=False,
                    text_feats=None):
        """Apply the decoder stack; GPipe it over ``pipeline_axis`` when set
        (parallel/pp.py — the reference's DDP has no pipeline path)."""
        if self.pipeline_axis is None:
            for i, block in enumerate(self.temporal_decoder_blocks):
                h = block(h, xf, emb, src_mask, cond_type, motion_length,
                          num_intervals, train, first_cfg_dedup and i == 0,
                          None if text_feats is None else text_feats[i])
            return h
        stacked_mod = self.temporal_decoder_blocks[0]
        if self.is_initializing():
            # run the lifted module once so its [num_layers, ...] params get
            # created; the vmapped output (every layer applied to the same
            # input) is meaningless and discarded — h's shape is unchanged by
            # the residual-stack blocks, so downstream init sees real shapes
            stacked_mod(h, xf, emb, src_mask, cond_type, motion_length)
            return h
        if train and ((self.ca_block_cfg or {}).get("dropout", 0.0)
                      or (self.ffn_cfg or {}).get("dropout", 0.0)):
            raise ValueError("pipeline_axis training path does not thread "
                             "dropout rngs; set dropout=0")
        from ..parallel.pp import gpipe
        if "params" not in stacked_mod.variables:
            raise ValueError(
                "pipeline_axis model got per-layer block params; convert "
                "them to the stacked layout with "
                "parallel.pp.stack_block_params (or init the piped model)")
        stacked = stacked_mod.variables["params"]
        # parent=None: a detached functional template, not a submodule
        layer = STMoGenDecoderLayer(ca_block_cfg=self.ca_block_cfg,
                                    ffn_cfg=self.ffn_cfg, parent=None)

        # per-(layer, microbatch) gate-noise streams: fold the outer rng with
        # the stacked layer index and the microbatch's first global row id
        needs_gate = train and (self.ca_block_cfg or {}).get("gate_noise", 0) > 0
        gate_rng = (self.make_rng("gate_noise")
                    if needs_gate and self.has_rng("gate_noise") else None)
        row_ids = jnp.arange(h.shape[0], dtype=jnp.int32)
        layer_ids = jnp.arange(self.num_layers, dtype=jnp.int32)

        def layer_fn(p, x_mb, c):
            params, lidx = p
            xf_, emb_, mask_, cond_, ml_, rows = c
            rngs = None
            if gate_rng is not None:
                rngs = {"gate_noise": jax.random.fold_in(
                    jax.random.fold_in(gate_rng, lidx), rows[0])}
            out = layer.apply({"params": params}, x_mb, xf_, emb_, mask_,
                              cond_, ml_, num_intervals, train,
                              mutable=["losses"] if train else False,
                              rngs=rngs)
            if not train:
                return out, {}
            y, mut = out
            aux = {}
            for name in ("aux_loss", "kl_loss"):
                s = _sum_named_leaves(mut.get("losses", {}), name)
                if s is not None:
                    aux[name] = s
            return y, aux

        h, aux = gpipe(layer_fn, (stacked, layer_ids), h,
                       (xf, emb, src_mask, cond_type, motion_length, row_ids),
                       n_microbatch=self.pipeline_microbatches,
                       axis=self.pipeline_axis)
        for name, val in aux.items():
            self.sow("losses", name, val)
        return h

    def forward_train(self, h=None, src_mask=None, emb=None, xf_out=None,
                      cond_type=None, motion_length=None, num_intervals=1,
                      train=False, **kwargs):
        B, T = h.shape[:2]
        T_out = T * self.patch_size
        h = self._run_blocks(h, xf_out, emb, src_mask, cond_type,
                             motion_length, num_intervals, train)
        return self.out(h).reshape(B, T_out, -1)

    def precompute_text_feats(self, xf_out):
        """Per-layer step-invariant text features (tuple of
        [B, Lt, num_text_heads, 2L]) for the sampling-scan hoist —
        architecture.sample computes this ONCE per call and threads it into
        every forward_test step.  None when the hoist is disabled or under
        pipeline parallelism (the gpipe path streams layers).  Runs through
        a detached functional template (the gpipe pattern) so the
        remat-wrapped block classes never see the python-bool mode flag."""
        if (not self.text_hoist or self.pipeline_axis is not None
                or xf_out is None):
            return None
        # compute on the CFG-doubled batch: capacity/drop semantics then
        # match the in-layer 2B compute bit-for-bit (drops are token-count
        # dependent, so an undoubled probe would route differently)
        xf2 = jnp.concatenate([xf_out, xf_out], axis=0)
        tmpl = STMoGenDecoderLayer(ca_block_cfg=self.ca_block_cfg,
                                   ffn_cfg=self.ffn_cfg, parent=None)
        return tuple(
            tmpl.apply(dict(block.variables), None, xf2, text_only=True)
            for block in self.temporal_decoder_blocks)

    def forward_test(self, h=None, src_mask=None, emb=None, xf_out=None,
                     motion_length=None, num_intervals=1, timesteps=None,
                     step_cache=None, cache_flags=None, text_feats=None,
                     **kwargs):
        """CFG 2x-batch (text + uncond), mixed by scale_func (stmogen.py:725-761).

        With ``step_cache``/``cache_flags`` set (diffusion/stepcache.py), the
        decoder stack reuses cached per-layer residuals on flagged layers and
        the return value becomes ``(output, new_cache)``.  ``text_feats``
        (from precompute_text_feats) replaces every layer's text-MoE compute
        with the hoisted per-layer constants."""
        B, T = h.shape[:2]
        T_out = T * self.patch_size
        all_cond = jnp.concatenate([jnp.ones((B, 1, 1)), jnp.zeros((B, 1, 1))], axis=0)
        h2 = jnp.concatenate([h, h], axis=0)
        xf2 = jnp.concatenate([xf_out, xf_out], axis=0)
        emb2 = jnp.concatenate([emb, emb], axis=0)
        mask2 = jnp.concatenate([src_mask, src_mask], axis=0)
        ml2 = jnp.concatenate([motion_length, motion_length], axis=0)
        # text_feats are precomputed on the already-doubled batch
        tf2 = text_feats
        new_cache = None
        dedup = self.cfg_layer0_dedup and self.pipeline_axis is None
        if step_cache is not None:
            h2, new_cache = self._run_blocks_cached(
                h2, xf2, emb2, mask2, all_cond, ml2, num_intervals,
                step_cache, cache_flags, first_cfg_dedup=dedup,
                text_feats=tf2)
        else:
            h2 = self._run_blocks(h2, xf2, emb2, mask2, all_cond, ml2,
                                  num_intervals, False, first_cfg_dedup=dedup,
                                  text_feats=tf2)
        out = self.out(h2).reshape(2 * B, T_out, -1)
        text_coef, none_coef = self.scale_func(timesteps[0])
        mixed = out[:B] * text_coef + out[B:] * none_coef
        return mixed if new_cache is None else (mixed, new_cache)
