"""ControlNet branch for plug-and-play multimodal control (S2G / M2D).

Re-designs /root/reference/mogen/models/transformers/controlnet.py (STMoGen
base) and controlnet_mcm.py (MCM base):
  - the base model runs frozen (optimizer-masked, see
    ``controlnet_frozen_prefixes``); the first ``copy_blocks_num`` decoder
    layers are duplicated as trainable control blocks with zero-init
    before/after projections, so at init the branch is an exact no-op.
  - the condition stream (raw 16 kHz audio -> WavEncoder, or 163-d music
    features) enters through a zero-init input projection and is injected as
    ``c_skip`` residuals into the base blocks.
  - condition-CFG zeroes ``c`` on the unconditional half of the CFG batch.

Weight transfer from a pretrained base (copied_block := base block) is a pure
host-side param-tree copy: ``init_control_blocks_from_base``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import SUBMODULES
from .baselines import MCMDecoderLayer
from .blocks import (PatchEmbed1D, QDense, WavEncoder, ZeroDense,
                     timestep_embedding)
from .stmogen import STMoGenDecoderLayer, STMoGenTransformer


class ControlT2MBlock(nn.Module):
    """Copied decoder layer + zero-init in/out projections (controlnet.py:30-88)."""

    ca_block_cfg: Optional[dict] = None
    sa_block_cfg: Optional[dict] = None
    ffn_cfg: Optional[dict] = None
    block_index: int = 0
    latent_dim: int = 512
    block_type: str = "stmogen"  # or "mcm"

    @nn.compact
    def __call__(self, x, c, **kwargs):
        if self.block_index == 0:
            c = QDense(self.latent_dim, kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros, name="before_proj")(c)
            inp = x + c
        else:
            inp = c
        if self.block_type == "mcm":
            copied = MCMDecoderLayer(sa_block_cfg=self.sa_block_cfg,
                                     ca_block_cfg=self.ca_block_cfg,
                                     ffn_cfg=self.ffn_cfg, name="copied_block")
        else:
            copied = STMoGenDecoderLayer(ca_block_cfg=self.ca_block_cfg,
                                         ffn_cfg=self.ffn_cfg, name="copied_block")
        c = copied(inp, **kwargs)
        c_skip = ZeroDense(self.latent_dim, name="after_proj")(c)
        return c, c_skip


@SUBMODULES.register_module()
class ControlT2MHalf(nn.Module):
    """Frozen base + control branch (controlnet.py:108-465)."""

    base_model: Optional[dict] = None  # config of the base submodule
    copy_blocks_num: int = 2
    control_cond_feats: int = 438
    condition_encode_cfg: Optional[dict] = None
    joint_embed_unfreeze: bool = True
    unfreeze_mode: str = "all"
    patch_size: int = 1
    block_type: str = "stmogen"
    init_cfg: Optional[dict] = None

    def setup(self):
        cfg = {k: v for k, v in dict(self.base_model or {}).items() if k != "type"}
        base_type = (self.base_model or {}).get("type", "STMoGenTransformer")
        self.base = SUBMODULES.get(base_type)(**cfg, name="base_model")
        cc = dict(self.condition_encode_cfg or {})
        self.condition_cfg_enabled = cc.get("condition_cfg", True)
        latent_dim = self.base.latent_dim
        if self.copy_blocks_num >= self.base.num_layers:
            raise ValueError(
                f"copy_blocks_num ({self.copy_blocks_num}) must be < the base "
                f"model's num_layers ({self.base.num_layers}): each control "
                f"block injects into the NEXT base block")
        blocks = []
        for i in range(self.copy_blocks_num):
            blocks.append(ControlT2MBlock(
                ca_block_cfg=self.base.ca_block_cfg,
                sa_block_cfg=getattr(self.base, "sa_block_cfg", None),
                ffn_cfg=(self.base.ffn_cfg[i]
                         if isinstance(self.base.ffn_cfg, (list, tuple))
                         else self.base.ffn_cfg),
                block_index=i, latent_dim=latent_dim, block_type=self.block_type,
                name=f"controlnet_{i}"))
        self.controlnet = blocks

        pre_type = cc.get("condition_pre_encode_type", "wav")
        if cc.get("condition_pre_encode", False):
            if pre_type == "wav":
                self.condition_pre_encoder = WavEncoder(
                    out_dim=cc.get("condition_latent_dim", 512),
                    audio_in=cc.get("control_cond_feats", self.control_cond_feats))
            elif pre_type == "wav2vec":
                # native Wav2Vec2 tower interpolated to the motion frame
                # count (EMAGE wav2vec.py:72-146 semantics; the reference's
                # ConditionEncoder reserves the type but raises,
                # controlnet.py:90-105)
                from .wav2vec import Wav2Vec2Conditioner
                self.condition_pre_encoder = Wav2Vec2Conditioner(
                    out_dim=cc.get("condition_latent_dim", 512),
                    wav2vec_cfg=cc.get("wav2vec_cfg"))
            else:
                raise NotImplementedError(pre_type)
        else:
            self.condition_pre_encoder = None
        self.condition_pre_encode_type = pre_type
        self.control_cond_input = ZeroDense(latent_dim)
        if self.patch_size > 1:
            self.condition_patch = PatchEmbed1D(self.patch_size, latent_dim)
        else:
            self.condition_patch = None

    # ------------------------------------------------------------ plumbing
    def encode_text(self, text_ids, clip_feat=None, train: bool = False):
        return self.base.encode_text(text_ids, clip_feat=clip_feat, train=train)

    def aux_loss_weights(self) -> Dict[str, float]:
        # read from the config dict: this is called on the unbound module
        cfg = dict(self.base_model or {})
        return {"moe_route_loss": cfg.get("moe_route_loss_weight", 1.0),
                "template_kl_loss": cfg.get("template_kl_loss_weight", 0.0001)}

    def scale_func(self, timestep):
        return self.base.scale_func(timestep)

    def forward_c(self, c, seq_len: int, train: bool = False):
        """Condition pre-encode -> zero-init proj -> patchify -> pad to the
        motion length, with the base sequence embedding added
        (controlnet.py:186-199)."""
        if self.condition_pre_encoder is not None:
            if self.condition_pre_encode_type == "wav2vec":
                # the wav2vec tower aligns its ~49 fps features to the
                # motion frame count internally (linear_interpolate)
                c = self.condition_pre_encoder(c, seq_len, train=train)
            else:
                c = self.condition_pre_encoder(c, train=train)
        c = self.control_cond_input(c)
        if self.condition_patch is not None:
            c = self.condition_patch(c)
        seq_len_c = min(c.shape[1], seq_len)  # original condition length
        pad = seq_len - c.shape[1]
        if pad > 0:
            c = jnp.concatenate([c, jnp.zeros((c.shape[0], pad, c.shape[2]), c.dtype)],
                                axis=1)
        elif pad < 0:
            c = c[:, :seq_len]
        c = c.at[:, :seq_len_c, :].add(
            self.base.sequence_embedding[None, :seq_len_c, :])
        return c

    def encode_condition(self, c, seq_len: int, train: bool = False):
        """Public hook for hoisting the (timestep-independent) condition
        encoder out of the sampling scan: the WavEncoder conv stack costs
        tens of GFLOPs per call and the reference recomputes it at EVERY
        denoiser step; encoded once per window it is amortized across the
        whole DDIM chain (architecture.sample passes the result back in as
        ``c_enc``)."""
        return self.forward_c(c, seq_len, train=train)

    def precompute_text_feats(self, xf_out):
        """Step-invariant text features for the sampling-scan hoist: the
        base stack's per-layer feats (STMoGenTransformer
        .precompute_text_feats) plus one per controlnet copied block (their
        STMA towers have their own text_moe params).  None when the base
        hoist is disabled or for the MCM block type."""
        if self.block_type != "stmogen" or xf_out is None:
            return None
        base_feats = self.base.precompute_text_feats(xf_out)
        if base_feats is None:
            return None
        # on the CFG-doubled batch, like the base (capacity/drop parity
        # with the in-layer compute)
        xf2 = jnp.concatenate([xf_out, xf_out], axis=0)
        ctrl = []
        for i, blk in enumerate(self.controlnet):
            sub = {col: tree["copied_block"] for col, tree in
                   blk.variables.items() if "copied_block" in tree}
            ffn_cfg = (self.base.ffn_cfg[i]
                       if isinstance(self.base.ffn_cfg, (list, tuple))
                       else self.base.ffn_cfg)
            tmpl = STMoGenDecoderLayer(ca_block_cfg=self.base.ca_block_cfg,
                                       ffn_cfg=ffn_cfg, parent=None)
            ctrl.append(tmpl.apply(sub, None, xf2, text_only=True))
        return {"base": base_feats, "ctrl": tuple(ctrl)}

    def _stack(self, h, xf_out, emb, src_mask, cond_type, motion_length,
               num_intervals, c, train, first_cfg_dedup=False,
               text_feats=None):
        """block0 -> (control blocks inject c_skip) -> rest (controlnet.py:268-338)."""
        kw = dict(xf=xf_out, emb=emb, src_mask=src_mask, cond_type=cond_type,
                  motion_length=motion_length, num_intervals=num_intervals,
                  train=train)
        tfb = lambda i: None if text_feats is None else text_feats["base"][i]
        tfc = lambda i: None if text_feats is None else text_feats["ctrl"][i]
        blocks = self.base.temporal_decoder_blocks
        # the condition branch injects only from block 1 on, so block 0 of
        # the CFG-doubled test batch still sees identical halves -> the
        # layer-0 dedup applies exactly as in the plain base model
        h = blocks[0](h, **kw, cfg_dedup=first_cfg_dedup, text_feat=tfb(0))
        if c is not None:
            for i in range(1, self.copy_blocks_num + 1):
                c, c_skip = self.controlnet[i - 1](h, c, **kw,
                                                   text_feat=tfc(i - 1))
                h = blocks[i](h + c_skip, **kw, text_feat=tfb(i))
            for i in range(self.copy_blocks_num + 1, len(blocks)):
                h = blocks[i](h, **kw, text_feat=tfb(i))
        else:
            for i in range(1, len(blocks)):
                h = blocks[i](h, **kw, text_feat=tfb(i))
        return h

    # --------------------------------------------------------- step caching
    @property
    def supports_step_cache(self):
        """SmoothCache layer-residual reuse (diffusion/stepcache.py); the
        MCM block type keeps a different eval protocol and is not wired."""
        return self.block_type == "stmogen"

    def make_step_cache(self, B: int, T: int, dtype=jnp.float32):
        """Dict cache: "h" = per-layer output residuals (the reuse table's
        layer axis, [L, 2B, T/patch, latent]); "c" = the control branch's
        per-control-layer ``c`` outputs ([copy, 2B, T/patch, latent]) — a
        reused control layer replays BOTH its h-residual (incl. the c_skip
        injection) and its c output, so the chain downstream stays
        consistent.  Called on the unbound module: reads config only."""
        cfg = dict(self.base_model or {})
        L, latent = cfg.get("num_layers", 8), cfg["latent_dim"]
        Tp = T // self.patch_size
        return {"h": jnp.zeros((L, 2 * B, Tp, latent), dtype),
                "c": jnp.zeros((self.copy_blocks_num, 2 * B, Tp, latent),
                               dtype)}

    def _stack_cached(self, h, xf_out, emb, src_mask, cond_type, motion_length,
                      num_intervals, c, step_cache, cache_flags,
                      first_cfg_dedup=False, text_feats=None):
        """Decoder stack with per-layer residual reuse under real
        ``lax.cond`` branches (inference only — no sown variables).  A
        control-injected layer (1..copy_blocks_num) is cached as the
        COMPOUND (control block + base block): its reuse replays the cached
        h-residual and cached c output together."""
        kw = dict(xf=xf_out, emb=emb, src_mask=src_mask, cond_type=cond_type,
                  motion_length=motion_length, num_intervals=num_intervals,
                  train=False)
        blocks = self.base.temporal_decoder_blocks
        init = self.is_initializing()
        new_h, new_c = [], []
        tfb = lambda i: None if text_feats is None else text_feats["base"][i]
        tfc = lambda i: None if text_feats is None else text_feats["ctrl"][i]

        def run(i, hh, cc):
            """Layer i compute: returns (h_out, h_residual, c_out)."""
            if c is not None and 1 <= i <= self.copy_blocks_num:
                c_new, c_skip = self.controlnet[i - 1](hh, cc, **kw,
                                                       text_feat=tfc(i - 1))
                out = blocks[i](hh + c_skip, **kw, text_feat=tfb(i))
                return out, out - hh, c_new
            out = blocks[i](hh, **kw,
                            cfg_dedup=first_cfg_dedup and i == 0,
                            text_feat=tfb(i))
            return out, out - hh, cc

        cur_c = c
        for i in range(len(blocks)):
            ctrl = c is not None and 1 <= i <= self.copy_blocks_num
            # both cond branches must agree in dtype: the control chain can
            # locally promote to f32 (e.g. f32 condition features mixing into
            # a bf16 h), so pin every branch output to h's dtype
            dt = h.dtype

            def compute(hh, i=i, ctrl=ctrl, dt=dt):
                out, r, c_new = run(i, hh, cur_c)
                out, r = out.astype(dt), r.astype(dt)
                return (out, r, c_new.astype(dt)) if ctrl else (out, r)

            def reuse(hh, i=i, ctrl=ctrl, dt=dt):
                r = step_cache["h"][i].astype(dt)
                if ctrl:
                    return hh + r, r, step_cache["c"][i - 1].astype(dt)
                return hh + r, r

            if init:
                res = compute(h)
            else:
                res = jax.lax.cond(cache_flags[i], reuse, compute, h)
            if ctrl:
                h, r, cur_c = res
                new_c.append(cur_c)
            else:
                h, r = res
            new_h.append(r)
        cache = {"h": jnp.stack(new_h),
                 "c": (jnp.stack(new_c) if new_c
                       else jnp.zeros_like(step_cache["c"]))}
        return h, cache

    def __call__(self, motion, timesteps, motion_mask=None, motion_length=None,
                 xf_out=None, xf_proj=None, num_intervals: int = 1, cond_type=None,
                 c=None, c_enc=None, mode: str = "test", train: bool = False,
                 step_cache=None, cache_flags=None, text_feats=None, **kwargs):
        src_mask = motion_mask[..., None] if motion_mask.ndim == 2 else motion_mask
        h, emb = self.base._embed(motion, timesteps)
        if self.base.use_text_proj and xf_proj is not None:
            emb = emb + xf_proj
        B, T = h.shape[:2]
        T_out = T * self.patch_size
        if c_enc is not None:  # pre-encoded outside the sampling scan
            c = c_enc.astype(h.dtype)
        elif c is not None:
            c = self.forward_c(c.astype(h.dtype), h.shape[1], train=train)

        if mode == "train":
            if c is not None and self.condition_cfg_enabled:
                c = c * ((cond_type % 10) > 0).astype(c.dtype)
            h = self._stack(h, xf_out, emb, src_mask, cond_type, motion_length,
                            num_intervals, c, train)
            output = self.base.out(h).reshape(B, T_out, -1)
        elif self.block_type == "mcm":
            # MCM ControlNet runs without CFG at test (controlnet_mcm.py:306-)
            h = self._stack(h, xf_out, emb, src_mask, None, motion_length,
                            num_intervals, c, False)
            output = self.base.out(h).reshape(B, T_out, -1)
        else:
            all_cond = jnp.concatenate([jnp.ones((B, 1, 1)), jnp.zeros((B, 1, 1))],
                                       axis=0)
            rep = lambda a: jnp.concatenate([a, a], axis=0)
            h2, xf2, emb2 = rep(h), rep(xf_out), rep(emb)
            mask2, ml2 = rep(src_mask), rep(motion_length)
            c2 = None
            if c is not None:
                c2 = rep(c)
                if self.condition_cfg_enabled:
                    c2 = c2 * all_cond.astype(c2.dtype)
            # text_feats are precomputed on the already-doubled batch
            tf2 = text_feats
            new_cache = None
            dedup = getattr(self.base, "cfg_layer0_dedup", False)
            if step_cache is not None:
                h2, new_cache = self._stack_cached(
                    h2, xf2, emb2, mask2, all_cond, ml2, num_intervals, c2,
                    step_cache, cache_flags, first_cfg_dedup=dedup,
                    text_feats=tf2)
            else:
                h2 = self._stack(h2, xf2, emb2, mask2, all_cond, ml2,
                                 num_intervals, c2, False,
                                 first_cfg_dedup=dedup, text_feats=tf2)
            out = self.base.out(h2).reshape(2 * B, T_out, -1)
            text_coef, none_coef = self.base.scale_func(timesteps[0])
            output = out[:B] * text_coef + out[B:] * none_coef
            if new_cache is not None:
                if self.base.use_residual_connection:
                    output = motion + output
                return output, new_cache
        if self.base.use_residual_connection:
            output = motion + output
        return output

    def init_all(self, motion, timesteps, motion_mask, motion_length, text_ids,
                 c=None, num_intervals: int = 1, **kwargs):
        enc = self.encode_text(text_ids)
        xf_proj, xf_out = enc if isinstance(enc, tuple) else (None, enc)
        return self(motion, timesteps, motion_mask=motion_mask,
                    motion_length=motion_length, xf_out=xf_out, xf_proj=xf_proj,
                    c=c, num_intervals=num_intervals, mode="test")


def init_control_blocks_from_base(params: dict, copy_blocks_num: int) -> dict:
    """Copy base decoder-layer weights into the control branch's copied blocks
    (the reference does this with load_state_dict at construction,
    controlnet.py:36-38)."""
    import copy as _copy
    params = jax.tree_util.tree_map(lambda x: x, dict(params))  # shallow-ish copy
    for i in range(copy_blocks_num):
        src = params["base_model"][f"block_{i}"]
        params[f"controlnet_{i}"]["copied_block"] = _copy.deepcopy(src)
    return params


# reference set_requires_grad selective-unfreeze modes (misc.py:16-75):
# which body-part embed/out heads stay TRAINABLE under each mode
UNFREEZE_MODE_PARTS = {
    "root": {"trans", "root", "body"},
    "root_face": {"trans", "root", "body", "face"},
    "root_hand": {"trans", "root", "body", "lhand", "rhand"},
    "root_face_hand": {"trans", "root", "body", "face", "lhand", "rhand"},
}

_ALL_PARTS = ("head", "stem", "larm", "rarm", "lleg", "rleg",
              "root", "trans", "face", "lhand", "rhand", "body")


def controlnet_frozen_prefixes(joint_embed_unfreeze: bool = True,
                               unfreeze_mode: str = "all") -> List[str]:
    """Optimizer-mask prefixes implementing the reference's set_requires_grad
    dance (controlnet.py:125-148): freeze base text towers, time embed,
    decoder blocks, sequence embedding; optionally unfreeze joint embed/out
    (fully or per body-part mode, misc.py:16-75)."""
    frozen = ["base_model/text_enc", "base_model/time_embed",
              "base_model/sequence_embedding"]
    frozen += [f"base_model/block_"]  # all base decoder layers
    if not joint_embed_unfreeze:
        frozen += ["base_model/joint_embed", "base_model/out"]
    elif unfreeze_mode != "all":
        keep = UNFREEZE_MODE_PARTS[unfreeze_mode]
        frozen += [f"base_model/joint_embed/{p}_embed"
                   for p in _ALL_PARTS if p not in keep]
        frozen += [f"base_model/out/{p}_out"
                   for p in _ALL_PARTS if p not in keep]
    return frozen


@SUBMODULES.register_module()
class ControlT2MHalfMCM(ControlT2MHalf):
    """MCM-based ControlNet (controlnet_mcm.py): same scheme over
    MCMTransformer blocks."""

    block_type: str = "mcm"
