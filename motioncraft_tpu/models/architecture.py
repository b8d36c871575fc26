"""MotionDiffusion — couples a denoiser with train/test diffusions.

TPU-native redesign of
/root/reference/mogen/models/architectures/diffusion_architecture.py:57-204 and
base_architecture.py: the architecture is a thin host-side orchestrator whose
``loss`` and ``sample`` methods are pure jittable functions over (variables,
batch, rng).  Text encoding runs once per batch outside the sampling scan; the
scanned CFG-doubled denoiser step is the model's ``mode='test'`` path.  The
reference's ``dist.all_reduce`` of log vars becomes a no-op on a single
controller — under pjit the loss is already globally averaged by XLA.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import (build_diffusion, create_named_schedule_sampler,
                         ddim_sample_loop, p_sample_loop, training_losses)
from ..diffusion.sampling import Outpainting, RepaintConfig
from ..registry import ARCHITECTURES, build_loss, build_submodule
from .body_layout import SMPLX_FACE_DIMS, SMPLX_HAND_DIMS
from .tokenizer import tokenize


def _collect_loss_leaves(tree, key_name: str):
    """Sum every leaf under any dict key == key_name in a nested state tree."""
    total = 0.0
    found = False

    def walk(node):
        nonlocal total, found
        if isinstance(node, dict):
            for k, v in node.items():
                if k == key_name:
                    leaves = v if isinstance(v, (tuple, list)) else (v,)
                    for leaf in jax.tree_util.tree_leaves(leaves):
                        total = total + leaf
                        found = True
                else:
                    walk(v)

    walk(tree)
    return total if found else None


@ARCHITECTURES.register_module()
class MotionDiffusion:
    """Orchestrates training losses and inference sampling."""

    # ``sample`` reads batch['motion'] only for its (B, T, D) shape (and as
    # the returned value under inference_type='gt'); generation starts from
    # fresh noise.  Eval loops use this to skip the host->device transfer of
    # the motion array entirely (apis/test.py) — on a remote-runtime TPU the
    # protocol eval is transfer-bound, and the unused motion upload is half
    # the bytes.
    sample_ignores_motion_values = True

    def __init__(self,
                 model: Optional[dict] = None,
                 loss_recon: Optional[dict] = None,
                 loss_reduction: str = "frame",
                 diffusion_train: Optional[dict] = None,
                 diffusion_test: Optional[dict] = None,
                 sampler_type: str = "uniform",
                 init_cfg: Optional[dict] = None,
                 inference_type: str = "ddpm",
                 opt: Optional[Any] = None,
                 hand_loss_factor: float = 1.0,
                 face_no_loss: bool = False,
                 hand_no_loss: bool = False,
                 repaint: Optional[dict] = None,
                 **kwargs):
        self.inference_type = inference_type
        self.loss_reduction = loss_reduction
        self.hand_loss_factor = hand_loss_factor
        self.face_no_loss = face_no_loss
        self.hand_no_loss = hand_no_loss
        self.model_cfg = model
        self.model = build_submodule(model) if inference_type != "gt" else None
        self.loss_recon = build_loss(loss_recon) if loss_recon else None
        self.diffusion_train = build_diffusion(diffusion_train) if diffusion_train else None
        self.diffusion_test = build_diffusion(diffusion_test) if diffusion_test else None
        if self.diffusion_train is not None:
            self.sampler = create_named_schedule_sampler(
                sampler_type, self.diffusion_train.num_timesteps)
        self.repaint_cfg = RepaintConfig(**repaint) if isinstance(repaint, dict) else repaint
        self._post = self._load_post_process(model)

    # ------------------------------------------------------------------ setup
    def _load_post_process(self, model_cfg):
        cfg = (model_cfg or {}).get("post_process_cfg")
        if cfg and cfg.get("unnormalized_infer", False):
            mean = np.load(cfg["mean_path"]).astype(np.float32)
            std = np.load(cfg["std_path"]).astype(np.float32)
            return jnp.asarray(mean), jnp.asarray(std)
        return None

    def init(self, rng: jax.Array, example_batch: Dict[str, Any]):
        """Initialise model variables from an example batch.

        Jitted at a shrunken (B=1, T<=16) batch: parameter shapes do not
        depend on B/T (sequence/MoE embeddings size off static max_seq_len),
        and flax's default EAGER init of the flagship forward costs ~30 ms
        dispatch per op on remote-tunnel TPU runtimes — tens of minutes per
        process.  One tiny-shape compile replaces that; Pallas kernels are
        gated out of the init trace (size floors + no_pallas)."""
        motion = example_batch["motion"]
        B, T = motion.shape[:2]
        ts = min(T, 16)

        def shrink(a, time_axis_len):
            a = a[:1]
            if a.ndim >= 2 and time_axis_len:
                k = max(1, int(a.shape[1] * ts / T))
                a = a[:, :k]
            return np.asarray(a)

        text_ids = example_batch.get("text_ids")
        if text_ids is None:
            text_ids = jnp.asarray(tokenize(example_batch.get("text", [""])))

        from ..ops.kernel_gate import no_pallas

        def _init_fn(rng_, motion_, mask_, lengths_, text_ids_, c_=None):
            extra = {} if c_ is None else {"c": c_}
            with no_pallas():  # trace-time gate; kernels also size-floored
                return self.model.init(
                    {"params": rng_}, motion_,
                    jnp.zeros((motion_.shape[0],), jnp.int32),
                    motion_mask=mask_, motion_length=lengths_,
                    text_ids=text_ids_, method="init_all", **extra)

        jit_kwargs = {}
        try:
            m = jax.sharding.get_mesh()
            if m is not None and not getattr(m, "empty", True):
                # ambient mesh (e.g. multichip dryrun/train): pin params to
                # fully-replicated so downstream pjit in_shardings match
                jit_kwargs["out_shardings"] = jax.sharding.NamedSharding(
                    m, jax.sharding.PartitionSpec())
        except Exception:
            pass
        c = example_batch.get("c")
        return jax.jit(_init_fn, **jit_kwargs)(
            rng, shrink(motion, True),
            shrink(example_batch["motion_mask"], True),
            np.minimum(shrink(example_batch["motion_length"], False), ts),
            np.asarray(text_ids[:1]),
            *(() if c is None else (shrink(c, True),)))

    # ------------------------------------------------------------------ train
    def loss(self, variables, batch: Dict[str, Any], rng: jax.Array,
             num_intervals: int = 1) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Pure training-loss function (jit/pjit-able).

        Mirrors diffusion_architecture.py:106-162: timestep sampling, masked
        recon loss with face/hand masking and hand factor, MoE aux + template
        KL from the model's sown losses.
        """
        motion = batch["motion"].astype(jnp.float32)
        motion_mask = batch["motion_mask"].astype(jnp.float32)
        motion_length = batch["motion_length"]
        B = motion.shape[0]
        r_t, r_noise, r_cond, r_gate, r_drop = jax.random.split(rng, 5)

        t, _ = self.sampler.sample(r_t, B)
        noise = jax.random.normal(r_noise, motion.shape, motion.dtype)
        # 90% text / 10% unconditional dropout (stmogen.py:712)
        cond_type = jax.random.randint(r_cond, (B, 1, 1), 0, 100)

        state = {}

        def model_fn(x_t, t_model):
            nonlocal state
            enc = self.model.apply(variables, batch["text_ids"],
                                   method="encode_text", train=True,
                                   rngs={"dropout": r_drop})
            xf_proj, xf_out = enc if isinstance(enc, tuple) else (None, enc)
            out, st = self.model.apply(
                variables, x_t, t_model,
                motion_mask=motion_mask, motion_length=motion_length,
                xf_out=xf_out, xf_proj=xf_proj, num_intervals=num_intervals,
                cond_type=cond_type, c=batch.get("c"), mode="train", train=True,
                rngs={"gate_noise": r_gate, "dropout": r_drop},
                mutable=["losses", "batch_stats"])
            state = st
            return out

        out = training_losses(self.diffusion_train, model_fn, motion, t, noise)
        pred, target = out["pred"], out["target"]

        if self.face_no_loss and pred.shape[-1] == 322:
            m = jnp.ones_like(pred).at[:, :, SMPLX_FACE_DIMS[0]:SMPLX_FACE_DIMS[1]].set(0)
            pred, target = pred * m, target * m
        if self.hand_no_loss and pred.shape[-1] == 322:
            m = jnp.ones_like(pred).at[:, :, SMPLX_HAND_DIMS[0]:SMPLX_HAND_DIMS[1]].set(0)
            pred, target = pred * m, target * m

        recon = self.loss_recon(pred, target, reduction_override="none")
        if self.hand_loss_factor > 1.0 and pred.shape[-1] == 322:
            scale = jnp.ones_like(recon).at[:, :, SMPLX_HAND_DIMS[0]:SMPLX_HAND_DIMS[1]].set(
                self.hand_loss_factor)
            recon = recon * scale

        recon = recon.mean(axis=-1) * motion_mask
        recon_batch = recon.sum(axis=1) / jnp.maximum(motion_mask.sum(axis=1), 1e-8)
        recon_frame = recon.sum() / jnp.maximum(motion_mask.sum(), 1e-8)
        recon_loss = recon_frame if self.loss_reduction == "frame" else recon_batch.mean()

        log_vars = {"recon_loss": recon_loss}
        losses_state = state.get("losses", {})
        weights = (self.model.aux_loss_weights()
                   if hasattr(self.model, "aux_loss_weights") else {})
        aux = _collect_loss_leaves(dict(losses_state), "aux_loss")
        if aux is not None:
            log_vars["moe_route_loss"] = aux * weights.get("moe_route_loss", 1.0)
        kl = _collect_loss_leaves(dict(losses_state), "kl_loss")
        if kl is not None:
            log_vars["template_kl_loss"] = kl * weights.get("template_kl_loss", 1.0)

        total = sum(v for k, v in log_vars.items() if "loss" in k)
        log_vars["loss"] = total
        return total, {**log_vars, "t_mean": t.astype(jnp.float32).mean(),
                       "recon_loss_batch": recon_batch, "timesteps": t}

    # ---------------------------------------------------------------- sample
    def encode_text(self, variables, text_ids, clip_feat=None):
        return self.model.apply(variables, text_ids, clip_feat=clip_feat,
                                method="encode_text")

    def sample(self, variables, batch: Dict[str, Any], rng: jax.Array,
               num_intervals: int = 1,
               outpainting: Optional[Outpainting] = None,
               pre_seq: Optional[jnp.ndarray] = None,
               inference_type: Optional[str] = None,
               extra_model_kwargs: Optional[dict] = None,
               compute_dtype=None,
               step_cache=None):
        """Pure sampling function: noise -> motion (diffusion_architecture.py:163-204).

        ``step_cache``: optional ``StepCacheConfig`` (diffusion/stepcache.py)
        enabling SmoothCache-style per-layer residual reuse across DDIM steps
        — opt-in, ddim-only, supported models advertise
        ``supports_step_cache``.  With ``collect_errors=True`` the return
        value becomes ``(output, errors[steps, layers])`` for calibration."""
        motion = batch["motion"].astype(jnp.float32)
        B, T, D = motion.shape
        inference_type = inference_type or self.inference_type
        if inference_type == "gt":
            return motion

        motion_mask = batch["motion_mask"].astype(jnp.float32)
        motion_length = batch["motion_length"]
        xf_out = batch.get("xf_out")
        xf_proj = batch.get("xf_proj")
        if xf_out is None:
            enc = self.encode_text(variables, batch["text_ids"],
                                   batch.get("clip_feat"))
            xf_proj, xf_out = enc if isinstance(enc, tuple) else (None, enc)

        extra = extra_model_kwargs or {}
        if compute_dtype is not None:
            # bf16 inference: the denoiser runs in low precision, the diffusion
            # update (schedule math, noise mixing) stays f32
            xf_out = jax.tree_util.tree_map(
                lambda a: a.astype(compute_dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
                xf_out)

        # hoist the timestep-independent condition encoder (WavEncoder conv
        # stack) out of the DDIM scan: encoded once per call, not per step.
        # A pre-encoded ``c_enc`` in the batch (fused windowed sampler, which
        # encodes a whole chunk of windows in one conv call) wins over raw ``c``.
        c, c_enc = batch.get("c"), batch.get("c_enc")
        if c_enc is not None:
            if compute_dtype is not None:
                c_enc = c_enc.astype(compute_dtype)
            c = None
        elif c is not None and hasattr(type(self.model), "encode_condition"):
            c_enc = self.model.apply(variables, c.astype(jnp.float32), T,
                                     method="encode_condition")
            if compute_dtype is not None:
                c_enc = c_enc.astype(compute_dtype)
            c = None

        # hoist the DDIM-step-invariant text-branch MoE out of the scan:
        # every layer's text features depend only on xf_out, so compute them
        # ONCE per sampling call (on the undoubled batch) instead of per
        # step per CFG half (stmogen.py precompute_text_feats)
        text_feats = None
        if hasattr(type(self.model), "precompute_text_feats"):
            text_feats = self.model.apply(variables, xf_out,
                                          method="precompute_text_feats")

        cache0 = None
        if step_cache is not None:
            if inference_type != "ddim":
                raise ValueError("step caching requires inference_type='ddim'")
            if (getattr(step_cache, "collect_errors", False)
                    and outpainting is not None
                    and self.repaint_cfg is not None
                    and getattr(self.repaint_cfg, "same_overlap_noisy", False)):
                # both results ride the same tuple slot; dropping noisy_tail
                # silently would corrupt a windowed outpainting run
                raise ValueError(
                    "collect_errors cannot be combined with a tail-tracking "
                    "repaint config (same_overlap_noisy): the calibration "
                    "errors would replace the noisy_tail return — calibrate "
                    "on a plain run instead")
            if not getattr(self.model, "supports_step_cache", False):
                raise ValueError(f"{type(self.model).__name__} does not "
                                 "support step caching")
            cache0 = self.model.make_step_cache(
                B, T, compute_dtype or jnp.float32)

        def model_fn(x, t_model, cache=None, flags=None):
            xin = x.astype(compute_dtype) if compute_dtype is not None else x
            cache_kw = ({} if cache is None
                        else {"step_cache": cache, "cache_flags": flags})
            if text_feats is not None:
                cache_kw["text_feats"] = text_feats
            out = self.model.apply(
                variables, xin, t_model, motion_mask=motion_mask,
                motion_length=motion_length, xf_out=xf_out, xf_proj=xf_proj,
                num_intervals=num_intervals, c=c, c_enc=c_enc, mode="test",
                **cache_kw, **extra)
            if cache is None:
                return out.astype(jnp.float32)
            out, new_cache = out
            return out.astype(jnp.float32), new_cache

        r_noise, r_loop = jax.random.split(rng)
        noise = jax.random.normal(r_noise, (B, T, D), jnp.float32)

        if inference_type == "ddpm":
            output = p_sample_loop(self.diffusion_test, model_fn, noise, r_loop,
                                   clip_denoised=False, pre_seq=pre_seq)
            result = None
        elif inference_type == "ddim":
            result = ddim_sample_loop(self.diffusion_test, model_fn, noise, r_loop,
                                      eta=0.0, clip_denoised=False, pre_seq=pre_seq,
                                      outpainting=outpainting, repaint=self.repaint_cfg,
                                      step_cache0=cache0, cache_cfg=step_cache)
            output = result.sample
        else:
            raise NotImplementedError(inference_type)

        output = self.post_process(output)
        if result is not None and result.cache_errors is not None:
            return output, result.cache_errors
        if result is not None and result.noisy_tail is not None:
            return output, result.noisy_tail
        return output

    def post_process(self, motion):
        """De-normalize when the model config asks for unnormalized inference;
        model-specific post processing (e.g. MDM official-checkpoint root
        rescale) runs afterwards."""
        if self._post is not None:
            mean, std = self._post
            motion = motion * std + mean
        pp = getattr(type(self.model), "post_process", None) if self.model else None
        if pp is not None:
            motion = pp(self.model, motion)
        return motion

    # ------------------------------------------------------------------ util
    @staticmethod
    def split_results(results: Dict[str, Any]):
        """Batched device results -> list of per-sample host dicts
        (base_architecture.py:112-140)."""
        B = results["motion"].shape[0]
        to_host = lambda x: np.asarray(jax.device_get(x))
        out = []
        for i in range(B):
            item = {
                "motion": to_host(results["motion"][i]),
                "pred_motion": to_host(results["pred_motion"][i]),
                "motion_length": to_host(results["motion_length"][i]),
                "motion_mask": to_host(results["motion_mask"][i]),
            }
            item["pred_motion_length"] = to_host(
                results.get("pred_motion_length", results["motion_length"])[i])
            item["pred_motion_mask"] = to_host(
                results.get("pred_motion_mask", results["motion_mask"])[i])
            metas = results.get("motion_metas")
            if metas is not None:
                for key in ("text", "token"):
                    if key in metas[i]:
                        item[key] = metas[i][key]
            out.append(item)
        return out
