"""Optimizer / train-state construction.

Mirrors the reference training recipe (mogen/apis/train.py + configs: Adam
lr=2e-4, step decay at epoch boundaries, optional grad clip) with optax.
Frozen subtrees (the CLIP text tower, ControlNet-frozen base blocks) are
masked out of the optimizer — the functional equivalent of
``set_requires_grad(..., False)`` (reference misc.py / controlnet.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    extra_variables: Any = None  # batch_stats etc.
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def path_freeze_mask(params, frozen_prefixes: Sequence[str]):
    """True = trainable. A param is frozen when any path component chain
    startswith one of the '/'-joined prefixes (e.g. 'text_enc/clip')."""

    def mask_fn(path, _):
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        return not any(path_str.startswith(pref) or f"/{pref}" in path_str
                       for pref in frozen_prefixes)

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def build_lr_schedule(base_lr: float, policy: Optional[dict] = None,
                      steps_per_epoch: int = 1) -> Callable:
    """mmcv lr_config equivalent: dict(policy='step', step=[10], gamma=0.1)."""
    if not policy or policy.get("policy", "fixed") == "fixed":
        return optax.constant_schedule(base_lr)
    if policy["policy"] == "step":
        gamma = policy.get("gamma", 0.1)
        milestones = policy["step"]
        if isinstance(milestones, int):
            milestones = [milestones]
        boundaries = {m * steps_per_epoch: gamma for m in milestones}
        return optax.piecewise_constant_schedule(base_lr, boundaries)
    if policy["policy"] == "CosineAnnealing":
        total = policy["total_steps"]
        return optax.cosine_decay_schedule(base_lr, total,
                                           alpha=policy.get("min_lr_ratio", 0.0))
    raise NotImplementedError(policy)


def build_optimizer(optimizer_cfg: dict,
                    lr_schedule: Optional[Callable] = None,
                    grad_clip: Optional[dict] = None,
                    frozen_prefixes: Sequence[str] = ("text_enc/clip",),
                    params=None) -> optax.GradientTransformation:
    """cfg like dict(type='Adam', lr=2e-4) (configs/stmogen/...0_125b.py:13)."""
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop("type", "Adam").lower()
    lr = lr_schedule if lr_schedule is not None else cfg.pop("lr", 2e-4)
    cfg.pop("lr", None)
    if opt_type == "adam":
        tx = optax.adam(lr, b1=cfg.get("betas", (0.9, 0.999))[0],
                        b2=cfg.get("betas", (0.9, 0.999))[1],
                        eps=cfg.get("eps", 1e-8))
    elif opt_type == "adamw":
        tx = optax.adamw(lr, weight_decay=cfg.get("weight_decay", 1e-2))
    elif opt_type == "sgd":
        tx = optax.sgd(lr, momentum=cfg.get("momentum", 0.9))
    elif opt_type == "adafactor":
        # the vendored timm optimizer collection's main non-Adam member
        tx = optax.adafactor(lr)
    elif opt_type == "adabelief":
        tx = optax.adabelief(lr)
    elif opt_type == "lamb":
        tx = optax.lamb(lr)
    else:
        raise NotImplementedError(opt_type)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip.get("max_norm", 1.0)), tx)
    if frozen_prefixes and params is not None:
        mask = path_freeze_mask(params, frozen_prefixes)
        tx = optax.chain(optax.masked(tx, mask))
    return tx


def create_train_state(params, optimizer_cfg: dict, lr_schedule=None,
                       grad_clip=None, frozen_prefixes=("text_enc/clip",),
                       extra_variables=None) -> TrainState:
    tx = build_optimizer(optimizer_cfg, lr_schedule, grad_clip, frozen_prefixes, params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), extra_variables=extra_variables, tx=tx)
