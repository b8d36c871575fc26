"""Checkpoint save/load/resume with orbax.

Replaces mmcv checkpointing (checkpoint_config interval=1,
load_checkpoint(map_location='cpu'), runner.resume — SURVEY.md §5): orbax
handles the device-aware serialization; torch ``.pth`` checkpoints are
imported through utils/torch_convert.py.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _manager(ckpt_dir: str, max_to_keep: Optional[int] = None):
    import orbax.checkpoint as ocp
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir), options=options)


def save_checkpoint(ckpt_dir: str, state: Any, step: int,
                    max_to_keep: Optional[int] = None) -> None:
    import orbax.checkpoint as ocp
    mgr = _manager(ckpt_dir, max_to_keep)
    # tx (the optax transform) is a static aux field and not serializable
    payload = {"step": int(step),
               "params": state.params,
               "opt_state": state.opt_state,
               "extra_variables": state.extra_variables or {}}
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    return mgr.latest_step()


def load_checkpoint(ckpt_dir: str, state: Any, step: Optional[int] = None):
    """Restore a TrainState saved by save_checkpoint; shapes from `state`."""
    import orbax.checkpoint as ocp
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found under {ckpt_dir}")
    template = {"step": 0, "params": state.params, "opt_state": state.opt_state,
                "extra_variables": state.extra_variables or {}}
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    return state.replace(step=restored["step"], params=restored["params"],
                         opt_state=restored["opt_state"],
                         extra_variables=restored["extra_variables"] or None)


def save_params(path: str, variables: Any) -> None:
    """Flat-file param snapshot (.npz of flattened paths) — light-weight
    interchange for eval/visualize tools."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(jax.device_get(node))

    walk("", variables)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_params(path: str) -> dict:
    data = np.load(path, allow_pickle=False)
    tree: dict = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree


def align_block_layout(model_cfg: dict, tree):
    """Match block-param storage to the model's pipeline setting: a
    ``pipeline_axis`` model stores decoder blocks stacked ``[num_layers,...]``
    under ``stacked_blocks`` (sharded over ``pipe`` — parallel/pp.py), a
    plain model stores per-layer ``block_{i}`` subtrees.  Checkpoints in the
    other layout are converted transparently so pipeline-trained weights
    evaluate on one chip and vice versa."""
    sub = model_cfg.get("model", {}) if isinstance(model_cfg, dict) else {}
    want_stacked = sub.get("pipeline_axis") is not None
    params = tree.get("params", tree) if isinstance(tree, dict) else tree
    if not isinstance(params, dict):
        return tree
    if want_stacked and "block_0" in params and "stacked_blocks" not in params:
        from ..parallel.pp import stack_block_params
        new = stack_block_params(dict(params), sub["num_layers"])
    elif not want_stacked and "stacked_blocks" in params:
        from ..parallel.pp import unstack_block_params
        new = unstack_block_params(dict(params))
    else:
        return tree
    if isinstance(tree, dict) and "params" in tree:
        return {**tree, "params": new}
    return new


def load_eval_variables(model_cfg: dict, variables, checkpoint=None,
                        torch_checkpoint=None):
    """Load evaluation weights into initialized variables.

    ``torch_checkpoint`` accepts the released .pth formats: merged
    base+control ControlT2MHalf ckpts (reference README.md:241,
    controlnet.py:427-439), base-only STMoGen ckpts, and MCM ckpts —
    dispatched on the config's submodule type.  ``checkpoint`` is our own
    .npz param dump.  Block-param storage is aligned to the model's
    pipeline setting afterwards (``align_block_layout``)."""
    out = _load_eval_variables(model_cfg, variables, checkpoint,
                               torch_checkpoint)
    return align_block_layout(model_cfg, out)


def _load_eval_variables(model_cfg: dict, variables, checkpoint=None,
                         torch_checkpoint=None):
    def _ffn_heads(cfg: dict) -> int:
        # build_temporal_blocks also accepts a per-layer list of ffn_cfgs;
        # the reference's head count is uniform across layers, so take [0]
        ffn = cfg.get("ffn_cfg", {})
        if isinstance(ffn, (list, tuple)):
            ffn = ffn[0] if ffn else {}
        return ffn.get("num_heads", 1)

    if torch_checkpoint:
        from .torch_convert import (load_controlnet_ckpt, load_finemogen_ckpt,
                                    load_mcm_ckpt, load_mdm_ckpt,
                                    load_motiondiffuse_ckpt,
                                    load_remodiffuse_ckpt, load_stmogen_ckpt)
        sub = model_cfg["model"]
        t = sub["type"]
        if t in ("ControlT2MHalf", "ControlT2MHalfMCM"):
            bm = sub["base_model"]
            te = bm.get("text_encoder", {})
            return load_controlnet_ckpt(
                torch_checkpoint, variables, bm["num_layers"],
                _ffn_heads(bm),
                sub.get("copy_blocks_num", 2), te.get("num_layers", 2),
                te.get("clip_layers", 12),
                block_type="mcm" if "MCM" in t else "stmogen")
        te = sub.get("text_encoder", {})
        if t == "MCMTransformer":
            return load_mcm_ckpt(torch_checkpoint, variables,
                                 sub["num_layers"], te.get("num_layers", 4),
                                 te.get("clip_layers", 12))
        if t == "MDMTransformer":
            return load_mdm_ckpt(torch_checkpoint, variables,
                                 sub.get("num_layers", 8),
                                 sub.get("clip_layers", 12))
        if t == "MotionDiffuseTransformer":
            return load_motiondiffuse_ckpt(
                torch_checkpoint, variables, sub["num_layers"],
                te.get("num_layers", 4), te.get("clip_layers", 12))
        if t in ("ReMoDiffuseTransformer", "MoMatMoGenTransformer"):
            rc = sub.get("retrieval_cfg", {})
            return load_remodiffuse_ckpt(
                torch_checkpoint, variables, sub["num_layers"],
                rc.get("num_motion_layers", 4), rc.get("num_layers", 2),
                te.get("num_layers", 2), te.get("clip_layers", 12))
        if t == "FineMoGenTransformer":
            return load_finemogen_ckpt(
                torch_checkpoint, variables, sub["num_layers"], _ffn_heads(sub),
                te.get("num_layers", 2), te.get("clip_layers", 12))
        return load_stmogen_ckpt(
            torch_checkpoint, variables, sub["num_layers"], _ffn_heads(sub),
            te.get("num_layers", 2), te.get("clip_layers", 12))
    if checkpoint:
        return load_params(checkpoint)
    return variables
