"""Multi-optimizer builder (reference mogen/core/optimizer/builder.py:8-52).

``build_optimizers(params, cfgs)``: when every value of ``cfgs`` is itself an
optimizer dict keyed by a top-level param subtree name (GAN-style per-module
optimizers, used with the DistributedDataParallelWrapper in the reference),
the result is one ``optax.multi_transform`` routing each subtree to its own
optimizer; a single flat config returns one transform."""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax

from .train_state import build_optimizer


def build_optimizers(params: Any, cfgs: Dict) -> optax.GradientTransformation:
    if cfgs and all(isinstance(v, dict) for v in cfgs.values()) and \
            "type" not in cfgs:
        top_keys = set(params.keys())
        missing = [k for k in cfgs if k not in top_keys]
        if missing:
            raise KeyError(f"optimizer keys {missing} not found among param "
                           f"subtrees {sorted(top_keys)}")
        transforms = {k: build_optimizer(dict(cfg), frozen_prefixes=())
                      for k, cfg in cfgs.items()}

        def label_fn(tree):
            return {k: jax.tree_util.tree_map(lambda _: k, v)
                    for k, v in tree.items()}

        return optax.multi_transform(transforms, label_fn)
    return build_optimizer(dict(cfgs), frozen_prefixes=())
