"""Distributed-communication utilities.

The reference's explicit collectives (mogen/utils/dist_utils.py allreduce_grads,
apis/test.py collect_results_cpu/gpu, base_architecture._parse_losses
all_reduce) map to:
  - gradient all-reduce: emitted automatically by XLA from the batch sharding
    under pjit — ``allreduce_grads`` below exists for shard_map-style manual
    parallelism.
  - result collection across hosts: ``collect_results`` via
    multihost_utils.process_allgather (replaces the tmpdir-pickle/broadcast
    and padded-byte-tensor all_gather schemes).
  - log-var averaging: ``mean_across_hosts``.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np


def allreduce_grads(grads, axis_name: str = "data"):
    """Mean-all-reduce a grad pytree inside shard_map/pmap (dist_utils.py:9-42)."""
    return jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, axis_name), grads)


def mean_across_hosts(tree):
    """Average host-local scalars across processes (loss logging parity with
    base_architecture.py:52-55).  No-op in single-process runs."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(tree)
    return jax.tree_util.tree_map(lambda a: np.mean(np.asarray(a), axis=0), gathered)


def collect_results(local_results: List[Any], total_size: int = None) -> List[Any]:
    """Gather per-host result lists into the full ordered list
    (apis/test.py:85-163 equivalent).  Single-process: identity."""
    if jax.process_count() == 1:
        return local_results if total_size is None else local_results[:total_size]
    from jax.experimental import multihost_utils
    all_lists = multihost_utils.process_allgather(local_results, tiled=False)
    merged: List[Any] = []
    for part in all_lists:
        merged.extend(part)
    return merged if total_size is None else merged[:total_size]
