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


_MISSING = object()


def interleave_parts(part_list: List[List[Any]],
                     total_size: int = None) -> List[Any]:
    """zip-merge per-rank result lists back into sampler order and drop the
    round-up padding — the reference's ordered reassembly
    (apis/test.py:120-128: ``for res in zip(*part_list): extend``), extended
    with zip_longest so unequal part lengths (round_up=False) still merge."""
    import itertools
    merged: List[Any] = []
    for tup in itertools.zip_longest(*part_list, fillvalue=_MISSING):
        merged.extend(r for r in tup if r is not _MISSING)
    return merged if total_size is None else merged[:total_size]


def collect_results(local_results: List[Any], total_size: int = None) -> List[Any]:
    """Gather per-host result lists into the full ordered list.

    Each rank evaluated the interleaved slice ``indices[rank::world]``
    (RoundUpSampler), so the ordered full list is the zip-interleave of the
    per-rank parts truncated to ``total_size`` — the reference's
    collect_results_gpu scheme (apis/test.py:133-163): pickle the part,
    all-gather length-padded byte tensors, unpickle, zip-merge."""
    world = jax.process_count()
    if world == 1:
        return local_results if total_size is None else local_results[:total_size]
    import pickle
    from jax.experimental import multihost_utils
    buf = np.frombuffer(pickle.dumps(local_results), np.uint8)
    sizes = multihost_utils.process_allgather(np.array([buf.size], np.int64))
    sizes = np.asarray(sizes).reshape(world)
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[: buf.size] = buf
    stacked = np.asarray(multihost_utils.process_allgather(padded))
    part_list = [pickle.loads(stacked[r, : int(sizes[r])].tobytes())
                 for r in range(world)]
    return interleave_parts(part_list, total_size)
