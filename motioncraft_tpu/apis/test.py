"""Testing API (reference mogen/apis/test.py:13-163).

``single_device_test`` runs batched sampling over a loader on the local
devices (one jit covers all local chips via the batch sharding);
``multi_host_test`` additionally gathers per-host result lists
(collect_results_cpu/gpu equivalent via process_allgather).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import numpy as np

from ..utils.dist_utils import collect_results


def single_device_test(arch, variables, data_loader, *, seed: int = 0,
                       limit: Optional[int] = None, logger=None,
                       compute_dtype=None) -> List[Dict[str, Any]]:
    import jax
    import jax.numpy as jnp

    sample_jit = jax.jit(lambda v, b, r: arch.sample(v, b, r,
                                                     compute_dtype=compute_dtype))
    rng = jax.random.PRNGKey(seed)
    results: List[Dict[str, Any]] = []
    bs = data_loader.batch_size
    t0 = time.time()
    for i, batch in enumerate(data_loader):
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if isinstance(v, np.ndarray) and np.issubdtype(v.dtype, np.number)}
        if arch.inference_type == "gt":
            pred = jbatch["motion"]
        else:
            if jbatch["motion"].shape[0] != bs:
                pad = bs - jbatch["motion"].shape[0]
                jbatch = {k: jnp.concatenate([v] + [v[-1:]] * pad)
                          for k, v in jbatch.items()}
            rng, sub = jax.random.split(rng)
            pred = sample_jit(variables, jbatch, sub)
        res = dict(batch)
        res["pred_motion"] = np.asarray(pred)[: len(batch["motion_metas"])]
        results.extend(arch.split_results(res))
        if logger and (i + 1) % 10 == 0:
            logger(f"{len(results)} samples in {time.time() - t0:.1f}s")
        if limit and len(results) >= limit:
            break
    return results[:limit] if limit else results


def multi_host_test(arch, variables, data_loader, *, total_size: Optional[int] = None,
                    seed: int = 0, **kwargs) -> List[Dict[str, Any]]:
    """Per-host sampling over this host's interleaved dataset slice
    (data_loader must be built with ``dist=True``) + ordered cross-host
    result gather (multi_gpu_test + collect_results, apis/test.py:28-163).
    Each sample is evaluated exactly once; the merged list is in dataset
    order, truncated to ``total_size`` (default: the full dataset)."""
    import jax
    if total_size is None:
        total_size = len(data_loader.dataset)
    local = single_device_test(arch, variables, data_loader,
                               seed=seed + jax.process_index(), **kwargs)
    return collect_results(local, total_size)
