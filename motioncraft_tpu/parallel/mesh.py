"""Device mesh + sharding helpers.

The reference scales with NCCL DDP (+ Tutel expert-parallel all-to-all); the
TPU-native equivalent is a ``jax.sharding.Mesh`` over ICI with XLA-inserted
collectives (SURVEY.md §2.6).  We use two axes:
  - ``data``: batch data-parallel (DDP equivalent; grad all-reduce emitted by XLA)
  - ``expert``: MoE expert sharding (Tutel all-to-all equivalent — the one-hot
    dispatch einsum becomes a reduce-scatter/all-gather pair under pjit)
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
EXPERT_AXIS = "expert"


def create_mesh(n_devices: Optional[int] = None,
                axes: Tuple[str, ...] = (DATA_AXIS, EXPERT_AXIS),
                shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Build a mesh over the first n devices.

    Default factorization puts as much as possible on ``data`` and up to 2 on
    ``expert`` (experts are small; data-parallel is the scaling axis for
    <=0.25B models, matching the reference's 8-GPU DDP recipe).
    """
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        else:
            expert = 2 if n % 2 == 0 and n >= 2 else 1
            shape = (n // expert, expert) + (1,) * (len(axes) - 2)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a host batch dict onto the mesh, batch-sharded over 'data'."""
    sh = batch_sharding(mesh)
    return {k: (jax.device_put(v, sh) if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0
                else v)
            for k, v in batch.items()}


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    return global_batch // mesh.shape[DATA_AXIS]
