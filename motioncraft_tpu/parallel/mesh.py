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
DCN_AXIS = "dcn"
TENSOR_AXIS = "tensor"  # Megatron-style weight sharding; rules in tp.py


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host entry (the reference's init_dist / torch.distributed.launch
    equivalent, tools/dist_train.sh:8-9 + mmcv init_dist).

    On TPU pods the arguments are auto-detected from the environment; on
    other platforms pass them explicitly (or set JAX coordination env vars).
    Safe to call when single-process: becomes a no-op.  Returns process_id.
    """
    if num_processes == 1 or (coordinator_address is None
                              and num_processes is None
                              and jax.process_count() == 1
                              and "JAX_COORDINATOR_ADDRESS" not in
                              __import__("os").environ):
        return jax.process_index()
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_index()


def create_mesh(n_devices: Optional[int] = None,
                axes: Tuple[str, ...] = (DATA_AXIS, EXPERT_AXIS),
                shape: Optional[Tuple[int, ...]] = None,
                dcn_axis: bool = False) -> Mesh:
    """Build a mesh over the first n devices.

    Default factorization puts as much as possible on ``data`` and up to 2 on
    ``expert`` (experts are small; data-parallel is the scaling axis for
    <=0.25B models, matching the reference's 8-GPU DDP recipe).

    With ``dcn_axis`` (multi-slice / multi-host over data-center network) the
    leading axis is ``dcn`` with one entry per process, laid out so that the
    slower DCN links only carry the gradient all-reduce for that axis while
    ``data``/``expert`` collectives stay on ICI — use
    ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` semantics.
    """
    if dcn_axis:
        from jax.experimental import mesh_utils
        n_proc = jax.process_count()
        per_proc = len(jax.devices()) // n_proc
        expert = 2 if per_proc % 2 == 0 and per_proc >= 2 else 1
        # the dcn axis groups by PROCESS unless the platform reports exactly
        # one distinct slice per process (true multi-slice TPU); CPU-simulated
        # meshes and single-slice pods both fall back to process granules
        slices = {getattr(d, "slice_index", None) for d in jax.devices()}
        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, per_proc // expert, expert),
            dcn_mesh_shape=(n_proc, 1, 1),
            process_is_granule=len(slices) != n_proc or None in slices)
        return Mesh(dev_array, (DCN_AXIS,) + tuple(axes[:2]))
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        else:
            # default: up to 2 on each non-data axis (expert/tensor),
            # remainder on data — data-parallel is the scaling axis for
            # <=0.25B models (the reference's own 8-GPU DDP recipe)
            sizes = []
            rem = n
            for _ in axes[1:]:
                s = 2 if rem % 2 == 0 and rem >= 2 else 1
                sizes.append(s)
                rem //= s
            shape = (rem,) + tuple(sizes)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over the data axis (and dcn when present);
    replicate the rest."""
    if DCN_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P((DCN_AXIS, DATA_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a host batch dict onto the mesh, batch-sharded over 'data'.

    Single-process: a plain sharded device_put.  Multi-process: each host
    holds only its interleaved loader slice (build_dataloader(dist=True)), so
    the global array is assembled from process-local shards."""
    sh = batch_sharding(mesh)
    multiproc = jax.process_count() > 1

    def put(v):
        if not (hasattr(v, "shape") and getattr(v, "ndim", 0) > 0):
            return v
        if multiproc:
            return jax.make_array_from_process_local_data(sh, np.asarray(v))
        return jax.device_put(v, sh)

    return {k: put(v) for k, v in batch.items()}


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    return global_batch // mesh.shape[DATA_AXIS]
