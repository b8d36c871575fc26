"""Tensor-parallel + sequence-parallel sharding rules (Megatron-style, GSPMD).

The reference scales with NCCL DDP only (SURVEY.md §2.6 — 8-GPU data
parallel, `mogen/apis/train.py`); the TPU design generalizes the mesh to
``(dcn, data, expert, tensor)``.  Tensor parallelism shards the wide
FFN-family weights over the ``tensor`` ICI axis:

- MoE expert FFNs (``expert_w1/w2`` — the bulk of flagship params): hidden
  dim column-parallel in, row-parallel out, composing with the existing
  ``expert``-axis sharding (a 2-D (expert, tensor) layout per weight).
- Per-head SFFN stacks (``w1/b1/w2``, models/blocks.py SFFN).
- Text-encoder FFNs (``linear1``/``linear2``), CLIP MLPs (``mlp_fc``/
  ``mlp_proj``) and the CLIP vocab embedding (rows over ``tensor``).

Under GSPMD, *correctness never depends on these specs* — XLA inserts the
collectives (one psum per column→row pair, the Megatron f/g functions) for
whatever layout is chosen; the rules here only pick the layout.  Attention
projections in this model family are small per-head (body-part) matrices and
stay replicated: sharding them would trade a cheap FLOP for an ICI
all-gather.  Numeric equivalence of the sharded step vs a single device is
asserted by tests/test_tensor_parallel.py and the driver dryrun.

Sequence parallelism: the batch's time axis is sharded over ``tensor``
(``sequence_sharding``) so LayerNorm/elementwise regions and the embedding
front run on T/n_tensor frames per device; XLA all-gathers at the first
time-mixing op.  Useful at long-context windows; at T≤196 it mainly bounds
activation memory.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, DCN_AXIS, EXPERT_AXIS
from .pp import PIPE_AXIS

TENSOR_AXIS = "tensor"

# Marker tokens used by the rules below; resolved to concrete mesh axis names
# (or dropped) in _resolve.
_EP = "__expert__"
_TP = "__tensor__"


def _key_name(entry) -> str:
    """Best-effort name for one pytree path entry (DictKey / GetAttrKey /
    SequenceKey / FlattenedIndexKey all stringify differently)."""
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def _tp_rule(names: Sequence[str], shape: Tuple[int, ...]) -> Optional[tuple]:
    """Raw (pre-resolution) spec for one leaf, or None to replicate.

    Matches on the trailing path names, so it applies uniformly to params
    and to the optimizer moments (adam mu/nu mirror the param dict under
    their own prefix).
    """
    if not names:
        return None
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""

    # MoE expert FFN (models/moe.py): [E, d, f], [E, f], [E, f, d], [E, d]
    if leaf == "expert_w1" and len(shape) == 3:
        return (_EP, None, _TP)
    if leaf == "expert_b1" and len(shape) == 2:
        return (_EP, _TP)
    if leaf == "expert_w2" and len(shape) == 3:
        return (_EP, _TP, None)
    if leaf == "expert_b2" and len(shape) == 2:
        return (_EP, None)

    # SFFN stacked per-head FFN (models/blocks.py): w1 [H, d, f], b1 [H, f],
    # w2 [H, f, d] (b2 [H, d] stays replicated — it adds after the psum)
    if leaf == "w1" and len(shape) == 3:
        return (None, None, _TP)
    if leaf == "b1" and len(shape) == 2:
        return (None, _TP)
    if leaf == "w2" and len(shape) == 3:
        return (None, _TP, None)

    # Column-parallel first linears: text-encoder FFN linear1, CLIP mlp_fc
    if parent in ("linear1", "mlp_fc"):
        if leaf == "kernel" and len(shape) == 2:
            return (None, _TP)
        if leaf == "bias" and len(shape) == 1:
            return (_TP,)
    # Row-parallel second linears (bias replicated: adds after the psum).
    # Plain FFN's linear2 is a ZeroDense -> path ends ('linear2','linear',
    # 'kernel'); the text encoder's is a plain Dense -> ('linear2','kernel').
    grandparent = names[-3] if len(names) >= 3 else ""
    if (parent in ("linear2", "mlp_proj")
            or (grandparent == "linear2" and parent == "linear")):
        if leaf == "kernel" and len(shape) == 2:
            return (_TP, None)

    # CLIP vocab embedding [V, width]: rows over tensor (the gather becomes
    # a one-hot matmul + psum under GSPMD; saves V*width replicated bytes)
    if parent == "token_embedding" and leaf == "embedding" and len(shape) == 2:
        return (_TP, None)
    return None


def _resolve(raw: Optional[tuple], shape: Tuple[int, ...], mesh: Mesh,
             expert_axis: Optional[str], tensor_axis: Optional[str]) -> P:
    if raw is None:
        return P()
    out = []
    for i, tok in enumerate(raw):
        axis = {_EP: expert_axis, _TP: tensor_axis, None: None}[tok]
        if (axis is None or axis not in mesh.axis_names
                or mesh.shape[axis] <= 1 or i >= len(shape)
                or shape[i] % mesh.shape[axis] != 0):
            out.append(None)  # axis absent / dim not divisible -> replicate
        else:
            out.append(axis)
    return P(*out)


def leaf_spec(path, leaf, mesh: Mesh, *, expert_axis: Optional[str] = EXPERT_AXIS,
              tensor_axis: Optional[str] = TENSOR_AXIS,
              pipe_axis: Optional[str] = PIPE_AXIS) -> P:
    names = [_key_name(p) for p in path]
    shape = tuple(getattr(leaf, "shape", ()) or ())
    if pipe_axis is not None and "stacked_blocks" in names and shape:
        # pipeline-parallel stacked block params [num_layers, ...]: shard the
        # layer axis over ``pipe`` (each stage holds its layer slice — this
        # is what makes pp relieve weight memory, parallel/pp.py); the tp/ep
        # rules apply to the trailing per-layer shape
        inner = _resolve(_tp_rule(names, shape[1:]), shape[1:], mesh,
                         expert_axis, tensor_axis)
        lead = (pipe_axis if (pipe_axis in mesh.axis_names
                              and mesh.shape[pipe_axis] > 1
                              and shape[0] % mesh.shape[pipe_axis] == 0)
                else None)
        return P(lead, *inner)
    return _resolve(_tp_rule(names, shape), shape, mesh, expert_axis, tensor_axis)


def tree_shardings(tree: Any, mesh: Mesh, *,
                   expert_axis: Optional[str] = EXPERT_AXIS,
                   tensor_axis: Optional[str] = TENSOR_AXIS):
    """NamedSharding pytree for any params-shaped tree (params, grads, a full
    TrainState — the adam mu/nu subtrees match by path suffix)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, leaf_spec(path, leaf, mesh,
                            expert_axis=expert_axis, tensor_axis=tensor_axis)),
        tree)


def shard_state(state, mesh: Mesh, **kw):
    """Place an existing (host or replicated) TrainState onto the mesh with
    tensor/expert-parallel weight layout."""
    return jax.device_put(state, tree_shardings(state, mesh, **kw))


def sequence_sharding(mesh: Mesh, *, tensor_axis: str = TENSOR_AXIS) -> NamedSharding:
    """[B, T, ...] activation sharding: batch over (dcn,) data, time over
    tensor — the sequence-parallel input layout."""
    batch = (DCN_AXIS, DATA_AXIS) if DCN_AXIS in mesh.axis_names else DATA_AXIS
    if tensor_axis in mesh.axis_names and mesh.shape[tensor_axis] > 1:
        return NamedSharding(mesh, P(batch, tensor_axis))
    return NamedSharding(mesh, P(batch))


def shard_batch_sp(batch: dict, mesh: Mesh, *, tensor_axis: str = TENSOR_AXIS) -> dict:
    """Sequence-parallel batch placement: [B, T, ...] arrays sharded
    (data, tensor), other arrays batch-sharded only.  The time axis must be
    divisible by the tensor axis size (window sizes are multiples of 8)."""
    from .mesh import batch_sharding

    seq = sequence_sharding(mesh, tensor_axis=tensor_axis)
    bsh = batch_sharding(mesh)

    def put(v):
        if not (hasattr(v, "shape") and getattr(v, "ndim", 0) > 0):
            return v
        if v.ndim >= 2 and v.shape[1] % mesh.shape.get(tensor_axis, 1) == 0:
            return jax.device_put(v, seq)
        return jax.device_put(v, bsh)

    return {k: put(v) for k, v in batch.items()}
