"""Pipeline parallelism: a GPipe microbatch schedule over a ``pipe`` mesh axis.

The reference has no pipeline path (DDP only); this is the TPU-native way to
spread a deep decoder stack across chips when its weights outgrow one HBM:
layer params carry a leading stacked-layer axis sharded over ``pipe`` (each
device holds ``n_layers / n_stages`` contiguous layers), activations flow
stage-to-stage over ICI via ``lax.ppermute``, and microbatches keep every
stage busy outside the (S-1)-tick warmup/drain bubbles.  Built on
``jax.shard_map`` so it composes with the ``data`` axis (the local batch is
the data shard) and differentiates end-to-end for training.

MoE note: each microbatch routes independently — the same semantics as the
reference's Tutel-under-DDP, where every GPU routes its local batch
(capacity/drops computed per rank), and unlike the global-batch routing the
GSPMD data-parallel path gets for free.  Parity tests therefore compare the
pipeline against a per-microbatch sequential application (bit-comparable),
not against full-batch routing.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def gpipe(layer_fn: Callable[[Any, jnp.ndarray, Any], Tuple[jnp.ndarray, jnp.ndarray]],
          stacked_params: Any,
          x: jnp.ndarray,
          consts: Any,
          *,
          n_microbatch: int,
          axis: str = PIPE_AXIS,
          data_axis: Optional[Union[str, Sequence[str]]] = DATA_AXIS,
          mesh=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ``n_layers`` applications of ``layer_fn`` as a GPipe pipeline.

    Args:
      layer_fn: ``(one_layer_params, x_mb, consts_mb) -> (y_mb, aux_scalar)``;
        ``y_mb`` must have ``x_mb``'s shape (a residual-stack layer).
      stacked_params: pytree whose leaves carry a leading ``n_layers`` axis
        (``jnp.stack`` of the per-layer params); sharded over ``axis``.
      x: ``[B, ...]`` input activations.
      consts: pytree of ``[B, ...]`` per-sample conditioning arrays that ride
        along with each microbatch (text features, time emb, masks, ...).
      n_microbatch: M; B (the per-data-shard batch) must be divisible by it.
      axis: pipeline mesh axis name; ``n_layers`` must be divisible by its
        size, each stage running ``n_layers / S`` layers back-to-back.
      data_axis: mesh axis (or axes tuple) the batch dim is sharded over;
        None for a replicated batch.
      mesh: defaults to the ambient ``jax.set_mesh`` mesh.

    Returns:
      ``(out, aux)``: out is ``[B, ...]`` (same sharding as x), aux is the
      mean over microbatches of the per-microbatch aux sums, pmean'd over
      the data axis — matching the full-batch mean that the sequential
      path's sown aux losses produce.
    """
    if mesh is None:  # works both inside jit (abstract) and eagerly
        mesh = jax.sharding.get_abstract_mesh()
        if not mesh.axis_names:
            mesh = jax.sharding.get_mesh()
    S = mesh.shape[axis]
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % S:
        raise ValueError(f"{n_layers} layers not divisible by {S} pipeline stages")
    M = int(n_microbatch)

    if data_axis is None:
        b_axes: tuple = ()
    elif isinstance(data_axis, str):
        b_axes = (data_axis,) if data_axis in mesh.axis_names else ()
    else:
        b_axes = tuple(a for a in data_axis if a in mesh.axis_names)
    b_spec = P(b_axes) if b_axes else P()

    p_specs = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    c_specs = jax.tree_util.tree_map(lambda _: b_spec, consts)

    def body(params_local, x_loc, consts_loc):
        # scalar scan carries must be typed as varying over the manual axes
        # (shard_map vma typing) since the tick body mixes them with
        # device-varying values
        def varying(v):
            have = getattr(jax.typeof(v), "vma", frozenset())
            missing = tuple(a for a in mesh.axis_names if a not in have)
            return lax.pcast(v, missing, to="varying") if missing else v

        sid = lax.axis_index(axis)
        Bl = x_loc.shape[0]
        if Bl % M:
            raise ValueError(f"local batch {Bl} not divisible by {M} microbatches")
        mb = Bl // M
        xm = x_loc.reshape((M, mb) + x_loc.shape[1:])
        cm = jax.tree_util.tree_map(
            lambda c: c.reshape((M, mb) + c.shape[1:]), consts_loc)

        # aux may be any pytree of scalars with a static structure
        aux_struct = jax.eval_shape(
            lambda pl: layer_fn(
                jax.tree_util.tree_map(lambda l: l[0], pl), xm[0],
                jax.tree_util.tree_map(lambda c: c[0], cm))[1],
            params_local)

        def aux_zeros():
            return jax.tree_util.tree_map(
                lambda s: varying(jnp.zeros((), jnp.float32)), aux_struct)

        def run_stage(xin, cin, valid):
            def one_layer(carry, p):
                y, aux = layer_fn(p, carry[0], cin)
                acc = jax.tree_util.tree_map(
                    lambda a, b: a + jnp.asarray(b, jnp.float32),
                    carry[1], aux)
                return (y, acc), None
            (y, aux), _ = lax.scan(one_layer, (xin, aux_zeros()),
                                   params_local)
            return y, jax.tree_util.tree_map(lambda a: a * valid, aux)

        def tick(carry, t):
            state, outbuf, aux_tot = carry
            k = t - sid                       # microbatch this stage works on
            valid = ((k >= 0) & (k < M)).astype(jnp.float32)
            kc = jnp.clip(k, 0, M - 1)
            xin = jnp.where(sid == 0, xm[kc], state)
            cin = jax.tree_util.tree_map(lambda c: c[kc], cm)
            y, aux = run_stage(xin, cin, valid)
            nxt = lax.ppermute(y, axis, [(i, (i + 1) % S) for i in range(S)])
            oidx = t - (S - 1)                # finished microbatch index
            write = (sid == S - 1) & (oidx >= 0)
            outbuf = jnp.where(
                write, outbuf.at[jnp.clip(oidx, 0, M - 1)].set(y), outbuf)
            acc = jax.tree_util.tree_map(lambda a, b: a + b, aux_tot, aux)
            return (nxt, outbuf, acc), None

        state0 = varying(jnp.zeros_like(xm[0]))
        (_, outbuf, aux_tot), _ = lax.scan(
            tick, (state0, varying(jnp.zeros_like(xm)), aux_zeros()),
            jnp.arange(M + S - 1))
        # outputs live on the last stage; broadcast over the pipe ring
        out = lax.psum(jnp.where(sid == S - 1, outbuf, jnp.zeros_like(outbuf)),
                       axis)

        def finish_aux(a):                    # mean of per-microbatch sums
            a = lax.psum(a, axis) / M
            for ax in b_axes:
                a = lax.pmean(a, ax)
            return a

        aux = jax.tree_util.tree_map(finish_aux, aux_tot)
        return out.reshape((Bl,) + x_loc.shape[1:]), aux

    return jax.shard_map(body, mesh=mesh,
                         in_specs=(p_specs, b_spec, c_specs),
                         out_specs=(b_spec, P()))(stacked_params, x, consts)


def stack_block_params(params: dict, num_layers: int, *,
                       prefix: str = "block_",
                       stacked_name: str = "stacked_blocks") -> dict:
    """Per-layer ``block_{i}`` param subtrees -> one ``stacked_blocks``
    subtree with a leading [num_layers] axis (the layout a
    ``pipeline_axis`` model stores natively, sharded over ``pipe`` by
    tp.tree_shardings).  Use when loading a plain/converted checkpoint into a
    pipelined model.  Non-block entries pass through unchanged."""
    params = dict(params)
    blocks = []
    for i in range(num_layers):
        key = f"{prefix}{i}"
        if key not in params:
            raise KeyError(f"missing per-layer params '{key}' "
                           f"(have: {sorted(params)})")
        blocks.append(dict(params.pop(key)))
    params[stacked_name] = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *blocks)
    return params


def unstack_block_params(params: dict, *, prefix: str = "block_",
                         stacked_name: str = "stacked_blocks") -> dict:
    """Inverse of ``stack_block_params``: split the stacked subtree back into
    per-layer ``block_{i}`` entries (plain-model layout, e.g. to evaluate a
    pipeline-trained checkpoint on one chip)."""
    params = dict(params)
    stacked = params.pop(stacked_name)
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(n):
        params[f"{prefix}{i}"] = jax.tree_util.tree_map(
            lambda x, i=i: x[i], stacked)
    return params
