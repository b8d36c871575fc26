"""Spatial-temporal GCN over body-part tokens (optional PoseEncoder graph).

Re-implements mogen/models/gnns/{stgcn,graph,gcn,tcn}.py in flax: Graph
adjacency construction on host (numpy), unit_gcn with adaptive
init/offset/importance adjacency, unit_tcn / multi-scale tcn, STGCNBlock and
the STGCN stage stack.  Data layout is [N, T, V, C] throughout (channels-last
— TPU-friendly; the reference permutes to NCTV for torch convs).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

EPS = 1e-4


# --------------------------------------------------------------------- graph
def edge2mat(link, num_node):
    A = np.zeros((num_node, num_node))
    for i, j in link:
        A[j, i] = 1
    return A


def normalize_digraph(A, dim=0):
    Dl = A.sum(dim)
    w = A.shape[1]
    Dn = np.zeros((w, w))
    for i in range(w):
        if Dl[i] > 0:
            Dn[i, i] = Dl[i] ** -1
    return A @ Dn


def get_hop_distance(num_node, edge, max_hop=1):
    A = np.eye(num_node)
    for i, j in edge:
        A[i, j] = 1
        A[j, i] = 1
    hop_dis = np.full((num_node, num_node), np.inf)
    transfer = [np.linalg.matrix_power(A, d) for d in range(max_hop + 1)]
    arrive = np.stack(transfer) > 0
    for d in range(max_hop, -1, -1):
        hop_dis[arrive[d]] = d
    return hop_dis


LAYOUTS = {
    # 8 body-part tokens: head stem larm rarm lleg rleg root body (graph.py:98-110)
    "smpl_parts": dict(
        num_node=8,
        inward=[(0, 1), (2, 1), (3, 1), (4, 1), (5, 1), (1, 6)],
        center=6),
    # 22 SMPL body joints
    "smpl_joints": dict(
        num_node=22,
        inward=[(11, 8), (8, 5), (5, 2), (10, 7), (7, 4), (4, 1), (21, 19),
                (19, 17), (17, 14), (20, 18), (18, 16), (16, 13), (15, 12),
                (12, 9), (14, 9), (13, 9), (9, 6), (6, 3), (3, 0), (2, 0), (1, 0)],
        center=0),
}


class Graph:
    """Skeleton graph -> stacked adjacency subsets [K, V, V] (graph.py:57-197)."""

    def __init__(self, layout="smpl_parts", mode="spatial", max_hop=1, **kwargs):
        spec = LAYOUTS[layout]
        self.num_node = spec["num_node"]
        self.inward = spec["inward"]
        self.center = spec["center"]
        self.outward = [(j, i) for i, j in self.inward]
        self.self_link = [(i, i) for i in range(self.num_node)]
        self.max_hop = max_hop
        self.hop_dis = get_hop_distance(self.num_node, self.inward, max_hop)
        self.A = getattr(self, mode)()

    def spatial(self):
        iden = edge2mat(self.self_link, self.num_node)
        inw = normalize_digraph(edge2mat(self.inward, self.num_node))
        outw = normalize_digraph(edge2mat(self.outward, self.num_node))
        return np.stack([iden, inw, outw])

    def stgcn_spatial(self):
        adj = np.zeros((self.num_node, self.num_node))
        adj[self.hop_dis <= self.max_hop] = 1
        norm_adj = normalize_digraph(adj)
        A = []
        for hop in range(self.max_hop + 1):
            close = np.zeros_like(adj)
            further = np.zeros_like(adj)
            for i in range(self.num_node):
                for j in range(self.num_node):
                    if self.hop_dis[j, i] == hop:
                        if self.hop_dis[j, self.center] >= self.hop_dis[i, self.center]:
                            close[j, i] = norm_adj[j, i]
                        else:
                            further[j, i] = norm_adj[j, i]
            A.append(close)
            if hop > 0:
                A.append(further)
        return np.stack(A)

    def binary_adj(self):
        return edge2mat(self.inward + self.outward, self.num_node)[None]


# -------------------------------------------------------------------- layers
class UnitGCN(nn.Module):
    """Graph conv with adaptive adjacency (gcn.py:9-85); x [N, T, V, C]."""

    out_channels: int
    A: np.ndarray  # [K, V, V]
    adaptive: Optional[str] = "importance"
    conv_pos: str = "pre"
    with_res: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        N, T, V, C = x.shape
        K = self.A.shape[0]
        A0 = jnp.asarray(self.A, jnp.float32)
        if self.adaptive == "init":
            A = self.param("A", lambda k: A0)
        elif self.adaptive == "offset":
            PA = self.param("PA", nn.initializers.uniform(1e-6), A0.shape)
            A = A0 + PA
        elif self.adaptive == "importance":
            PA = self.param("PA", nn.initializers.ones, A0.shape)
            A = A0 * PA
        else:
            A = A0

        res = 0
        if self.with_res:
            if C != self.out_channels:
                r = nn.Dense(self.out_channels, name="down_conv")(x)
                res = nn.BatchNorm(use_running_average=not train, name="down_bn")(r)
            else:
                res = x

        if self.conv_pos == "pre":
            h = nn.Dense(self.out_channels * K, name="conv")(x)
            h = h.reshape(N, T, V, K, self.out_channels)
            h = jnp.einsum("ntvkc,kvw->ntwc", h, A)
        else:
            h = jnp.einsum("ntvc,kvw->ntwkc", x, A).reshape(N, T, V, K * C)
            h = nn.Dense(self.out_channels, name="conv")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn")(h)
        return nn.relu(h + res)


class UnitTCN(nn.Module):
    """Temporal conv over T (tcn.py unit_tcn): kernel (k, 1), stride (s, 1)."""

    out_channels: int
    kernel_size: int = 9
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size + (self.kernel_size - 1) * (self.dilation - 1) - 1) // 2
        h = nn.Conv(self.out_channels, kernel_size=(self.kernel_size, 1),
                    strides=(self.stride, 1), padding=[(pad, pad), (0, 0)],
                    kernel_dilation=(self.dilation, 1), name="conv")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn")(h)
        return nn.Dropout(self.dropout)(h, deterministic=not train)


class MSTCN(nn.Module):
    """Multi-scale temporal conv (tcn.py mstcn): parallel dilated branches +
    max-pool branch + 1x1 branch, concatenated."""

    out_channels: int
    stride: int = 1
    dilations: Sequence[int] = (1, 2, 3, 4)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_branches = len(self.dilations) + 2
        bc = self.out_channels // num_branches
        rem = self.out_channels - bc * (num_branches - 1)
        outs = []
        for i, d in enumerate(self.dilations):
            h = nn.Dense(bc, name=f"branch_{i}_in")(nn.relu(x))
            h = UnitTCN(bc, kernel_size=3, stride=self.stride, dilation=d,
                        name=f"branch_{i}_tcn")(h, train=train)
            outs.append(h)
        # max-pool branch
        h = nn.Dense(bc, name="pool_in")(nn.relu(x))
        h = nn.max_pool(h, (3, 1), strides=(self.stride, 1), padding=((1, 1), (0, 0)))
        outs.append(nn.BatchNorm(use_running_average=not train, name="pool_bn")(h))
        # 1x1 branch
        h = nn.Conv(rem, (1, 1), strides=(self.stride, 1), name="one_by_one")(x)
        outs.append(nn.BatchNorm(use_running_average=not train, name="one_bn")(h))
        out = jnp.concatenate(outs, axis=-1)
        return nn.Dropout(self.dropout)(out, deterministic=not train)


class STGCNBlock(nn.Module):
    """gcn -> tcn + residual (stgcn.py:11-51)."""

    out_channels: int
    A: np.ndarray
    stride: int = 1
    residual: bool = True
    tcn_type: str = "unit_tcn"
    gcn_adaptive: Optional[str] = "importance"
    tcn_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        if not self.residual:
            res = 0
        elif C == self.out_channels and self.stride == 1:
            res = x
        else:
            res = UnitTCN(self.out_channels, kernel_size=1, stride=self.stride,
                          name="residual")(x, train=train)
        h = UnitGCN(self.out_channels, self.A, adaptive=self.gcn_adaptive,
                    name="gcn")(x, train=train)
        if self.tcn_type == "mstcn":
            h = MSTCN(self.out_channels, stride=self.stride, dropout=self.tcn_dropout,
                      name="tcn")(h, train=train)
        else:
            h = UnitTCN(self.out_channels, stride=self.stride, dropout=self.tcn_dropout,
                        name="tcn")(h, train=train)
        return nn.relu(h + res)


class STGCN(nn.Module):
    """Stage stack (stgcn.py:54-133); x [N, T, V, C] -> [N, T, V, base]."""

    graph_cfg: dict
    in_channels: int = 3
    base_channels: int = 64
    data_bn_type: str = "VC"
    ch_ratio: int = 2
    num_stages: int = 10
    inflate_stages: Sequence[int] = (5, 8)
    down_stages: Sequence[int] = (5, 8)
    tcn_type: str = "unit_tcn"
    gcn_adaptive: Optional[str] = "importance"
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        graph = Graph(**dict(self.graph_cfg))
        A = graph.A
        N, T, V, C = x.shape
        if self.data_bn_type in ("VC", "MVC"):
            flat = x.transpose(0, 2, 3, 1).reshape(N, V * C, T)
            flat = nn.BatchNorm(use_running_average=not train, axis=1,
                                name="data_bn")(flat)
            x = flat.reshape(N, V, C, T).transpose(0, 3, 1, 2)

        blocks = []
        base, cur_in = self.base_channels, self.in_channels
        if cur_in != base:
            blocks.append((base, 1, False))
            cur_in = base
        inflate = 0
        out = base
        for i in range(2, self.num_stages):
            if i in self.inflate_stages:
                inflate += 1
            out = int(self.base_channels * self.ch_ratio ** inflate + EPS)
            blocks.append((out, 1, True))
        blocks.append((self.base_channels, 1, True))

        for bi, (oc, stride, residual) in enumerate(blocks):
            x = STGCNBlock(oc, A, stride=stride, residual=residual,
                           tcn_type=self.tcn_type, gcn_adaptive=self.gcn_adaptive,
                           name=f"stage_{bi}")(x, train=train)
        return x
