"""Skeleton-convolution VAE encoder (VAESKConv) — the EMAGE S2G embedding
model loaded by the reference harness (tools/s2g_test.py:68-73,
EMAGE_2024/models/motion_representation.py:67-76).

TPU-native redesign: the skeleton-aware convolution (Aberman et al.) is a
dense Conv1d whose kernel is multiplied by a fixed binary neighborhood mask —
one masked MXU matmul instead of per-edge sliced convs; skeleton pooling is a
fixed pooling matrix matmul.  Topology/neighborhood/pooling structure is
computed on host from the SMPL-X kinematic tree.

Note: in the released harness the headline S2G FID is computed with the
SMPL-X contrastive evaluator's encode_motion (s2g_test.py:313-325), with
VAESKConv loaded alongside; both embedding models are provided here.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.fk import SMPLX_PARENTS
from ..registry import SUBMODULES


# ------------------------------------------------------------- host topology
def build_edge_topology(parents: Sequence[int]) -> List[Tuple[int, int]]:
    """(parent, child) edges + a virtual root edge (skeleton.py:316-323)."""
    joint_num = len(parents)
    edges = [(0, joint_num)]
    for i in range(1, joint_num):
        edges.append((int(parents[i]), i))
    return edges


def calc_edge_mat(edges):
    n = len(edges)
    mat = np.full((n, n), 100000, dtype=np.int64)
    np.fill_diagonal(mat, 0)
    for i, a in enumerate(edges):
        for j, b in enumerate(edges):
            if a[0] in b or a[1] in b:
                mat[i, j] = 1
    for k in range(n):
        mat = np.minimum(mat, mat[:, k:k + 1] + mat[k:k + 1, :])
    return mat


def find_neighbor(edges, d: int) -> List[List[int]]:
    mat = calc_edge_mat(edges)
    return [list(np.nonzero(mat[i] <= d)[0]) for i in range(len(edges))]


def skeleton_pooling(edges, last_pool: bool = False):
    """Edge-chain mean pooling lists + pooled edges (skeleton.py:160-227)."""
    degree = [0] * 200
    for e in edges:
        degree[e[0]] += 1
        degree[e[1]] += 1
    seq_list: List[List[int]] = []

    def find_seq(j, seq):
        if degree[j] > 2 and j != 0:
            seq_list.append(seq)
            seq = []
        if degree[j] == 1:
            seq_list.append(seq)
            return
        for idx, e in enumerate(edges):
            if e[0] == j:
                find_seq(e[1], seq + [idx])

    find_seq(0, [])
    pooling_list, new_edges = [], []
    for seq in seq_list:
        if last_pool:
            pooling_list.append(seq)
            continue
        if len(seq) % 2 == 1:
            pooling_list.append([seq[0]])
            new_edges.append(edges[seq[0]])
            seq = seq[1:]
        for i in range(0, len(seq), 2):
            pooling_list.append([seq[i], seq[i + 1]])
            new_edges.append((edges[seq[i]][0], edges[seq[i + 1]][1]))
    return pooling_list, new_edges


def pooling_matrix(pooling_list, edge_num, channels_per_edge) -> np.ndarray:
    W = np.zeros((len(pooling_list) * channels_per_edge,
                  edge_num * channels_per_edge), np.float32)
    for i, pair in enumerate(pooling_list):
        for j in pair:
            for c in range(channels_per_edge):
                W[i * channels_per_edge + c, j * channels_per_edge + c] = 1.0 / len(pair)
    return W


def neighbor_mask(neighbour_list, in_per_joint, out_per_joint, kernel_size) -> np.ndarray:
    """Binary [out, in, k] mask implementing SkeletonConv's weight masking."""
    J = len(neighbour_list)
    mask = np.zeros((J * out_per_joint, J * in_per_joint, kernel_size), np.float32)
    for i, nbrs in enumerate(neighbour_list):
        cols = [k * in_per_joint + c for k in nbrs for c in range(in_per_joint)]
        mask[i * out_per_joint:(i + 1) * out_per_joint, cols, :] = 1
    return mask


# ---------------------------------------------------------------- flax model
class MaskedConv1d(nn.Module):
    """Conv1d with a fixed binary kernel mask (SkeletonConv, skeleton.py:9-113)."""

    out_channels: int
    kernel_size: int
    stride: int
    padding: int
    mask: np.ndarray  # [out, in, k]

    @nn.compact
    def __call__(self, x):  # x [B, T, C]
        # flax kernel layout [k, in, out]
        kernel = self.param("weight", nn.initializers.lecun_normal(),
                            (self.kernel_size, x.shape[-1], self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        mask = jnp.asarray(np.transpose(self.mask, (2, 1, 0)))
        return jax.lax.conv_general_dilated(
            x, kernel * mask, window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            dimension_numbers=("NWC", "WIO", "NWC")) + bias


class SkeletonResidualBlock(nn.Module):
    """(conv+GN) + 1x1 shortcut -> pool -> tanh (skeleton.py:547-585)."""

    neighbour_list: tuple
    in_per_joint: int
    out_per_joint: int
    kernel_size: int
    stride: int
    pool_matrix: Optional[np.ndarray]

    @nn.compact
    def __call__(self, x):
        J = len(self.neighbour_list)
        out_channels = J * self.out_per_joint
        pad = (self.kernel_size - 1) // 2
        mask = neighbor_mask(self.neighbour_list, self.in_per_joint,
                             self.out_per_joint, self.kernel_size)
        res = MaskedConv1d(out_channels, self.kernel_size, self.stride, pad,
                           mask, name="conv")(x)
        res = nn.GroupNorm(num_groups=10, name="gn")(res)
        short_mask = neighbor_mask(self.neighbour_list, self.in_per_joint,
                                   self.out_per_joint, 1)
        short = MaskedConv1d(out_channels, 1, self.stride, 0, short_mask,
                             name="shortcut")(x)
        y = res + short
        if self.pool_matrix is not None:
            y = jnp.einsum("btc,dc->btd", y, jnp.asarray(self.pool_matrix))
        return jnp.tanh(y)


class LocalEncoderModule(nn.Module):
    """Skeleton-conv encoder stack (motion_encoder.py LocalEncoder:698-789).

    With the reference's eval settings (vae_layer=4, grow [1,1,2,1],
    st_mogen_emage.yaml:14-20) the SMPL-X topology pools 55 -> 35 -> 20
    edges and the output is naturally 20*12 = 240 = vae_length, matching
    the torch model which has no final projection; ``out_proj`` only
    exists when a non-reference layer count leaves a dim mismatch."""

    parents: tuple = tuple(int(p) for p in SMPLX_PARENTS)
    channel_base: int = 6
    num_layers: int = 4
    grow: tuple = (1, 1, 2, 1)
    kernel_size: int = 4
    skeleton_dist: int = 2
    z_dim: int = 1024
    vae_length: int = 240

    @nn.compact
    def __call__(self, x):  # x [B, T, J_edges*channel_base]
        topologies = [build_edge_topology(list(self.parents))]
        channel_base = [self.channel_base]
        for i in range(self.num_layers):
            channel_base.append(channel_base[-1] * self.grow[i])
        h = x
        for i in range(self.num_layers):
            edges = topologies[i]
            nbrs = tuple(tuple(n) for n in find_neighbor(edges, self.skeleton_dist))
            last_pool = i == self.num_layers - 1
            pooling_list, new_edges = skeleton_pooling(edges, last_pool)
            out_per = channel_base[i + 1]
            pool = pooling_matrix(pooling_list, len(edges), out_per)
            h = SkeletonResidualBlock(
                neighbour_list=nbrs, in_per_joint=channel_base[i],
                out_per_joint=out_per, kernel_size=self.kernel_size, stride=2,
                pool_matrix=pool if len(pooling_list) != len(edges) else None,
                name=f"layer_{i}")(h)
            topologies.append(new_edges if not last_pool else edges)
        if h.shape[-1] != self.vae_length:
            h = nn.Dense(self.vae_length, name="out_proj")(h)
        return h


def smplx322_to_rot6d(motion322: np.ndarray) -> np.ndarray:
    """[B, T, 322] -> [B, T, 55*6] per-joint rot6d (the VAESKConv input rep).

    Rebuilds the 55-joint axis-angle layout (body 0:66, jaw at 66:69 from
    322-dim 156:159, hands at 75:165 from 66:156) then converts via the
    continuous 6d representation."""
    from ..ops.rotation import ax_to_6v
    B, T = motion322.shape[:2]
    pose165 = np.zeros((B, T, 165), np.float32)
    pose165[..., :66] = motion322[..., :66]
    pose165[..., 66:69] = motion322[..., 156:159]
    pose165[..., 75:165] = motion322[..., 66:156]
    d6 = np.asarray(ax_to_6v(jnp.asarray(pose165.reshape(B, T, 55, 3))))
    return d6.reshape(B, T, 330)


@SUBMODULES.register_module()
class VAESKConv:
    """Skeleton-conv VAE embedding model (motion_representation.py:31-76):
    ``map2latent`` returns the per-window latent used for S2G FID.

    ``variational=False`` (the reference's AESKConv eval setting,
    st_mogen_emage.yaml:20) skips fc_mu, as VAEConv.map2latent does."""

    def __init__(self, vae_length: int = 240, vae_layer: int = 4,
                 vae_test_dim: int = 330, vae_grow=(1, 1, 2, 1),
                 variational: bool = False,
                 init_cfg: Optional[dict] = None, seed: int = 0, **kwargs):
        self.variational = variational
        self.encoder = LocalEncoderModule(num_layers=vae_layer, grow=tuple(vae_grow),
                                          vae_length=vae_length)
        self.fc_mu = nn.Dense(vae_length)
        key = jax.random.PRNGKey(seed)
        x0 = jnp.zeros((1, 16, vae_test_dim))
        self.enc_params = self.encoder.init(key, x0)
        h0 = self.encoder.apply(self.enc_params, x0)
        self.mu_params = self.fc_mu.init(key, h0)
        if variational:
            self._map = jax.jit(lambda ep, mp, x: self.fc_mu.apply(
                mp, self.encoder.apply(ep, x)))
        else:
            self._map = jax.jit(lambda ep, mp, x: self.encoder.apply(ep, x))
        if init_cfg and init_cfg.get("type") == "Pretrained":
            import os
            if os.path.isfile(init_cfg["checkpoint"]):
                from ..utils.torch_convert import load_vaeskconv_ckpt
                self.enc_params, self.mu_params = load_vaeskconv_ckpt(
                    init_cfg["checkpoint"], self.enc_params, self.mu_params)
            else:
                print(f"[VAESKConv] checkpoint {init_cfg['checkpoint']} not found; "
                      "random weights")

    def map2latent(self, x) -> jnp.ndarray:
        """x [B, T, vae_test_dim] (per-edge rot6d features) -> [B, T', latent]."""
        return self._map(self.enc_params, self.mu_params, jnp.asarray(x, jnp.float32))

    def encode_motion(self, motion, motion_length=None, motion_mask=None, **kw):
        """Drop-in harness evaluator: accepts raw 322-d SMPL-X motion and
        converts to the 55-joint rot6d rep the torch model was trained on
        (EMAGE trainers keep pose in rot6d, camn_trainer.py:208-215)."""
        motion = np.asarray(motion, np.float32)
        if motion.shape[-1] != 330:
            motion = smplx322_to_rot6d(motion)
        # trim to a multiple of the temporal downsampling factor
        step = 2 ** self.encoder.num_layers
        T = (motion.shape[1] // step) * step
        lat = self.map2latent(motion[:, :T] if T else motion)
        return lat.mean(axis=1)
