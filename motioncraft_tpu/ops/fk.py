"""Batched SMPL-X forward kinematics in JAX.

Re-implements the reference SMPLX_Skeleton (mogen/models/utils/vis.py:477-684):
axis-angle pose [*, 165 or 156] + root translation -> 55 global joint
positions, via Rodrigues + a rigid-transform chain over the static SMPL-X
kinematic tree.  The chain is a python loop over 55 joints (static under jit,
55 tiny matmuls — XLA fuses these fine; the batch dim carries the MXU work).

Rest-pose joint locations come from the SMPL-X neutral body asset
(``smplx_neu_J_1.npy`` in the reference, or a SMPL-X npz body model);
``default_rest_joints`` provides an approximate skeleton so tests and dry
runs work without assets (vertex-accurate metrics need the real file).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .rotation import axis_angle_to_matrix

# SMPL-X 55-joint kinematic tree (vis.py:198)
SMPLX_PARENTS = np.array([
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    15, 15, 15,
    20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,
    21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53], dtype=np.int32)

NUM_JOINTS = 55


def default_rest_joints() -> np.ndarray:
    """Approximate neutral SMPL-X rest joints [55, 3] (meters, y-up).

    Hand-authored from standard SMPL-X proportions; good enough for smoke
    tests and relative-motion metrics, NOT for vertex-level parity."""
    J = np.zeros((NUM_JOINTS, 3), np.float32)
    # body
    J[0] = [0, 0, 0]          # pelvis
    J[1] = [0.06, -0.09, 0]   # left hip
    J[2] = [-0.06, -0.09, 0]  # right hip
    J[3] = [0, 0.11, 0]       # spine1
    J[4] = [0.1, -0.47, 0]    # left knee
    J[5] = [-0.1, -0.47, 0]   # right knee
    J[6] = [0, 0.25, 0]       # spine2
    J[7] = [0.09, -0.87, -0.03]   # left ankle
    J[8] = [-0.09, -0.87, -0.03]  # right ankle
    J[9] = [0, 0.31, 0]       # spine3
    J[10] = [0.11, -0.93, 0.1]    # left foot
    J[11] = [-0.11, -0.93, 0.1]   # right foot
    J[12] = [0, 0.46, 0]      # neck
    J[13] = [0.08, 0.4, 0]    # left collar
    J[14] = [-0.08, 0.4, 0]   # right collar
    J[15] = [0, 0.54, 0.02]   # head
    J[16] = [0.17, 0.44, 0]   # left shoulder
    J[17] = [-0.17, 0.44, 0]  # right shoulder
    J[18] = [0.42, 0.44, 0]   # left elbow
    J[19] = [-0.42, 0.44, 0]  # right elbow
    J[20] = [0.68, 0.44, 0]   # left wrist
    J[21] = [-0.68, 0.44, 0]  # right wrist
    J[22] = [0, 0.52, 0.05]   # jaw
    J[23] = [0.03, 0.56, 0.08]   # left eye
    J[24] = [-0.03, 0.56, 0.08]  # right eye
    # fingers: 5 fingers x 3 joints per hand, splayed along +-x
    finger_y = [0.44] * 15
    offs = [(0.76, 0.0), (0.80, 0.0), (0.84, 0.0)]
    for f in range(5):
        dz = (f - 2) * 0.012
        for k in range(3):
            J[25 + f * 3 + k] = [offs[k][0] + f * 0.004, finger_y[f * 3 + k], dz]
            J[40 + f * 3 + k] = [-(offs[k][0] + f * 0.004), finger_y[f * 3 + k], dz]
    return J


def load_rest_joints(path: Optional[str] = None) -> np.ndarray:
    for cand in [path, os.environ.get("MOTIONCRAFT_SMPLX_J"),
                 os.path.join(os.path.dirname(__file__), "..", "..", "data",
                              "smplx_neu_J_1.npy")]:
        if cand and os.path.isfile(cand):
            return np.load(cand).astype(np.float32).reshape(NUM_JOINTS, 3)
    return default_rest_joints()


class SMPLXSkeleton:
    """Functional FK: precomputes the rest skeleton; ``forward`` is jittable."""

    def __init__(self, rest_joints_path: Optional[str] = None):
        self.rest_joints = jnp.asarray(load_rest_joints(rest_joints_path))
        self.parents = SMPLX_PARENTS

    def forward(self, rotations: jnp.ndarray, root_positions: jnp.ndarray) -> jnp.ndarray:
        """rotations [N, 165] (or [N, 156]: body+hands without jaw/eyes, padded
        with identity) + root trans [N, 3] -> joints [N, 55, 3] (vis.py:614-661)."""
        N = rotations.shape[0]
        if rotations.shape[1] == 156:
            rotations = jnp.concatenate(
                [rotations[:, :66], jnp.zeros((N, 9), rotations.dtype),
                 rotations[:, 66:]], axis=1)
        rot_mats = axis_angle_to_matrix(rotations.reshape(N, NUM_JOINTS, 3))
        return rigid_transform(rot_mats, jnp.broadcast_to(
            self.rest_joints, (N, NUM_JOINTS, 3)), self.parents) \
            + root_positions[:, None, :]

    def __call__(self, rotations, root_positions):
        return self.forward(rotations, root_positions)


def rigid_transform(rot_mats: jnp.ndarray, joints: jnp.ndarray,
                    parents: np.ndarray) -> jnp.ndarray:
    """Kinematic chain: local rotations + rest joints -> posed joint positions
    (vis.py:519-578).  Accumulates (R, t) pairs instead of 4x4 homogeneous
    matrices — fewer FLOPs, identical result."""
    rel = joints.at[:, 1:].add(-joints[:, parents[1:]])
    Rs = [rot_mats[:, 0]]
    ts = [rel[:, 0]]
    for i in range(1, len(parents)):
        p = int(parents[i])
        Rs.append(Rs[p] @ rot_mats[:, i])
        ts.append(ts[p] + jnp.einsum("nij,nj->ni", Rs[p], rel[:, i]))
    return jnp.stack(ts, axis=1)


# SMPL 24-joint body (subset tree used by the dance tooling, vis.py:402-476)
SMPL_PARENTS = SMPLX_PARENTS[:22]  # pelvis..wrists share the SMPL-X tree


class SMPLSkeleton:
    """24-joint SMPL FK over axis-angle pose [N, 72] (wrists as end effectors
    here: joints 22/23 (hands) are approximated by the wrist frames)."""

    def __init__(self, rest_joints_path: Optional[str] = None):
        full = load_rest_joints(rest_joints_path)
        self.rest_joints = jnp.asarray(full[:22])
        self.parents = SMPL_PARENTS

    def forward(self, rotations: jnp.ndarray, root_positions: jnp.ndarray) -> jnp.ndarray:
        N = rotations.shape[0]
        rot = rotations[:, :66].reshape(N, 22, 3)
        from .rotation import axis_angle_to_matrix
        mats = axis_angle_to_matrix(rot)
        return rigid_transform(mats, jnp.broadcast_to(self.rest_joints, (N, 22, 3)),
                               self.parents) + root_positions[:, None, :]

    __call__ = forward


def mean_max_velocity(joint_sequences, pose_fps: int = 30) -> float:
    """Dataset-level mean of per-sequence max joint speeds — the ``mmae``
    normalizer for BeatAlign motion beats (EMAGE beat loader :123-205)."""
    import numpy as _np
    maxes = []
    for joints in joint_sequences:
        joints = _np.asarray(joints)
        vel = _np.linalg.norm(_np.diff(joints, axis=0) * pose_fps, axis=-1)
        if vel.size:
            maxes.append(vel.max())
    return float(_np.mean(maxes)) if maxes else 1.0
